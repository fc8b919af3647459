#!/usr/bin/env python
"""Stage-1 SR training entry point (same CLI surface as the reference)."""
from superresolutionhep_tpu.utils.hostmem import ensure_tuned

ensure_tuned()  # glibc malloc tunables via one-time re-exec (hostmem.py)

from superresolutionhep_tpu.cli.train_sr import main

if __name__ == "__main__":
    main()
