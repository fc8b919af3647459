#!/usr/bin/env python
"""Stage-1 SR training entry point (same CLI surface as the reference)."""
from superresolutionhep_tpu.cli.train_sr import main

if __name__ == "__main__":
    main()
