#!/usr/bin/env python
"""Stage-2 PF training entry point (same CLI surface as the reference)."""
from superresolutionhep_tpu.cli.train_pf import main

if __name__ == "__main__":
    main()
