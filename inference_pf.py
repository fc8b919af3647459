#!/usr/bin/env python
"""Stage-2 PF inference entry point (same CLI surface as the reference)."""
from superresolutionhep_tpu.cli.inference_pf import main

if __name__ == "__main__":
    main()
