#!/usr/bin/env python
"""Convert a reference Lightning checkpoint (.ckpt) to a native Orbax
checkpoint usable by this framework's inference drivers.

Usage:
  python scripts/convert_torch_checkpoint.py --kind pf \\
      --ckpt saved_checkpoints/pf_lr/epoch=...ckpt \\
      --config_mv saved_checkpoints/pf_lr/config_mv.yml \\
      --out runs/pf_lr_converted
"""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.tools.torch_convert import (
    convert_flow_state_dict,
    convert_pf_state_dict,
    load_lightning_checkpoint,
)
from superresolutionhep_tpu.train.checkpoint import save_single


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["sr", "pf"], required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--config_mv", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args(argv)

    cfg_mv = yaml.safe_load(open(args.config_mv))
    state_dict, _ = load_lightning_checkpoint(args.ckpt)
    if args.kind == "pf":
        params = convert_pf_state_dict(state_dict, cfg_mv["pf_model"])
    else:
        params = convert_flow_state_dict(state_dict, cfg_mv["flow_model"])
    save_single(args.out, {"params": params})
    print(f"converted {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
