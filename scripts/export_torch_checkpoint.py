"""Export framework-trained weights as a Lightning-shaped torch checkpoint.

The inverse of scripts/convert_torch_checkpoint.py: takes a flax parameter
file (``params.msgpack`` or an Orbax run checkpoint dir) plus its
``model_and_var.yml``, and writes a ``.ckpt`` whose ``state_dict`` carries
the reference's exact ``net.*`` key layout — loadable by the reference's
own ``inference.py:74-83`` (SR) / ``inference_pf.py:75-84`` (PF) with
``load_state_dict(strict=True)``.

Usage:
  python scripts/export_torch_checkpoint.py --kind sr \
      --params saved_checkpoints/closure_sr/params.msgpack \
      --config saved_checkpoints/closure_sr/model_and_var.yml \
      --out /tmp/closure_sr.ckpt

Note: only reference-schema architectures export (beyond-reference options
like ``fourier_features`` have no torch counterpart and are rejected).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["sr", "pf"], required=True)
    ap.add_argument("--params", required=True, help="params.msgpack or Orbax ckpt dir")
    ap.add_argument("--config", required=True, help="model_and_var.yml")
    ap.add_argument("--out", required=True, help="output .ckpt path")
    ap.add_argument("--epoch", type=int, default=0)
    args = ap.parse_args()

    import yaml

    from superresolutionhep_tpu.tools.torch_export import (
        export_flow_params,
        export_pf_params,
        save_lightning_checkpoint,
    )
    from superresolutionhep_tpu.train.checkpoint import load_params

    cfg = yaml.safe_load(open(args.config))
    params = load_params(args.params)
    if args.kind == "sr":
        fm = cfg["flow_model"]
        for emb_key in ("etaphi_emb", "e_proxy_emb", "noisy_input_emb"):
            if fm.get(emb_key, {}).get("fourier_features"):
                raise SystemExit(
                    f"flow_model.{emb_key}.fourier_features is a beyond-reference "
                    "extension with no torch counterpart; cannot export"
                )
        sd = export_flow_params(params, fm)
    else:
        sd = export_pf_params(params, cfg["pf_model"])

    save_lightning_checkpoint(sd, args.out, hyper_parameters={}, epoch=args.epoch)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
