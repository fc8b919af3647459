"""PF inference CLI — `python inference_pf.py -i cfg.yml` equivalent
(reference: inference_pf.py:224-236)."""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from ..config import load_yaml


def main(argv=None):
    parser = argparse.ArgumentParser(description="Stage-2 particle-flow inference")
    parser.add_argument("--inference_path", "-i", type=str, required=True)
    parser.add_argument("--device", "-g", type=str, default=None, help="device selector (e.g. 'cpu')")
    args = parser.parse_args(argv)

    from .common import apply_device_selection

    apply_device_selection(args.device)

    inf_cfg = load_yaml(args.inference_path)

    from ..inference.pf import PFInference

    inf = PFInference(inf_cfg)

    for inf_dict in inf_cfg["items"]:
        if not inf_dict.get("run_pred", False):
            continue
        inf_dict = dict(inf_dict)
        if not inf_dict.get("pred_path"):
            outputdir = os.path.join(
                os.path.dirname(inf_cfg["model"]["config_path_mv"]), "inference"
            )
            Path(outputdir).mkdir(parents=True, exist_ok=True)
            inf_dict["pred_path"] = os.path.join(outputdir, inf_dict["pred_file_name"])
        print(f"Running PF predictions -> {inf_dict['pred_path']}")
        inf.run_pred(inf_dict)


if __name__ == "__main__":
    main()
