"""SR inference CLI — `python inference.py -i cfg.yml [-bm -estart -estop]`
equivalent (reference: inference.py:327-393).

Two modes:
  * batch mode (``-bm``): single entry-range chunk, output suffixed
    ``_{start}_{stop}`` — the unit of multi-host fan-out;
  * config-driven multi-item loop over ``items``.
"""

from __future__ import annotations

import argparse
import time

from ..config import load_yaml


def main(argv=None):
    parser = argparse.ArgumentParser(description="Stage-1 super-resolution inference")
    parser.add_argument("--inference_path", "-i", type=str, required=True)
    parser.add_argument("--precision", "-p", type=str, default="default")
    parser.add_argument("--batch_mode", "-bm", action="store_true")
    parser.add_argument("--entry_start", "-estart", type=int, default=0)
    parser.add_argument("--entry_stop", "-estop", type=int, default=None)
    parser.add_argument("--device", "-g", type=str, default=None, help="device selector (e.g. 'cpu')")
    args = parser.parse_args(argv)

    from .common import apply_device_selection

    apply_device_selection(args.device)
    if args.precision == "highest":
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")

    inf_cfg = load_yaml(args.inference_path)

    from ..inference.sr import SRInference

    inf = SRInference(inf_cfg)

    if args.batch_mode:
        assert "items" not in inf_cfg, "wrong config style for batch mode"
        assert args.entry_stop is not None, "entry_stop is required for batch mode"
        inf_dict = dict(inf_cfg["inf_dict"])
        inf_dict["entry_start"] = args.entry_start
        inf_dict["n_events"] = args.entry_stop - args.entry_start
        inf_dict["batch_size"] = inf_cfg.get("batch_size", 32)
        inf_dict["max_particles"] = inf_cfg.get("max_particles", 0)
        base = inf.get_output_path(inf_dict)
        stem, ext = base.rsplit(".", 1)
        inf_dict["pred_path"] = f"{stem}_{args.entry_start}_{args.entry_stop}.{ext}"
        t0 = time.time()
        inf.run_pred(inf_dict)
        print(f"Prediction time: {time.time() - t0:.2f} s")
    else:
        assert "items" in inf_cfg, "wrong config style for non-batch mode"
        for inf_dict in inf_cfg["items"]:
            if not inf_dict.get("run_pred", False):
                continue
            inf_dict = dict(inf_dict)
            inf_dict["batch_size"] = inf_cfg.get("batch_size", 32)
            inf_dict["max_particles"] = inf_cfg.get("max_particles", 0)
            if not inf_dict.get("pred_path"):
                inf_dict["pred_path"] = inf.get_output_path(inf_dict)
            print(f"Running predictions on {inf_dict['truth_path']}")
            inf.run_pred(inf_dict)


if __name__ == "__main__":
    main()
