"""PF training CLI — `python train_pf.py -cmv ... -ct ...` equivalent
(reference: train_pf.py:25-111)."""

from __future__ import annotations

import argparse

from ..config import load_config_pair
from .common import add_train_args, apply_runtime_flags, default_run_dir


def main(argv=None):
    parser = argparse.ArgumentParser(description="Stage-2 particle-flow training")
    add_train_args(parser)
    args = parser.parse_args(argv)
    dtype = apply_runtime_flags(args)

    config_mv, config_t = load_config_pair(args.config_mv, args.config_t)
    if args.profile:
        config_t = dict(config_t, profile=True)
    run_dir = args.run_dir or default_run_dir(config_t, "pf")

    from ..train.pf_trainer import PFTrainer

    trainer = PFTrainer(
        config_mv,
        config_t,
        run_dir=run_dir,
        dtype=dtype,
        use_comet=not args.debug_mode,
    )
    resume = args.resume or bool(config_t.get("resume_from_checkpoint"))
    trainer.fit(resume=resume)


if __name__ == "__main__":
    main()
