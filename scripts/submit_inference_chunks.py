#!/usr/bin/env python
"""SR inference fan-out: chunk the event range and run ``inference.py -bm``
per chunk.

Capability mirror of the reference's PBS qsub fan-out over entry ranges
(inference.py:331-367 batch mode + configs/multipart/inference_batch.yml:
100-event chunks => thousands of single-GPU jobs).  Backends:

  * ``local`` — sequential or pooled subprocesses on this host (each chunk is
    an independent process, restartable by rerunning with the same range);
  * ``pbs``   — emit/submit qsub commands;
  * ``print`` — dry run.

Chunk outputs are ``*_pred_{start}_{stop}.*`` files — exactly what the PF
stage globs (pflow dataset chunk-sorted glob).
"""

import argparse
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_chunk(job):
    inference_yaml, start, stop = job
    return subprocess.call(
        [
            sys.executable, os.path.join(REPO, "inference.py"),
            "-i", inference_yaml, "-bm", "-estart", str(start), "-estop", str(stop),
        ]
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--inference_path", "-i", required=True, help="batch-mode inference YAML")
    ap.add_argument("--n_events", "-n", type=int, required=True)
    ap.add_argument("--entry_start", type=int, default=0)
    ap.add_argument("--chunk_size", "-cs", type=int, default=100)
    ap.add_argument("--backend", choices=["local", "pbs", "print"], default="local")
    ap.add_argument("--workers", type=int, default=1, help="local parallel chunks (1 chip -> 1)")
    ap.add_argument("--walltime", default="11:00:00")
    ap.add_argument("--mem", default="8gb")
    args = ap.parse_args(argv)

    edges = np.arange(args.entry_start, args.entry_start + args.n_events + args.chunk_size, args.chunk_size)
    edges[-1] = min(edges[-1], args.entry_start + args.n_events)
    jobs = [
        (args.inference_path, int(a), int(b))
        for a, b in zip(edges[:-1], edges[1:])
        if b > a
    ]
    print(f"total chunk jobs: {len(jobs)}")

    if args.backend == "local":
        with ProcessPoolExecutor(max_workers=args.workers) as ex:
            rcs = list(ex.map(run_chunk, jobs))
        bad = [(j[1], j[2]) for j, rc in zip(jobs, rcs) if rc != 0]
        if bad:
            print(f"{len(bad)} chunk(s) FAILED: {bad} — rerun those ranges")
            sys.exit(1)
        print("all chunks finished")
    else:
        for i, (yml, a, b) in enumerate(jobs):
            cmd = (
                f"qsub -q N -N sr_inf -l walltime={args.walltime},mem={args.mem} "
                f"-- {sys.executable} {REPO}/inference.py -i {yml} -bm -estart {a} -estop {b}"
            )
            print(cmd)
            if args.backend == "pbs":
                os.system(cmd)  # noqa: S605


if __name__ == "__main__":
    main()
