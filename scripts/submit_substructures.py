#!/usr/bin/env python
"""Substructure fan-out submitter with per-job status tracking.

Capability mirror of performance/substructure/submit_job_substructures.py +
run_on_node_substructures.sh: chunk the event range, create one status file
per job (removed on success), run chunks through a backend:

  * ``local``  — subprocess pool on this host (default; replaces the PBS
    cluster for single-node runs)
  * ``pbs``    — emit qsub commands like the reference
  * ``print``  — dry-run, print the commands

The merger (merge_substructures.py) refuses to aggregate while any status
file remains or any error log is non-empty — same failure-detection contract
as the reference (hadd_and_cleanup.py:19-32).
"""

import argparse
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.data import root_io

RUN_DIR = os.path.dirname(os.path.realpath(__file__))


def run_local_job(job):
    file_path, start, stop, save_dir, res_factor = job
    status = os.path.join(save_dir, "status", f"job_{start}_{stop}.status")
    err_log = os.path.join(save_dir, f"error_{start}_{stop}.log")
    with open(err_log, "w") as ef:
        rc = subprocess.call(
            [
                sys.executable,
                os.path.join(RUN_DIR, "compute_substructures.py"),
                "-fp", file_path, "-estart", str(start), "-estop", str(stop),
                "-sd", save_dir, "--res_factor", str(res_factor),
            ],
            stderr=ef,
        )
    if rc == 0:
        if os.path.getsize(err_log) == 0:
            os.remove(err_log)
        os.remove(status)
    return rc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--file_path", "-fp", type=str, required=True)
    ap.add_argument("--chunk_size", "-cs", type=int, default=10)
    ap.add_argument("--backend", choices=["local", "pbs", "print"], default="local")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--res_factor", type=int, default=2)
    ap.add_argument("--walltime", type=str, default="11:00:00")
    ap.add_argument("--mem", type=str, default="3gb")
    ap.add_argument("--ncpus", type=str, default="1")
    args = ap.parse_args(argv)

    n_events = root_io.num_entries(args.file_path, "Low_Tree")
    splits = np.array_split(np.arange(n_events), int(np.ceil(n_events / args.chunk_size)))

    dst_dir = os.path.join(Path(args.file_path).parent, "substructures")
    status_dir = os.path.join(dst_dir, "status")
    os.makedirs(status_dir, exist_ok=True)

    jobs = []
    for sp in splits:
        start, stop = int(sp[0]), int(sp[-1]) + 1
        Path(os.path.join(status_dir, f"job_{start}_{stop}.status")).touch()
        jobs.append((args.file_path, start, stop, dst_dir, args.res_factor))

    print(f"total job count: {len(jobs)}")

    if args.backend == "local":
        with ProcessPoolExecutor(max_workers=args.workers) as ex:
            rcs = list(ex.map(run_local_job, jobs))
        bad = [j for j, rc in zip(jobs, rcs) if rc != 0]
        if bad:
            print(f"{len(bad)} job(s) FAILED; status files remain for: {[(j[1], j[2]) for j in bad]}")
            sys.exit(1)
        print("all jobs finished")
    else:
        for i, (fp, start, stop, sd, rf) in enumerate(jobs):
            cmd = (
                f"qsub -o {sd}/output_{i}.log -e {sd}/error_{i}.log "
                f"-q N -N sr_substr -l walltime={args.walltime},mem={args.mem},ncpus={args.ncpus} "
                f'-v FILE_PATH="{fp}",ENTRY_START="{start}",ENTRY_STOP="{stop}",SAVE_DIR="{sd}" '
                f"{RUN_DIR}/run_substructure_node.sh"
            )
            print(cmd)
            if args.backend == "pbs":
                os.system(cmd)  # noqa: S605


if __name__ == "__main__":
    main()
