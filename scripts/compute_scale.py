#!/usr/bin/env python
"""Offline transform-statistics computation.

Capability mirror of utility/compute_scale_cocoa.py:1-46: computes mean / std
/ min / max of the cell x/y/z (and optionally other branches) over a training
file and prints YAML-ready ``var_transform`` blocks.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.data import root_io


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--file_path", "-fp", type=str, required=True)
    ap.add_argument("--tree", type=str, default="High_Tree")
    ap.add_argument("--branches", nargs="+", default=["cell_x", "cell_y", "cell_z"])
    ap.add_argument("--entry_stop", type=int, default=None)
    args = ap.parse_args(argv)

    tree = root_io.read_tree(args.file_path, args.tree, args.branches, 0, args.entry_stop)
    for br in args.branches:
        flat = tree[br].flat if hasattr(tree[br], "flat") else np.hstack(list(tree[br]))
        name = br.replace("cell_", "")
        print(f"    {name}: {{")
        print('        "transformation": null,')
        print('        "scale_mode": "standard",')
        print(f'        "mean": {flat.mean():.3f}, "std": {flat.std():.3f},')
        print(f'        "min": {flat.min():.3f}, "max": {flat.max():.3f}, "range": [-1,1]}}')
        print()


if __name__ == "__main__":
    main()
