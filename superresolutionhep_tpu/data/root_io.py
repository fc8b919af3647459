"""Event-file IO with the reference's ROOT tree schema.

The reference reads/writes ROOT files via uproot/awkward
(dataset.py:26-95, inference.py:291-310).  This module keeps the exact same
logical schema — named trees (``Low_Tree``/``High_Tree``/``Particle_Tree``)
of jagged branches — behind a pluggable backend:

  * ``uproot`` backend when the library is installed and the path ends in
    ``.root`` (drop-in interop with reference-produced files);
  * a pure-HDF5 backend (``.h5``/``.hdf5``) that stores each branch as
    flat + offsets datasets. h5py ships with the image; the layout is
    self-describing (``<tree>/<branch>/{flat,offsets[,inner_offsets]}``).

All host-side code in this framework goes through :func:`read_tree` /
:func:`write_trees` and never touches a backend directly.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Union

import numpy as np

from .jagged import Jagged2Array, JaggedArray

Branch = Union[np.ndarray, JaggedArray, Jagged2Array]

try:  # optional, host-side only
    import uproot  # type: ignore

    HAVE_UPROOT = True
except Exception:  # pragma: no cover - environment dependent
    uproot = None
    HAVE_UPROOT = False


def _is_h5(path: str) -> bool:
    return str(path).endswith((".h5", ".hdf5"))


# ---------------------------------------------------------------------------
# HDF5 backend
# ---------------------------------------------------------------------------


def _h5_write(path, trees: Mapping[str, Mapping[str, Branch]]):
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["format"] = "superresolutionhep_tpu/v1"
        for tree_name, branches in trees.items():
            tg = f.create_group(tree_name)
            for name, arr in branches.items():
                bg = tg.create_group(name)
                if isinstance(arr, Jagged2Array):
                    bg.attrs["kind"] = "jagged2"
                    bg.create_dataset("flat", data=arr.flat)
                    bg.create_dataset("inner_offsets", data=arr.inner_offsets)
                    bg.create_dataset("offsets", data=arr.outer_offsets)
                elif isinstance(arr, JaggedArray):
                    bg.attrs["kind"] = "jagged"
                    bg.create_dataset("flat", data=arr.flat)
                    bg.create_dataset("offsets", data=arr.offsets)
                else:
                    bg.attrs["kind"] = "flat"
                    bg.create_dataset("flat", data=np.asarray(arr))


def _h5_read_tree(path, tree: str, branches=None, entry_start=0, entry_stop=None):
    import h5py

    out: Dict[str, Branch] = {}
    with h5py.File(path, "r") as f:
        tg = f[tree]
        names = branches if branches is not None else list(tg.keys())
        for name in names:
            bg = tg[name]
            kind = bg.attrs["kind"]
            if kind == "flat":
                data = bg["flat"][entry_start:entry_stop]
                out[name] = data
            elif kind == "jagged":
                offsets = bg["offsets"][:]
                stop = len(offsets) - 1 if entry_stop is None else entry_stop
                sel = offsets[entry_start : stop + 1]
                flat = bg["flat"][sel[0] : sel[-1]]
                out[name] = JaggedArray(flat, sel - sel[0])
            elif kind == "jagged2":
                outer = bg["offsets"][:]
                stop = len(outer) - 1 if entry_stop is None else entry_stop
                osel = outer[entry_start : stop + 1]
                inner = bg["inner_offsets"][osel[0] : osel[-1] + 1]
                flat = bg["flat"][inner[0] : inner[-1]]
                out[name] = Jagged2Array(flat, inner - inner[0], osel - osel[0])
            else:  # pragma: no cover
                raise ValueError(f"unknown branch kind {kind!r}")
    return out


def _h5_num_entries(path, tree):
    import h5py

    with h5py.File(path, "r") as f:
        tg = f[tree]
        first = tg[next(iter(tg.keys()))]
        if first.attrs["kind"] == "flat":
            return len(first["flat"])
        return len(first["offsets"]) - 1


# ---------------------------------------------------------------------------
# uproot backend
# ---------------------------------------------------------------------------


def _uproot_read_tree(path, tree, branches=None, entry_start=0, entry_stop=None):
    f = uproot.open(path)
    t = f[tree]
    names = branches if branches is not None else [b.name for b in t.branches]
    out: Dict[str, Branch] = {}
    for name in names:
        arr = t[name].array(library="np", entry_start=entry_start, entry_stop=entry_stop)
        if arr.dtype == object:
            first = next((x for x in arr if np.asarray(x).ndim), None)
            if first is not None and np.asarray(first).dtype == object:
                out[name] = Jagged2Array.from_list([list(row) for row in arr])
            else:
                out[name] = JaggedArray.from_list(list(arr))
        else:
            out[name] = arr
    return out


def _uproot_write(path, trees):
    import awkward as ak  # type: ignore

    with uproot.recreate(path) as f:
        for tree_name, branches in trees.items():
            zipped = {}
            for name, arr in branches.items():
                if isinstance(arr, JaggedArray):
                    zipped[name] = ak.Array(arr.to_list())
                elif isinstance(arr, Jagged2Array):
                    zipped[name] = ak.Array([arr[i] for i in range(len(arr))])
                else:
                    zipped[name] = np.asarray(arr)
            f[tree_name] = {"": ak.zip(zipped, depth_limit=1)}


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def read_tree(path, tree: str, branches: Sequence[str] | None = None, entry_start: int = 0, entry_stop=None):
    if _is_h5(path):
        return _h5_read_tree(path, tree, branches, entry_start, entry_stop)
    if HAVE_UPROOT:
        return _uproot_read_tree(path, tree, branches, entry_start, entry_stop)
    raise RuntimeError(
        f"cannot read {path!r}: uproot is not installed; use the .h5 container format"
    )


def write_trees(path, trees: Mapping[str, Mapping[str, Branch]]):
    if _is_h5(path):
        return _h5_write(path, trees)
    if HAVE_UPROOT:
        return _uproot_write(path, trees)
    raise RuntimeError(
        f"cannot write {path!r}: uproot is not installed; use the .h5 container format"
    )


def num_entries(path, tree: str) -> int:
    if _is_h5(path):
        return _h5_num_entries(path, tree)
    if HAVE_UPROOT:
        return uproot.open(path)[tree].num_entries
    raise RuntimeError("uproot not installed")
