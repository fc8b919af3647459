"""Round-trip test for the uproot backend of data/root_io.py.

The uproot/awkward backend (root_io.py:116-152) is the drop-in interop path
with reference-produced ROOT files (reference dataset.py:26-95 reads
Low_Tree/High_Tree via uproot); this container ships without uproot, so the
backend was untested (VERDICT r2 item 8).  Skips cleanly when uproot/awkward
are unavailable and exercises write -> read -> slice -> num_entries parity
with the HDF5 container otherwise.
"""

import os

import numpy as np
import pytest

uproot = pytest.importorskip("uproot")
pytest.importorskip("awkward")

from superresolutionhep_tpu.data import root_io
from superresolutionhep_tpu.data.jagged import Jagged2Array, JaggedArray


@pytest.fixture()
def trees():
    rng = np.random.default_rng(7)
    n = 5
    cell_counts = rng.integers(3, 9, size=n)
    jag = JaggedArray.from_list([rng.normal(size=c).astype(np.float32) for c in cell_counts])
    lay = JaggedArray.from_list([rng.integers(0, 6, size=c).astype(np.int64) for c in cell_counts])
    j2 = Jagged2Array.from_list(
        [[rng.normal(size=int(k)).tolist() for k in rng.integers(1, 4, size=3)] for _ in range(n)]
    )
    return {
        "Low_Tree": {"cell_e": jag, "cell_layer": lay, "n_cells": cell_counts.astype(np.int64)},
        "High_Tree": {"particle_to_node_weight": j2},
    }


def _assert_jagged_equal(a, b):
    assert len(a) == len(b)
    for i in range(len(a)):
        np.testing.assert_allclose(np.asarray(a[i], dtype=np.float64),
                                   np.asarray(b[i], dtype=np.float64), rtol=1e-6)


def test_uproot_round_trip(tmp_path, trees):
    path = os.path.join(tmp_path, "events.root")
    root_io.write_trees(path, trees)

    assert root_io.num_entries(path, "Low_Tree") == 5

    back = root_io.read_tree(path, "Low_Tree")
    _assert_jagged_equal(back["cell_e"], trees["Low_Tree"]["cell_e"])
    _assert_jagged_equal(back["cell_layer"], trees["Low_Tree"]["cell_layer"])
    np.testing.assert_array_equal(np.asarray(back["n_cells"]), trees["Low_Tree"]["n_cells"])


def test_uproot_entry_range_matches_h5(tmp_path, trees):
    """entry_start/entry_stop slicing must agree between the two backends —
    the chunked fan-out pipeline depends on it (scripts/submit_substructures)."""
    rpath = os.path.join(tmp_path, "events.root")
    hpath = os.path.join(tmp_path, "events.h5")
    root_io.write_trees(rpath, trees)
    root_io.write_trees(hpath, trees)

    for tree, branch in (("Low_Tree", "cell_e"), ("High_Tree", "particle_to_node_weight")):
        r = root_io.read_tree(rpath, tree, [branch], entry_start=1, entry_stop=4)
        h = root_io.read_tree(hpath, tree, [branch], entry_start=1, entry_stop=4)
        assert len(r[branch]) == len(h[branch]) == 3
        for i in range(3):
            ri, hi = r[branch][i], h[branch][i]
            if tree == "High_Tree":  # doubly-jagged: compare row by row
                assert len(ri) == len(hi)
                for a, b in zip(ri, hi):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
            else:
                np.testing.assert_allclose(np.asarray(ri), np.asarray(hi), rtol=1e-6)


def test_uproot_jagged2_round_trip(tmp_path, trees):
    path = os.path.join(tmp_path, "inc.root")
    root_io.write_trees(path, {"High_Tree": trees["High_Tree"]})
    back = root_io.read_tree(path, "High_Tree", ["particle_to_node_weight"])
    orig = trees["High_Tree"]["particle_to_node_weight"]
    got = back["particle_to_node_weight"]
    assert len(got) == len(orig)
    for i in range(len(orig)):
        go, oo = got[i], orig[i]
        assert len(go) == len(oo)
        for a, b in zip(go, oo):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
