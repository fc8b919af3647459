"""Segment-packed inference path: packing several events into one row must
reproduce the per-event (bucketed) model outputs exactly — same params, same
cells, only the batch layout differs (ops/flash_packed.py, data/packing.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolutionhep_tpu.data.packing import (
    PackedBatch,
    aligned_len,
    collate_packed,
    pack_events,
)
from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.ops.flash_packed import (
    band_ranges,
    packed_flash_attention,
    ref_packed_attention,
)

from test_flow_model import small_flow_config


def test_pack_events_layout():
    counts = [300, 212, 400, 90, 128, 1000]
    batches = pack_events(counts, S=1024, rows_per_batch=2)
    placed = set()
    for b in batches:
        for row in b.rows:
            used = 0
            for idx, off, n in sorted(row, key=lambda t: t[1]):
                assert off == used, "events must be contiguous at 128-aligned offsets"
                assert n == counts[idx]
                used = off + aligned_len(n)
                placed.add(idx)
            assert used <= 1024
    assert placed == set(range(len(counts)))


def test_pack_events_oversize_raises():
    with pytest.raises(ValueError):
        pack_events([2000], S=1024)


class _Ev:
    def __init__(self, n, rng):
        self.high = {
            "eta": rng.uniform(-1, 1, n).astype(np.float32),
            "cosphi": rng.uniform(-1, 1, n).astype(np.float32),
            "sinphi": rng.uniform(-1, 1, n).astype(np.float32),
            "e_proxy": rng.normal(size=n).astype(np.float32),
            "target": rng.normal(size=n).astype(np.float32),
            "layer": rng.integers(0, 3, n).astype(np.int32),
        }


def _unpacked_batch(events, pad_n):
    B = len(events)
    out = {
        k: np.zeros((B, pad_n, 1), np.float32)
        for k in ("eta", "cosphi", "sinphi", "e_proxy", "target")
    }
    out["layer"] = np.zeros((B, pad_n, 1), np.int32)
    out["q_mask"] = np.zeros((B, pad_n), bool)
    for i, ev in enumerate(events):
        n = len(ev.high["eta"])
        for k in ("eta", "cosphi", "sinphi", "e_proxy", "target"):
            out[k][i, :n, 0] = ev.high[k]
        out["layer"][i, :n, 0] = ev.high["layer"]
        out["q_mask"][i, :n] = True
    return {k: jnp.asarray(v) for k, v in out.items()}


def test_packed_model_matches_unpacked():
    rng = np.random.default_rng(7)
    lengths = [140, 260, 100]
    events = [_Ev(n, rng) for n in lengths]

    batches = pack_events(lengths, S=768, rows_per_batch=1)
    assert len(batches) == 1 and batches[0].n_events == 3
    packed = collate_packed(events, batches[0], S=768)
    packed = {k: jnp.asarray(v) for k, v in packed.items()}
    unpacked = _unpacked_batch(events, pad_n=512)

    cfg = small_flow_config()
    model = FlowModel(config=cfg, attn_impl="xla")
    t_val = 0.37
    x_pack = packed["target"]
    t_pack = jnp.full((1,), t_val, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), packed, x_pack, t_pack)

    v_pack = model.apply(params, packed, x_pack, t_pack)
    v_unpack = model.apply(
        params, unpacked, unpacked["target"], jnp.full((3,), t_val, jnp.float32)
    )

    # gather the packed row back out per event and compare cell-for-cell
    for si, (idx, off, n) in enumerate(sorted(batches[0].rows[0], key=lambda r: r[1])):
        got = np.asarray(v_pack[0, off : off + n, 0])
        want = np.asarray(v_unpack[idx, :n, 0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_packed_kernel_matches_einsum_reference():
    rng = np.random.default_rng(0)
    B, S, H, D = 1, 512, 2, 8
    seg = np.full((B, S), -1, np.int32)
    pos = 0
    for sid, ln in enumerate((170, 100, 160)):
        seg[0, pos : pos + ln] = sid
        pos += aligned_len(ln)
    q, k, v = (rng.normal(size=(B, S, H, D)).astype(np.float32) for _ in range(3))
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg))
    ref = ref_packed_attention(*args, scale=0.35)
    for softmax in ("max", "nomax_clip"):
        out = packed_flash_attention(
            *args, scale=0.35, softmax=softmax, block_q=128, block_k=128, max_segment_len=256
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_band_ranges_cover_segments():
    seg = np.full((1, 512), -1, np.int32)
    seg[0, :128] = 0          # block 0
    # alignment gap: block 1 fully padded
    seg[0, 256:300] = 1       # block 2 (partial)
    ks, kc = band_ranges(jnp.asarray(seg), 128, 128)
    ks, kc = np.asarray(ks)[0], np.asarray(kc)[0]
    assert ks[0] == 0 and kc[0] == 1      # event 0: exactly its own block
    assert ks[2] == 2 and kc[2] == 1      # event 1
    assert kc[1] == 0 and kc[3] == 0      # all-pad blocks: empty band


def test_packed_kernel_gradients_match_reference():
    """The banded custom-VJP backward (flash_packed._packed_bwd) vs autodiff
    through the einsum reference: dq/dk/dv agree per element and pad cells
    carry exactly zero gradient — the contract the packed TRAINING path
    rests on."""
    import jax

    rng = np.random.default_rng(1)
    B, S, H, D = 2, 512, 2, 8
    seg = np.full((B, S), -1, np.int32)
    for b, lens in enumerate(((170, 100, 160), (300, 120))):
        pos = 0
        for sid, ln in enumerate(lens):
            seg[b, pos : pos + ln] = sid
            pos += aligned_len(ln)
    q, k, v, g = (rng.normal(size=(B, S, H, D)).astype(np.float32) for _ in range(4))
    jq, jk, jv, jg = map(jnp.asarray, (q, k, v, g))
    jseg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        out = packed_flash_attention(
            q, k, v, jseg, scale=0.35, softmax="max",
            block_q=128, block_k=128, max_segment_len=384,
        )
        return jnp.vdot(out, jg)

    def loss_ref(q, k, v):
        return jnp.vdot(ref_packed_attention(q, k, v, jseg, scale=0.35), jg)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(jq, jk, jv)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(jq, jk, jv)
    pad = seg < 0
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, err_msg=f"d{name}"
        )
        assert np.abs(np.asarray(a)[pad]).max() == 0.0, f"d{name} at pad cells"


def test_packed_model_gradients_match_unpacked():
    """End-to-end training-grad equivalence: d(sum of valid v_t)/d(params)
    through the packed layout (banded kernel + per-segment context) equals
    the bucketed layout's — packing must not change what training learns."""
    import jax

    rng = np.random.default_rng(11)
    lengths = [140, 260, 100]
    events = [_Ev(n, rng) for n in lengths]

    batches = pack_events(lengths, S=768, rows_per_batch=1)
    packed = {k: jnp.asarray(v) for k, v in collate_packed(events, batches[0], S=768).items()}
    unpacked = _unpacked_batch(events, pad_n=512)

    cfg = small_flow_config()
    model = FlowModel(config=cfg, attn_impl="xla")
    t_val = 0.37
    params = model.init(
        jax.random.PRNGKey(0), packed, packed["target"], jnp.full((1,), t_val, jnp.float32)
    )

    def loss_packed(p):
        v = model.apply(p, packed, packed["target"], jnp.full((1,), t_val, jnp.float32))
        return jnp.sum(v[:, :, 0] * packed["q_mask"])

    def loss_unpacked(p):
        v = model.apply(
            p, unpacked, unpacked["target"], jnp.full((3,), t_val, jnp.float32)
        )
        return jnp.sum(v[:, :, 0] * unpacked["q_mask"])

    gp = jax.grad(loss_packed)(params)
    gu = jax.grad(loss_unpacked)(params)

    def _compare(ga, gb, atol, tag):
        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
        for path, a in flat_a:
            b_ = flat_b[path]
            scale = max(1.0, float(np.abs(np.asarray(b_)).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b_) / scale, atol=atol,
                err_msg=f"{tag}: {jax.tree_util.keystr(path)}",
            )

    _compare(gp, gu, 5e-4, "xla-packed vs bucketed")

    # same comparison through the Pallas banded kernel + custom VJP
    # (interpret mode on CPU) — the path packed TRAINING actually runs
    from superresolutionhep_tpu.ops.flash_packed import PACKED_DEFAULTS, set_packed_defaults

    saved = dict(PACKED_DEFAULTS)
    try:
        set_packed_defaults(block_q=128, block_k=128, max_segment_len=384)
        model_f = FlowModel(config=cfg, attn_impl="flash")

        def loss_packed_flash(p):
            v = model_f.apply(
                p, packed, packed["target"], jnp.full((1,), t_val, jnp.float32)
            )
            return jnp.sum(v[:, :, 0] * packed["q_mask"])

        _compare(jax.grad(loss_packed_flash)(params), gu, 1e-3, "flash-packed vs bucketed")
    finally:
        PACKED_DEFAULTS.update(saved)
