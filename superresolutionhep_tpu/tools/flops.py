"""Analytic FLOP accounting for the SR flow model.

Round-2 used ``jax.jit(...).compile().cost_analysis()["flops"]`` for the
bench's MFU estimate, but XLA's cost analysis does not see through the Pallas
flash-attention custom call (it misses the O(N^2) score/value matmuls — the
bulk of the work), so the published MFU understated the chip ~6x (VERDICT r2).

This module counts forward FLOPs analytically:
  * every Dense/linear kernel in the parameter pytree contributes
    ``2 * d_in * d_out`` per applied position (multiply + add), classified as
    per-cell (applied at each of the B*N padded positions) or per-event
    (context/modulation nets applied once per event) by parameter path;
  * the attention score and value matmuls contribute
    ``2 * B * H * Lq * Lk * D`` each per transformer layer (the flash
    kernel computes exactly these, ops/flash_attention.py);
  * both a padded count (what the chip executes on the padded batch) and a
    mask-discounted count (attention scaled by sum(n_i^2)/(B N^2), linears by
    sum(n_i)/(B N)) are reported — the gap is the padding overhead.

Elementwise work (norms, activations, softmax) is excluded: it is
bandwidth-, not FLOP-bound, and MFU is a matmul-utilization metric.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

# parameter-path fragments applied once per EVENT (everything else with a
# (d_in, d_out) kernel runs per cell): timestep embedder MLP, adaLN
# modulation nets (context -> shifts/scales/gates), final v_t modulation
_PER_EVENT_MARKERS = ("time_step_embedder", "adaLN", "adaln")


def _iter_kernels(params: Dict[str, Any], prefix: str = ""):
    for name, val in params.items():
        path = f"{prefix}/{name}" if prefix else str(name)
        if isinstance(val, dict):
            yield from _iter_kernels(val, path)
        elif name == "kernel" and hasattr(val, "shape") and len(val.shape) == 2:
            yield path, int(val.shape[0]), int(val.shape[1])


def flow_model_flops(
    params: Dict[str, Any],
    config_mv: dict,
    B: int,
    N: int,
    n_valid: Optional[Sequence[int]] = None,
) -> Dict[str, float]:
    """Forward FLOPs of ONE FlowModel evaluation on a (B, N) padded batch.

    ``params``: the initialized variables (``{'params': ...}`` or the inner
    dict).  ``n_valid``: real cell counts of the events in the batch; when
    given, ``*_masked`` entries discount padding.
    Returns a dict with ``linear``, ``attention``, ``total`` (padded) and the
    ``*_masked`` variants.
    """
    p = params.get("params", params)

    per_cell = 0.0  # FLOPs per (event, cell) position
    per_event = 0.0  # FLOPs per event
    for path, d_in, d_out in _iter_kernels(p):
        flops = 2.0 * d_in * d_out
        if any(m in path for m in _PER_EVENT_MARKERS):
            per_event += flops
        else:
            per_cell += flops

    fm = config_mv["flow_model"]
    tcfg = fm["transformer"]
    n_layers = int(tcfg["num_transformer_layers"])
    h_dim = int(fm["h_dim"])  # H * D == h_dim in this architecture
    # score (QK^T) + value (PV) matmuls: 2 * (2 * B * N^2 * H * D) per layer
    attn = n_layers * 4.0 * B * float(N) ** 2 * h_dim

    linear = B * N * per_cell + B * per_event
    out = {
        "linear": linear,
        "attention": attn,
        "total": linear + attn,
    }
    if n_valid is not None:
        nv = np.asarray(list(n_valid), np.float64)
        cell_frac = float(nv.sum()) / (B * N)
        attn_frac = float((nv**2).sum()) / (B * float(N) ** 2)
        out["linear_masked"] = B * N * per_cell * cell_frac + B * per_event
        out["attention_masked"] = attn * attn_frac
        out["total_masked"] = out["linear_masked"] + out["attention_masked"]
    return out


def flow_model_flops_packed(
    params: Dict[str, Any],
    config_mv: dict,
    seg: np.ndarray,
    block_q: int,
    block_k: int,
) -> Dict[str, float]:
    """Forward FLOPs of ONE FlowModel evaluation on a segment-packed (B, S)
    batch (ops/flash_packed.py).

    Differences vs the bucketed count: attention executes only the banded
    blocks (band_ranges); the adaLN modulation nets run per SEGMENT slot
    (E = S // 128 per row) with their outputs scattered per cell through a
    one-hot (S x E) matmul — both the per-segment nets and the scatter/
    gather matmuls are counted.  Padding cells still execute the per-cell
    linears.
    """
    from ..ops.flash_packed import band_ranges

    p = params.get("params", params)
    B, S = seg.shape
    from ..ops.flash_packed import SEG_ALIGN

    E = S // SEG_ALIGN  # segment slots per row (flow_model.py packed path)

    per_cell = 0.0
    per_seg = 0.0  # adaLN modulation nets: once per segment slot
    per_row = 0.0  # timestep embedder: once per packed row
    scatter_d = 0.0  # one-hot scattered feature widths (per-cell 2*E*d each)
    ctx_d = 0.0  # context width (d_in of the modulation nets)
    for path, d_in, d_out in _iter_kernels(p):
        flops = 2.0 * d_in * d_out
        if "time_step_embedder" in path:
            per_row += flops
        elif any(m in path for m in _PER_EVENT_MARKERS):
            per_seg += flops
            scatter_d += d_out  # per-cell scatter of the modulation output
            ctx_d = d_in  # context width (same for every modulation net)
        else:
            per_cell += flops
    if per_seg:
        scatter_d += ctx_d  # the ONE per-cell context gather (flow_model)
    per_cell += 2.0 * E * scatter_d  # one-hot (S x E) gather/scatter matmuls

    fm = config_mv["flow_model"]
    n_layers = int(fm["transformer"]["num_transformer_layers"])
    h_dim = int(fm["h_dim"])

    kstart, kcnt = band_ranges(np.asarray(seg), block_q, block_k)
    banded_pairs = float(np.asarray(kcnt, np.float64).sum()) * block_q * block_k
    attn = n_layers * 4.0 * h_dim * banded_pairs

    nv = np.asarray([(np.asarray(seg[b]) == s).sum() for b in range(B) for s in range(int(seg[b].max()) + 1 if (seg[b] >= 0).any() else 0)], np.float64)
    linear = B * S * per_cell + B * E * per_seg + B * per_row
    linear_masked = float(nv.sum()) * per_cell + len(nv) * per_seg + B * per_row
    attn_masked = n_layers * 4.0 * h_dim * float((nv**2).sum())
    return {
        "linear": linear,
        "attention": attn,
        "total": linear + attn,
        "linear_masked": linear_masked,
        "attention_masked": attn_masked,
        "total_masked": linear_masked + attn_masked,
    }


def train_step_flops(
    params: Dict[str, Any],
    config_mv: dict,
    B: int,
    N: int,
    n_valid: Optional[Sequence[int]] = None,
    remat: bool = True,
) -> Dict[str, float]:
    """Matmul FLOPs of ONE fwd+bwd training step (AdamW update excluded —
    elementwise, consistent with this module's forward policy).

    Exact matmul counts for the production path (per DiT layer, in units of
    one attention matmul ``2*B*N^2*h_dim``):

      * attention forward: 2 (QK^T, PV — ops/flash_attention.py:165,175);
      * attention backward: 7 — the dq kernel recomputes S then forms dP and
        dQ (flash_attention.py:350-363, 3 matmuls); the dkv kernel recomputes
        S then forms dV, dP, dK (flash_attention.py:399-413, 4 matmuls);
      * per-layer remat (nn.remat(DiTLayer), models/dit.py:234) re-runs the
        whole layer forward inside the backward: +2 attention matmuls.

      -> executed attention multiplier vs forward: 11/2 = 5.5 with remat,
         9/2 = 4.5 without.

    Dense kernels: forward 1 matmul; backward dX = dY W^T and dW = X^T dY
    (2); remat recompute +1 -> 4x with remat, 3x without.  (Kernels outside
    the remat'd layers — embedders, final projection — execute 3x even with
    remat; they are a few % of linear FLOPs, counted at the layer multiplier
    for simplicity.)

    ``*_useful`` entries apply the standard no-recompute accounting (3x both
    classes) for hardware-independent comparisons; headline train MFU should
    use the executed (padded) count — the chip really runs the recomputes.
    """
    f = flow_model_flops(params, config_mv, B, N, n_valid)
    lin_mult = 4.0 if remat else 3.0
    attn_mult = 5.5 if remat else 4.5
    out = {
        "linear": f["linear"] * lin_mult,
        "attention": f["attention"] * attn_mult,
        "linear_useful": f["linear"] * 3.0,
        "attention_useful": f["attention"] * 3.0,
    }
    out["total"] = out["linear"] + out["attention"]
    out["total_useful"] = out["linear_useful"] + out["attention_useful"]
    if n_valid is not None:
        out["linear_masked"] = f["linear_masked"] * lin_mult
        out["attention_masked"] = f["attention_masked"] * attn_mult
        out["total_masked"] = out["linear_masked"] + out["attention_masked"]
    return out


def sampler_evals(n_steps: int, method: str) -> int:
    """Model evaluations of one sampler run over a linspace(0,1,n_steps) grid.

    Fixed-step methods pay k evals per step; ab2/ab3 pay 1 per step after a
    Heun bootstrap (2 evals on the first interval) — totalling exactly
    ``n_steps`` evals; ab2e's Euler bootstrap reuses f0, so it pays
    ``n_steps - 1`` (flow/ode.py)."""
    per_step = {"euler": 1, "midpoint": 2, "heun": 2, "rk4": 4}
    if method in ("ab2", "ab3"):
        return int(n_steps)  # Heun bootstrap (2) + 1 per remaining interval
    if method == "ab2e":
        return int(n_steps) - 1  # Euler bootstrap reuses f0
    if method in per_step:
        return per_step[method] * (int(n_steps) - 1)
    raise ValueError(f"eval count undefined for adaptive method {method!r}")
