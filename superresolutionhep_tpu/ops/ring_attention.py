"""Ring attention over a sequence-parallel mesh axis.

Instead of all-gathering K/V (O(N) memory per device, one big collective),
the K/V shards rotate around the ring via ``lax.ppermute`` while each device
accumulates its queries' online-softmax state — bisection-bandwidth-optimal
and O(N/n) K/V memory.  This is the XLA-collective expression of the ring
pattern; compute and communication overlap under XLA's async collectives.

Used by MultiheadAttention when ``sp_axis`` is set with ``sp_mode='ring'``
(default 'gather' = all-gather K/V, better for the small meshes typical at
N ~ 3.5k cells).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def ring_masked_attention(q, k, v, q_valid, kv_valid, scale: float, axis: str):
    """q,k,v: (B, L_local, H, D) shards on mesh axis ``axis``; masks
    (B, L_local) True==valid.  Returns (B, Lq_local, H, D)."""
    n = lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    B, Lq, H, D = q.shape
    m0 = jnp.full((B, H, Lq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Lq, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Lq, D), jnp.float32)

    kvm0 = (
        jnp.ones(k.shape[:2], jnp.float32)
        if kv_valid is None
        else kv_valid.astype(jnp.float32)
    )

    def step(carry, _):
        k, v, kvm, m, l, acc = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        s = jnp.where(kvm[:, None, None, :] > 0, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v)
        # rotate the K/V shard to the next device
        k = lax.ppermute(k, axis, perm)
        v = lax.ppermute(v, axis, perm)
        kvm = lax.ppermute(kvm, axis, perm)
        return (k, v, kvm, m_new, l, acc), None

    (k, v, kvm, m, l, acc), _ = lax.scan(step, (k, v, kvm0, m0, l0, acc0), None, length=n)
    out = acc / jnp.maximum(l, 1e-30)  # (B, H, Lq, D)
    out = jnp.transpose(out, (0, 2, 1, 3))
    if q_valid is not None:
        out = out * q_valid[:, :, None, None]
    return out.astype(q.dtype)
