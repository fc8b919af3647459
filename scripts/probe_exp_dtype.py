"""Chained (dispatch-free) A/B of forward-kernel variants: exp dtype and
block shapes, at the two production bucket lengths."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BIG = 1e30


def kernel(q_ref, k_ref, v_ref, km_ref, o_ref, m_scr, l_scr, acc_scr, *, exp_bf16):
    j = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    km = km_ref[0]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s + (km - 1.0) * BIG
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    if exp_bf16:
        p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        p_sum = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
    else:
        p = jnp.exp2(s - m_new)
        p_sum = p.sum(axis=-1, keepdims=True)
    alpha = jnp.exp2(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + p_sum
    acc_scr[:] = acc_scr[:] * alpha + lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(j == n_k - 1)
    def _fin():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def bench(B, L, H, D, BQ, BK, exp_bf16, reps=50):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    km = jnp.ones((B, 1, L), jnp.float32)

    def call(q, k, v):
        return pl.pallas_call(
            functools.partial(kernel, exp_bf16=exp_bf16),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(B, H, L // BQ, L // BK),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK), lambda b, h, i, j: (b, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BQ, 1), jnp.float32),
                pltpu.VMEM((BQ, 1), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
        )(q, k, v, km)

    def chained(q):
        def body(c, _):
            return call(c, q, q), ()

        o, _ = lax.scan(body, q, None, length=reps)
        return o

    f = jax.jit(chained)
    try:
        float(jnp.sum(f(q).astype(jnp.float32)))
    except Exception as e:
        print(json.dumps({"blocks": [BQ, BK], "exp_bf16": exp_bf16, "error": str(e)[:120]}))
        return
    t0 = time.time()
    o = f(q)
    float(jnp.sum(o.astype(jnp.float32)))
    dt = (time.time() - t0) / reps
    flops = 4 * B * H * L * L * D
    print(
        json.dumps(
            {
                "shape": [B, L, H, D],
                "blocks": [BQ, BK],
                "exp_bf16": exp_bf16,
                "ms": round(dt * 1e3, 3),
                "tfs": round(flops / dt / 1e12, 1),
            }
        )
    )


if __name__ == "__main__":
    for exp_bf16 in (True, False):
        bench(8, 2048, 8, 64, 1024, 2048, exp_bf16)
        bench(8, 2048, 8, 64, 512, 2048, exp_bf16)
        bench(8, 2048, 8, 64, 1024, 1024, exp_bf16)
    # 3584 bucket: current fallback 512x512 vs 1792-wide and 896/3584 splits
    bench(4, 3584, 8, 64, 512, 512, False)
    bench(4, 3584, 8, 64, 512, 1792, False)
    bench(4, 3584, 8, 64, 896, 1792, False)
    bench(4, 3584, 8, 64, 1792, 1792, False)
    bench(4, 3584, 8, 64, 512, 3584, False)
    bench(4, 3584, 8, 64, 896, 3584, False)
