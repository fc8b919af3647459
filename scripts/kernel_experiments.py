"""One-off kernel experiments: calibrate chip peak and isolate flash-kernel
overheads (not part of the package; used to guide kernel tuning)."""

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


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=20):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        o = fn(*args)
    sync(o)
    return (time.time() - t0) / reps


def mm_peak():
    M = 4096
    a = jnp.ones((M, M), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    dt = timeit(f, a)
    print(json.dumps({"probe": "mxu_4096_matmul", "tfs": round(2 * M**3 / dt / 1e12, 1)}))
    # D=64-contraction probe: (L,64)x(64,L) like the q@k^T shape
    L = 2048
    b = jnp.ones((8 * 8 * L, 64), jnp.bfloat16)
    c = jnp.ones((64, L), jnp.bfloat16)
    f2 = jax.jit(lambda b, c: b @ c)
    dt = timeit(f2, b, c)
    print(json.dumps({"probe": "mxu_d64_contraction", "tfs": round(2 * b.shape[0] * L * 64 / dt / 1e12, 1)}))
    # XLA full attention einsum at the bench shape (no flash), for comparison
    B, Lq, H, D = 8, 2048, 8, 64
    q = jnp.ones((B, H, Lq, D), jnp.bfloat16)

    def attn(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", p, q)

    dt = timeit(jax.jit(attn), q)
    print(json.dumps({"probe": "xla_dense_attn_8_2048", "ms": round(dt * 1e3, 2),
                      "tfs": round(4 * B * H * Lq * Lq * D / dt / 1e12, 1)}))


def variant_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, mode):
    j = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mode == "matmuls_only":
        acc_scr[:] += lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    elif mode == "no_max":
        p = jnp.exp2(s.astype(jnp.bfloat16))
        l_scr[:] = l_scr[:] + p.astype(jnp.float32).sum(-1, keepdims=True)
        acc_scr[:] += lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    elif mode == "full":
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        p_sum = p.astype(jnp.float32).sum(-1, keepdims=True)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + p_sum
        acc_scr[:] = acc_scr[:] * alpha + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = m_new
    elif mode == "fp32_exp":
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        p_sum = p.sum(-1, keepdims=True)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + p_sum
        acc_scr[:] = acc_scr[:] * alpha + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = m_new

    @pl.when(j == n_k - 1)
    def _fin():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def run_variant(mode, B=8, L=2048, H=8, D=64, BQ=1024, BK=1024, reps=20):
    q = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, L, D)), jnp.bfloat16)

    def call(q, k, v):
        return pl.pallas_call(
            functools.partial(variant_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(B, H, L // BQ, L // BK),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BQ, 1), jnp.float32),
                pltpu.VMEM((BQ, 1), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
        )(q, k, v)

    f = jax.jit(call)
    dt = timeit(f, q, q, q, reps=reps)
    flops = 4 * B * H * L * L * D
    print(json.dumps({"variant": mode, "blocks": [BQ, BK], "ms": round(dt * 1e3, 2),
                      "tfs": round(flops / dt / 1e12, 1)}))


def _safe(fn, *a, **k):
    try:
        fn(*a, **k)
    except Exception as e:  # VMEM OOM at large tiles etc. — keep sweeping
        print(json.dumps({"skipped": str(e)[:120]}))


if __name__ == "__main__":
    _safe(mm_peak)
    for mode in ["matmuls_only", "no_max", "full", "fp32_exp"]:
        _safe(run_variant, mode)
    _safe(run_variant, "full", BQ=512, BK=1024)
    _safe(run_variant, "full", BQ=2048, BK=2048)  # exceeds scoped VMEM: skips
    _safe(run_variant, "full", BQ=512, BK=512)
