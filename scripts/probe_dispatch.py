"""Separate per-call dispatch overhead from device kernel time: run the
production flash forward (a) one call per dispatch, (b) 50 chained calls
inside one jit (lax.scan / fori-style chaining keeps the kernel identical)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from superresolutionhep_tpu.ops.flash_attention import masked_flash_attention


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    REPS = 50
    for B, L, H, D in [(8, 2048, 8, 64), (4, 3584, 8, 64)]:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
        valid = jnp.ones((B, L), bool)
        scale = 1.0 / np.sqrt(D)

        one = jax.jit(lambda q, k, v: masked_flash_attention(q, k, v, valid, valid, scale))

        def chained(q, k, v):
            def body(c, _):
                o = masked_flash_attention(c, k, v, valid, valid, scale)
                return o, ()

            o, _ = lax.scan(body, q, None, length=REPS)
            return o

        ch = jax.jit(chained)

        sync(one(q, q, q))
        t0 = time.time()
        for _ in range(20):
            o = one(q, q, q)
        sync(o)
        dt1 = (time.time() - t0) / 20

        sync(ch(q, q, q))
        t0 = time.time()
        o = ch(q, q, q)
        sync(o)
        dtn = (time.time() - t0) / REPS

        flops = 4 * B * H * L * L * D
        print(
            json.dumps(
                {
                    "shape": [B, L, H, D],
                    "per_dispatch_ms": round(dt1 * 1e3, 3),
                    "per_dispatch_tfs": round(flops / dt1 / 1e12, 1),
                    "chained_ms": round(dtn * 1e3, 3),
                    "chained_tfs": round(flops / dtn / 1e12, 1),
                    "dispatch_overhead_ms": round((dt1 - dtn) * 1e3, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
