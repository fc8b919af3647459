"""Worker process for the 2-process multi-host rehearsal test.

Invoked by tests/test_multihost.py via subprocess with:
    python _multihost_worker.py <coordinator> <n_proc> <pid> <workdir>

Each process:
  1. initializes jax.distributed over CPU (2 local devices per process),
  2. runs one DP train-style step on the global 4-device mesh — a jitted
     masked-mean-loss gradient whose input batch is sharded over processes
     (parallel/mesh.py semantics) — and writes the resulting grad norm,
  3. runs entry-range-chunked SR inference over its host_entry_range slice
     (inference.py batch-mode fan-out contract) writing its own chunk file.

The parent asserts both processes computed the SAME global gradient (the
cross-process psum actually happened) and that the chunk files merge into
full coverage.
"""

import json
import os
import sys


def main():
    coordinator, n_proc, pid, workdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from superresolutionhep_tpu.parallel import distributed

    is_multi = distributed.initialize(
        coordinator_address=coordinator, num_processes=n_proc, process_id=pid
    )
    assert is_multi, "jax.distributed did not come up multi-process"
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == 2 * n_proc, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # ---- 1. cross-process DP gradient step -------------------------------
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    B_global, N = 8, 64
    rng = np.random.default_rng(0)  # same seed everywhere: global batch is known
    x_global = rng.normal(size=(B_global, N)).astype(np.float32)
    w = jnp.ones((N,), jnp.float32)

    lo, hi = distributed.host_entry_range(B_global)
    x_local = x_global[lo:hi]
    x = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), x_local)

    @jax.jit
    def grad_norm(w, x):
        def loss(w):
            return jnp.mean((x * w[None, :]) ** 2)

        g = jax.grad(loss)(w)
        return jnp.sqrt(jnp.sum(g**2))

    with mesh:
        gn = float(grad_norm(w, x))

    # analytic single-process reference on the full global batch: the loss
    # means over both axes, so d/dw_i mean((x*w)^2) at w=1 is
    # 2*mean(x^2, axis=0) / N
    g_ref = 2.0 * np.mean(x_global**2, axis=0) / N
    ref = float(np.sqrt(np.sum(g_ref**2)))

    # ---- 2. entry-range chunked SR inference -----------------------------
    import yaml

    truth = os.path.join(workdir, "truth.h5")
    mv_path = os.path.join(workdir, "mv.yml")
    t_path = os.path.join(workdir, "t.yml")
    config_mv = yaml.safe_load(open(mv_path))
    config_t = yaml.safe_load(open(t_path))

    from superresolutionhep_tpu.train.sr_trainer import SRTrainer
    from superresolutionhep_tpu.inference.sr import SRInference

    trainer = SRTrainer(config_mv, config_t, run_dir=os.path.join(workdir, f"run{pid}"), seed=0)
    inf = SRInference(
        {
            "model": {
                "config_path_mv": mv_path,
                "config_path_t": t_path,
                "checkpoint_path": None,
                "n_steps": 2,
                "n_steps_to_store": 2,
            }
        },
        params=trainer.state.params,
    )
    n_events = 8
    start, stop = distributed.host_entry_range(n_events)
    chunk = os.path.join(workdir, f"pred_{start}_{stop}.h5")
    inf.run_pred(
        {
            "truth_path": truth,
            "pred_path": chunk,
            "entry_start": start,
            "n_events": stop - start,
            "n_ensemble": 1,
            "batch_size": 4,
            "ode_method": "midpoint",
            "save_ensemble_components": False,
            "store_energy_incidence": False,
            "max_particles": 4,
        }
    )

    out = {
        "pid": pid,
        "grad_norm": gn,
        "grad_norm_ref": ref,
        "entry_range": [start, stop],
        "chunk": chunk,
    }
    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as fp:
        json.dump(out, fp)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
