import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.models.init_policies import apply_init_policies


def small_flow_config(transformer_type="DiT", final_modulation=True):
    dense = lambda out: {  # noqa: E731
        "output_size": out,
        "hidden_layers": [16],
        "activation": "LeakyReLU",
        "final_activation": "LeakyReLU",
        "norm_layer": "LayerNorm",
        "norm_final_layer": False,
        "dropout": 0.0,
    }
    return {
        "init_weights": {
            "all_linear": "xavier_uniform",
            "layer_emb_table": "normal",
            "time_step_embedder": "normal",
            "ln_modulation": "zero",
            "v_t_pred_linear": "zero",
        },
        "final_modulation": final_modulation,
        "sigma_min": 1.0e-5,
        "n_steps": 10,
        "time_embedding_size": 16,
        "h_dim": 32,
        "etaphi_emb": dense(8),
        "layer_emb": {"emb_dim": 5, "dense_config": dense(8)},
        "e_proxy_emb": dense(7),
        "noisy_input_emb": dense(16),
        "feat_0_mlp": {**dense(32), "hidden_layers": []},
        "transformer": {
            "type": transformer_type,
            "num_heads": 4,
            "num_transformer_layers": 2,
            "dense_config": {
                "hidden_layers": [32],
                "activation": "LeakyReLU",
                "final_activation": "LeakyReLU",
                "norm_layer": "LayerNorm",
                "norm_final_layer": False,
                "dropout": 0.0,
            },
        },
        "v_t_pred": {
            "output_size": 1,
            "hidden_layers": [16, 8],
            "activation": "LeakyReLU",
            "final_activation": None,
            "norm_layer": "LayerNorm",
            "norm_final_layer": "LayerNorm",
            "dropout": 0.0,
        },
    }


def make_batch(B=3, N=12, lengths=(12, 7, 5), seed=0):
    rng = np.random.default_rng(seed)
    q_mask = np.zeros((B, N), bool)
    for i, n in enumerate(lengths[:B]):
        q_mask[i, :n] = True
    batch = {
        "eta": rng.normal(size=(B, N, 1)).astype(np.float32),
        "cosphi": rng.normal(size=(B, N, 1)).astype(np.float32),
        "sinphi": rng.normal(size=(B, N, 1)).astype(np.float32),
        "layer": rng.integers(0, 3, size=(B, N, 1)).astype(np.int32),
        "e_proxy": rng.normal(size=(B, N, 1)).astype(np.float32),
        "q_mask": q_mask,
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("ttype", ["DiT", "GPT-2+Normformer"])
def test_flow_model_forward_shapes(ttype):
    cfg = small_flow_config(ttype)
    model = FlowModel(config=cfg, attn_impl="xla")
    batch = make_batch()
    noisy = jnp.zeros((3, 12, 1))
    t = jnp.linspace(0.1, 0.9, 3)
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    v = model.apply(variables, batch, noisy, t)
    assert v.shape == (3, 12, 1)
    assert np.all(np.isfinite(np.asarray(v)))


def test_padding_invariance():
    """Extending the padded region must not change outputs for valid cells."""
    cfg = small_flow_config()
    model = FlowModel(config=cfg, attn_impl="xla")
    batch = make_batch(B=2, N=10, lengths=(10, 6))
    noisy = jnp.asarray(np.random.default_rng(3).normal(size=(2, 10, 1)).astype(np.float32))
    t = jnp.asarray([0.3, 0.7])
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    v_small = model.apply(variables, batch, noisy, t)

    pad = 6
    batch_big = {
        k: jnp.pad(v, ((0, 0), (0, pad)) + ((0, 0),) * (v.ndim - 2)) for k, v in batch.items()
    }
    noisy_big = jnp.pad(noisy, ((0, 0), (0, pad), (0, 0)))
    v_big = model.apply(variables, batch_big, noisy_big, t)

    mask = np.asarray(batch["q_mask"])
    np.testing.assert_allclose(
        np.asarray(v_big[:, :10])[mask], np.asarray(v_small)[mask], rtol=2e-5, atol=2e-6
    )


def test_init_policies_zero_adaln_and_head():
    cfg = small_flow_config()
    model = FlowModel(config=cfg, attn_impl="xla")
    batch = make_batch()
    noisy = jnp.zeros((3, 12, 1))
    t = jnp.full((3,), 0.5)
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    params = apply_init_policies(variables["params"], cfg["init_weights"], jax.random.PRNGKey(1))

    # adaLN modulation kernels zeroed
    for i in range(2):
        k = params["transformer"][f"layers_{i}"]["adaLN_modulation"]["kernel"]
        assert np.all(np.asarray(k) == 0.0)
    assert np.all(np.asarray(params["v_t_adaLN_modulation"]["kernel"]) == 0.0)

    # final head linear zeroed -> with zero adaLN the model output at init
    # is shift-free modulate(norm(feat)) through a zero linear = bias-driven;
    # the v_t head's *last* layer is zero so output must be exactly 0
    v = model.apply({"params": params}, batch, noisy, t)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-7)

    # layer emb table re-drawn with std 0.02
    emb = np.asarray(params["layer_emb_table"]["embedding"])
    assert emb.std() < 0.1


def test_flow_model_jit_and_grad():
    cfg = small_flow_config()
    model = FlowModel(config=cfg, attn_impl="xla")
    batch = make_batch()
    noisy = jnp.zeros((3, 12, 1))
    t = jnp.full((3,), 0.5)
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)

    def loss_fn(params):
        v = model.apply({"params": params}, batch, noisy, t)
        return (v**2 * batch["q_mask"][..., None]).sum()

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_param_summary():
    from superresolutionhep_tpu.models.summary import param_count, param_summary

    cfg = small_flow_config()
    model = FlowModel(config=cfg, attn_impl="xla")
    batch = make_batch()
    variables = model.init(
        jax.random.PRNGKey(0), batch, jnp.zeros((3, 12, 1)), jnp.full((3,), 0.5)
    )
    summ = param_summary(variables["params"])
    assert "transformer" in summ and "v_t_pred_net" in summ
    assert "weight" in summ["transformer"] and "std" in summ["transformer"]["weight"]
    assert summ["transformer"]["weight"]["std"] > 0
    assert param_count(variables["params"]) > 1000
