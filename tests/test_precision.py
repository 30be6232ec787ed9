"""Precision-policy mapping (open_CLIP --precision values, params.py /
main.py:281-287): bf16/amp keep fp32 master params with bf16 compute;
pure_bf16 stores the weights themselves in bf16 (halves param + optimizer
HBM — the config that fits ViT-H on one 16G chip)."""
import jax
import jax.numpy as jnp
import pytest

from megatron_clip_tpu.factory import create_model


def _dtypes(params):
    return {str(x.dtype) for x in jax.tree.leaves(params)}


def test_bf16_keeps_fp32_master_params():
    _, p = create_model("test-tiny", precision="bf16")
    assert _dtypes(p) == {"float32"}


def test_pure_bf16_stores_bf16_weights():
    m, p = create_model("test-tiny", precision="pure_bf16")
    dts = _dtypes(p)
    assert "bfloat16" in dts
    # only the scalar logit_scale temperature stays fp32
    fp32 = [path for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]
            if leaf.dtype == jnp.float32]
    assert len(fp32) == 1
    out = m(p, jnp.zeros((2, m.image_size, m.image_size, 3)),
            jnp.zeros((2, m.context_length), jnp.int32))
    assert out["image_features"].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out["image_features"])))


def test_unknown_precision_raises():
    with pytest.raises(ValueError):
        create_model("test-tiny", precision="int4")


def test_adamw_lowbits_matches_adamw_in_fp32():
    """With fp32 moment storage the custom kernel must match optax.adamw
    step-for-step; with bf16 nu the trajectory stays close (the 1.3b-rung
    memory mode, training/optim.py adamw_lowbits)."""
    import numpy as np
    import optax
    from megatron_clip_tpu.training.optim import adamw_lowbits

    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8),
              "b": jnp.ones((8,))}
    grads = {"w": jnp.cos(jnp.arange(64.0)).reshape(8, 8) * 0.1,
             "b": jnp.full((8,), 0.05)}

    def run(tx, n=5):
        p, s = params, tx.init(params)
        for _ in range(n):
            u, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, u)
        return p

    ref = run(optax.adamw(1e-2, b1=0.9, b2=0.95, weight_decay=0.1))
    exact = run(adamw_lowbits(1e-2, b1=0.9, b2=0.95, weight_decay=0.1,
                              mu_dtype=jnp.float32, nu_dtype=jnp.float32))
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(exact[k]),
                                   rtol=1e-6, atol=1e-6)

    low = run(adamw_lowbits(1e-2, b1=0.9, b2=0.95, weight_decay=0.1))
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(low[k]),
                                   rtol=2e-2, atol=2e-3)
    # and the state really is bf16
    tx = adamw_lowbits(1e-2)
    st = tx.init(params)
    adam_state = st[0]
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.bfloat16
