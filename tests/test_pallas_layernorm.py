"""Fused LN/RMSNorm kernel vs the jnp oracle (fwd + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.ops.normalization import layer_norm, rms_norm
from megatron_clip_tpu.ops.pallas.layernorm import fused_layer_norm, fused_rms_norm


@pytest.mark.parametrize("shape", [(4, 77, 512), (1000, 768)])
def test_ln_forward(shape):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, shape) * 3 + 1
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],))
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],))
    got = fused_layer_norm(x, scale, bias)
    want = layer_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ln_grads():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 128))
    scale = jnp.ones((128,)) * 1.3
    bias = jnp.zeros((128,))

    def f_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b) ** 2)

    def f_ref(x, s, b):
        return jnp.sum(layer_norm(x, s, b) ** 2)

    gf = jax.grad(f_fused, (0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_ref, (0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gf, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_rms_forward_and_grads():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 40, 256))
    scale = jax.random.normal(jax.random.PRNGKey(1), (256,))
    np.testing.assert_allclose(np.asarray(fused_rms_norm(x, scale)),
                               np.asarray(rms_norm(x, scale)),
                               rtol=1e-5, atol=1e-5)
    gf = jax.grad(lambda x: jnp.sum(fused_rms_norm(x, scale) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(rms_norm(x, scale) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=2e-5)


def test_bf16_ln():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 512), jnp.bfloat16)
    scale = jnp.ones((512,))
    bias = jnp.zeros((512,))
    got = fused_layer_norm(x, scale, bias).astype(jnp.float32)
    want = layer_norm(x, scale, bias).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
