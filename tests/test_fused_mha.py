"""Parity tests for the fused short-seq MHA kernel (interpret mode on CPU)
against the plain-jnp sdpa oracle — the same discipline as the reference's
fused-kernel tests (megatron/fused_kernels/tests/test_fused_kernels.py:
fused CUDA softmax vs unfused torch)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.ops.attention import sdpa
from megatron_clip_tpu.ops.pallas.fused_mha import fused_attention_from_qkv


def _oracle(qkv_flat, heads, causal):
    b, s, w3 = qkv_flat.shape
    d = w3 // (3 * heads)
    q, k, v = jnp.split(qkv_flat, 3, axis=-1)
    split = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    out = sdpa(split(q), split(k), split(v), causal=causal)
    return out.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("b,s,h,d", [(4, 50, 4, 64), (2, 77, 8, 64),
                                     (2, 33, 2, 32)])
def test_fused_mha_forward_parity(causal, b, s, h, d):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, s, 3 * h * d),
                            jnp.float32)
    got = fused_attention_from_qkv(qkv, h, causal=causal, interpret=True)
    want = _oracle(qkv, h, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_grad_parity(causal):
    b, s, h, d = 2, 26, 4, 32
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, s, 3 * h * d),
                            jnp.float32)
    tangent = jax.random.normal(jax.random.PRNGKey(2), (b, s, h * d))

    def loss_fused(x):
        return jnp.sum(fused_attention_from_qkv(x, h, causal=causal,
                                        interpret=True) * tangent)

    def loss_ref(x):
        return jnp.sum(_oracle(x, h, causal) * tangent)

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_smajor_parity(causal):
    """The S-major kernel variant (b%8==0, even heads) must match the
    oracle in fwd and grad."""
    from megatron_clip_tpu.ops.pallas.fused_mha import fused_mha_packed_sm
    b, s, h, d = 8, 50, 4, 64
    qkv = jax.random.normal(jax.random.PRNGKey(4), (b, s, 3 * h * d),
                            jnp.float32)
    got = fused_mha_packed_sm(qkv, h, d ** -0.5, causal, True)
    want = _oracle(qkv, h, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    tangent = jax.random.normal(jax.random.PRNGKey(5), (b, s, h * d))
    g1 = jax.grad(lambda x: jnp.sum(
        fused_mha_packed_sm(x, h, d ** -0.5, causal, True) * tangent))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(_oracle(x, h, causal) * tangent))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_grad_parity_recompute_mode(causal, monkeypatch):
    """MCT_MHA_SAVE_PROBS=0: backward recomputes softmax from qkv."""
    monkeypatch.setenv("MCT_MHA_SAVE_PROBS", "0")
    b, s, h, d = 2, 26, 4, 32
    qkv = jax.random.normal(jax.random.PRNGKey(6), (b, s, 3 * h * d),
                            jnp.float32)
    tangent = jax.random.normal(jax.random.PRNGKey(7), (b, s, h * d))
    g1 = jax.grad(lambda x: jnp.sum(fused_attention_from_qkv(
        x, h, causal=causal, interpret=True) * tangent))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(_oracle(x, h, causal) * tangent))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_fused_mha_bf16_runs():
    b, s, h, d = 2, 50, 4, 64
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, s, 3 * h * d),
                            jnp.bfloat16)
    out = fused_attention_from_qkv(qkv, h, interpret=True)
    assert out.dtype == jnp.bfloat16
    want = _oracle(qkv.astype(jnp.float32), h, False)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)
