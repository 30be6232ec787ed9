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


# --------------------------------------------------------------------------
# attention-probability dropout variant
# --------------------------------------------------------------------------

def _oracle_dropout(qkv_flat, heads, causal, key, rate):
    """Apply the EXACT mask the kernel path draws (same key/layout), via the
    plain-jnp attention math: o = (softmax(qk^T s) * M) v."""
    from megatron_clip_tpu.ops.pallas.fused_mha import _dropout_mask
    b, s, w3 = qkv_flat.shape
    d = w3 // (3 * heads)
    mask = _dropout_mask(key, b, s, heads, rate, qkv_flat.dtype)
    q, k, v = jnp.split(qkv_flat, 3, axis=-1)
    split = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    prec = jax.lax.Precision.HIGHEST
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, precision=prec) * d ** -0.5
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where((row >= col)[None, None], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    # mask is [B, H, S, S], already head-major
    out = jnp.einsum("bhqk,bhkd->bhqd", p * mask.astype(jnp.float32), vh,
                     precision=prec)
    return out.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_dropout_forward_parity(causal):
    b, s, h, d = 2, 50, 4, 64
    key = jax.random.PRNGKey(7)
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, s, 3 * h * d),
                            jnp.float32)
    got = fused_attention_from_qkv(qkv, h, causal=causal, dropout_rate=0.2,
                                   dropout_rng=key, interpret=True)
    want = _oracle_dropout(qkv, h, causal, key, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_mha_dropout_grad_parity(causal):
    b, s, h, d = 2, 26, 4, 32
    key = jax.random.PRNGKey(9)
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, s, 3 * h * d),
                            jnp.float32)
    tangent = jax.random.normal(jax.random.PRNGKey(2), (b, s, h * d))

    def loss_fused(x):
        return jnp.sum(fused_attention_from_qkv(
            x, h, causal=causal, dropout_rate=0.2, dropout_rng=key,
            interpret=True) * tangent)

    def loss_ref(x):
        return jnp.sum(_oracle_dropout(x, h, causal, key, 0.2) * tangent)

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_mha_dropout_zero_rate_matches_plain():
    """rate=0 with a key still goes down the dropout kernel only when asked;
    the dispatch must route rate==0 to the plain kernel."""
    b, s, h, d = 2, 33, 2, 32
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, s, 3 * h * d),
                            jnp.float32)
    a = fused_attention_from_qkv(qkv, h, dropout_rate=0.0,
                                 dropout_rng=jax.random.PRNGKey(0),
                                 interpret=True)
    b_ = fused_attention_from_qkv(qkv, h, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fused_mha_dropout_deterministic_in_key():
    b, s, h, d = 2, 26, 2, 64
    qkv = jax.random.normal(jax.random.PRNGKey(4), (b, s, 3 * h * d),
                            jnp.float32)
    k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    a1 = fused_attention_from_qkv(qkv, h, dropout_rate=0.3, dropout_rng=k1,
                                  interpret=True)
    a2 = fused_attention_from_qkv(qkv, h, dropout_rate=0.3, dropout_rng=k1,
                                  interpret=True)
    a3 = fused_attention_from_qkv(qkv, h, dropout_rate=0.3, dropout_rng=k2,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_dropout_kernel_eligible_gate():
    from megatron_clip_tpu.ops.pallas.fused_mha import (
        dropout_kernel_eligible)
    assert dropout_kernel_eligible(128, 12, 64)
    assert dropout_kernel_eligible(512, 12, 64)
    assert not dropout_kernel_eligible(1024, 16, 64)   # cell too big
    assert not dropout_kernel_eligible(128, 12, 96)    # lane geometry
    assert not dropout_kernel_eligible(128, 3, 64)     # heads % hp != 0
