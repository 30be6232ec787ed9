"""Pallas flash attention vs the jnp sdpa oracle — the parity harness the
reference uses for its fused CUDA kernels
(megatron/fused_kernels/tests/test_fused_kernels.py). Runs the kernels in
interpreter mode on CPU; the same tests execute compiled on a real TPU."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.ops.attention import sdpa
from megatron_clip_tpu.ops.pallas.flash_attention import flash_attention


def _qkv(key, b=2, h=2, sq=256, sk=256, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, sq, d), dtype)
    k = jax.random.normal(kk, (b, h, sk, d), dtype)
    v = jax.random.normal(kv, (b, h, sk, d), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [256, 128])
def test_forward_matches_sdpa(causal, seq):
    q, k, v = _qkv(jax.random.PRNGKey(0), sq=seq, sk=seq)
    got = flash_attention(q, k, v, causal=causal)
    want = sdpa(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_unpadded_seq_matches_sdpa(causal):
    """ViT (50) and CLIP-text (77) style lengths that need padding."""
    q, k, v = _qkv(jax.random.PRNGKey(1), sq=77, sk=77)
    got = flash_attention(q, k, v, causal=causal)
    want = sdpa(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_sdpa(causal):
    q, k, v = _qkv(jax.random.PRNGKey(2), b=1, h=2, sq=256, sk=256, d=64)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, causal=causal) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("causal", [False, True])
def test_fused_bwd_matches_split(causal, monkeypatch):
    """The single-pass fused backward kernel (dq partials + dk/dv in one
    grid) must be bit-comparable to the split dq/dkv kernels, including the
    zeroed above-diagonal dq tiles on a multi-block causal grid."""
    q, k, v = _qkv(jax.random.PRNGKey(7), b=1, h=2, sq=384, sk=384, d=64)
    do = jax.random.normal(jax.random.PRNGKey(8), q.shape, q.dtype)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       block_q=128, block_k=128) * do)

    monkeypatch.setenv("MCT_FLASH_SPLIT_BWD", "1")
    g_split = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("MCT_FLASH_SPLIT_BWD", "0")
    g_fused = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_split, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"d{name} mismatch")


def test_gradients_match_padded():
    q, k, v = _qkv(jax.random.PRNGKey(3), b=1, h=1, sq=77, sk=77, d=64)

    def f_flash(q):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 3)

    def f_ref(q):
        return jnp.sum(sdpa(q, k, v, causal=True) ** 3)

    np.testing.assert_allclose(np.asarray(jax.grad(f_flash)(q)),
                               np.asarray(jax.grad(f_ref)(q)),
                               rtol=5e-5, atol=5e-5)


def test_bf16_forward_close():
    q, k, v = _qkv(jax.random.PRNGKey(4), dtype=jnp.bfloat16)
    got = flash_attention(q, k, v).astype(jnp.float32)
    want = sdpa(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_cross_attention_lengths():
    q, k, v = _qkv(jax.random.PRNGKey(5), sq=128, sk=384)
    got = flash_attention(q, k, v)
    want = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
