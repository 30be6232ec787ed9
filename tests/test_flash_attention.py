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


def test_remat_policy_saves_flash_residuals(monkeypatch):
    """The selective remat policy must save the flash kernel's named
    (out, lse) outputs so backward does not replay the forward kernel
    (nn/transformer._selective_policy; measured +3.6pt MFU at GPT-345m).
    Trace-level check: no kernel execution, so it runs on CPU."""
    import io
    from contextlib import redirect_stdout

    import megatron_clip_tpu.ops as ops
    from megatron_clip_tpu.nn.transformer import (
        TransformerCfg, init_transformer, apply_transformer)
    from jax.ad_checkpoint import print_saved_residuals

    monkeypatch.setattr(ops, "use_pallas", lambda: True)
    cfg = TransformerCfg(width=128, heads=2, mlp_ratio=4.0, layers=1,
                         remat="selective", scan_layers=False)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    # s=2048 >= the flash dispatch threshold (shorter seqs take the
    # fused-MHA kernel, which saves its own residuals)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2048, 128))

    def loss(blocks, x):
        return jnp.sum(apply_transformer(blocks, x, cfg, causal=True))

    buf = io.StringIO()
    with redirect_stdout(buf):
        print_saved_residuals(loss, blocks, x)
    assert "flash_lse" in buf.getvalue()


def test_bhsd_projection_path_matches_packed(monkeypatch):
    """MCT_FLASH_PROJ_BHSD=1 (default: project straight to [B,H,S,D], head
    transposes fused into the GEMMs) must match the packed-QKV layout
    exactly — value and grads (ops/attention.py flash path)."""
    from megatron_clip_tpu.ops.attention import multi_head_attention
    import megatron_clip_tpu.ops as ops

    monkeypatch.setattr(ops, "use_pallas", lambda: True)
    key = jax.random.PRNGKey(0)
    b, s, w, h = 1, 2048, 128, 2
    ks = jax.random.split(key, 5)
    params = {
        "wqkv": jax.random.normal(ks[0], (w, 3 * w)) * 0.05,
        "bqkv": jax.random.normal(ks[1], (3 * w,)) * 0.02,
        "wo": jax.random.normal(ks[2], (w, w)) * 0.05,
        "bo": jax.random.normal(ks[3], (w,)) * 0.02,
    }
    x = jax.random.normal(ks[4], (b, s, w)) * 0.3

    def run():
        def loss(params, x):
            return jnp.sum(
                multi_head_attention(x, params, h, causal=True) ** 2)
        return jax.value_and_grad(loss)(params, x)

    monkeypatch.setenv("MCT_FLASH_PROJ_BHSD", "0")
    v0, g0 = run()
    monkeypatch.setenv("MCT_FLASH_PROJ_BHSD", "1")
    v1, g1 = run()
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for k_, a in g0.items():
        np.testing.assert_allclose(np.asarray(a), np.asarray(g1[k_]),
                                   rtol=1e-4, atol=1e-4)
