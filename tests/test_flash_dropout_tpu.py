"""Flash-attention dropout validation — REAL TPU ONLY (the in-kernel PRNG
has no CPU interpret lowering, so these skip off-TPU; run manually with
`JAX_PLATFORMS= python -m pytest tests/test_flash_dropout_tpu.py`).

Strategy: a tiny export kernel replays the exact per-(bh, q-block, k-block)
PRNG draws the flash kernels make, materializing the full keep-multiplier
mask; a plain-jnp oracle applying that mask then checks the flash output and
all three gradients. The delta-trick holds under dropout because
sum_k (P.M)_ik (dO_i.v_k) = dO_i.o_i = delta_i — so only the dP term and dV
carry the mask (see _bwd_dq_kernel/_bwd_dkv_kernel)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="in-kernel PRNG dropout requires a real TPU backend")


def _export_mask(seed, bh, sq, sk, block_q, block_k, rate):
    """Replay the flash kernels' per-tile draws into a dense [bh,sq,sk]."""
    from jax.experimental import pallas as pl
    from megatron_clip_tpu.ops.pallas.flash_attention import _drop_keep

    def kern(seed_ref, o_ref, *, rate):
        b = pl.program_id(0)
        qi = pl.program_id(1)
        kj = pl.program_id(2)
        o_ref[0] = _drop_keep(seed_ref, b, qi, kj, (block_q, block_k), rate)

    from jax.experimental.pallas import tpu as pltpu
    return pl.pallas_call(
        functools.partial(kern, rate=rate),
        grid=(bh, sq // block_q, sk // block_k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, block_q, block_k),
                               lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, sk), jnp.float32),
    )(seed)


def _oracle(q, k, v, mask, scale, causal):
    """[BH,S,D] inputs + dense [BH,S,S] keep multipliers."""
    prec = jax.lax.Precision.HIGHEST
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32), precision=prec) * scale
    if causal:
        n = s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        s = jnp.where((row >= col)[None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p * mask, v.astype(jnp.float32),
                      precision=prec)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_dropout_matches_mask_oracle(causal):
    from megatron_clip_tpu.ops.pallas.flash_attention import flash_attention
    b, h, s, d = 2, 2, 256, 64
    rate, seed_val = 0.2, 1234
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    seed = jnp.full((1,), seed_val, jnp.int32)

    got = flash_attention(q, k, v, causal=causal, dropout_rate=rate,
                          dropout_seed=seed)
    # block auto-tune at s=256: one 256x256 tile per bh
    mask = _export_mask(seed, b * h, s, s, 256, 256, rate)
    want = _oracle(q.reshape(b * h, s, d), k.reshape(b * h, s, d),
                   v.reshape(b * h, s, d), mask, d ** -0.5, causal)
    np.testing.assert_allclose(np.asarray(got).reshape(b * h, s, d),
                               np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_dropout_grads_match_mask_oracle(causal):
    from megatron_clip_tpu.ops.pallas.flash_attention import flash_attention
    b, h, s, d = 1, 2, 256, 64
    rate, seed_val = 0.25, 77
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    tang = jax.random.normal(ks[3], (b, h, s, d), jnp.float32)
    seed = jnp.full((1,), seed_val, jnp.int32)
    mask = _export_mask(seed, b * h, s, s, 256, 256, rate)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       dropout_rate=rate,
                                       dropout_seed=seed) * tang)

    def loss_ref(q, k, v):
        o = _oracle(q.reshape(b * h, s, d), k.reshape(b * h, s, d),
                    v.reshape(b * h, s, d), mask, d ** -0.5, causal)
        return jnp.sum(o.reshape(b, h, s, d) * tang)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_flash_dropout_deterministic_and_seed_sensitive():
    from megatron_clip_tpu.ops.pallas.flash_attention import flash_attention
    b, h, s, d = 1, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    a1 = flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=5)
    a2 = flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=5)
    a3 = flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=6)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_flash_dropout_mean_preserved():
    """E[dropout(P)] = P: averaged over many seeds the dropped output
    approaches the undropped one."""
    from megatron_clip_tpu.ops.pallas.flash_attention import flash_attention
    b, h, s, d = 1, 1, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    base = flash_attention(q, k, v)
    acc = jnp.zeros_like(base)
    n = 24
    for i in range(n):
        acc = acc + flash_attention(q, k, v, dropout_rate=0.3,
                                    dropout_seed=1000 + i)
    err = float(jnp.mean(jnp.abs(acc / n - base))) / \
        float(jnp.mean(jnp.abs(base)))
    assert err < 0.2, f"mean relative deviation {err:.3f}"
