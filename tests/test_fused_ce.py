"""Fused lm-head + cross-entropy Pallas kernel (ops/pallas/fused_ce.py):
numerics parity vs the decomposed logits path — fused-vs-unfused contract of
the reference's fused-kernel tests (fused_kernels/tests/test_fused_kernels.py)
— in interpret mode on CPU; the real-chip perf runs live in
tools/bench_model.py --fused-ce."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.ops.cross_entropy import cross_entropy
from megatron_clip_tpu.ops.pallas.fused_ce import fused_linear_cross_entropy


@pytest.mark.parametrize("t,w,v", [
    (256, 128, 1024),     # exact multiples
    (300, 128, 1000),     # padded tokens + masked vocab tail
])
def test_fused_ce_matches_decomposed(t, w, v):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(t, w).astype(np.float32))
    wm = jnp.asarray(0.1 * rng.randn(w, v).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, v, t).astype(np.int32))

    want = cross_entropy((x @ wm).astype(jnp.float32)[None], lbl[None])[0]
    got = fused_linear_cross_entropy(x, wm, lbl, 256, 512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_fused_ce_gradients_match():
    rng = np.random.RandomState(1)
    t, w, v = 300, 128, 1000
    x = jnp.asarray(rng.randn(t, w).astype(np.float32))
    wm = jnp.asarray(0.1 * rng.randn(w, v).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, v, t).astype(np.int32))
    m = jnp.asarray((rng.rand(t) > 0.2).astype(np.float32))

    def loss_ref(x, wm):
        per = cross_entropy((x @ wm).astype(jnp.float32)[None], lbl[None])[0]
        return jnp.sum(per * m) / m.sum()

    def loss_fused(x, wm):
        per = fused_linear_cross_entropy(x, wm, lbl, 256, 512)
        return jnp.sum(per * m) / m.sum()

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wm)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wm)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=2e-5)


def test_gpt_loss_fused_matches_chunked():
    """gpt_loss(fused_ce=True) == gpt_loss(loss_seq_chunk) on a tiny model."""
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, gpt_loss

    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=300,
                 seq_length=64)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 1,
                                299).astype(jnp.int32)
    want = gpt_loss(params, tokens, cfg, compute_dtype=jnp.float32,
                    loss_seq_chunk=32)
    got = gpt_loss(params, tokens, cfg, compute_dtype=jnp.float32,
                   fused_ce=True)
    np.testing.assert_allclose(float(got), float(want), atol=1e-4, rtol=1e-5)
