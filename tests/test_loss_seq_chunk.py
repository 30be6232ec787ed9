"""Sequence-chunked lm-head loss (gpt_loss loss_seq_chunk): value and
gradient parity vs the full-logits path, including ragged chunk padding and
loss masks."""
import jax
import jax.numpy as jnp
import pytest

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, gpt_loss


@pytest.fixture(scope="module")
def setup():
    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=2, vocab_size=257,
                 seq_length=23)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (3, cfg.seq_length + 1),
                                1, cfg.vocab_size - 1).astype(jnp.int32)
    return cfg, params, tokens


@pytest.mark.parametrize("chunk", [4, 8, 23, 64])
def test_loss_parity(setup, chunk):
    cfg, params, tokens = setup
    full = gpt_loss(params, tokens, cfg, compute_dtype=jnp.float32)
    chunked = gpt_loss(params, tokens, cfg, compute_dtype=jnp.float32,
                       loss_seq_chunk=chunk)
    assert float(full) == pytest.approx(float(chunked), rel=1e-6)


def test_grad_parity(setup):
    cfg, params, tokens = setup
    g_full = jax.grad(lambda p: gpt_loss(
        p, tokens, cfg, compute_dtype=jnp.float32))(params)
    g_chunk = jax.grad(lambda p: gpt_loss(
        p, tokens, cfg, compute_dtype=jnp.float32, loss_seq_chunk=8))(params)
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=1e-5) else
        pytest.fail("grad mismatch"), g_full, g_chunk)


def test_loss_mask_parity(setup):
    cfg, params, tokens = setup
    mask = (jax.random.uniform(jax.random.PRNGKey(2),
                               tokens.shape) > 0.3).astype(jnp.float32)
    full = gpt_loss(params, tokens, cfg, compute_dtype=jnp.float32,
                    loss_mask=mask)
    chunked = gpt_loss(params, tokens, cfg, compute_dtype=jnp.float32,
                       loss_mask=mask, loss_seq_chunk=7)
    assert float(full) == pytest.approx(float(chunked), rel=1e-6)


def test_moe_falls_back_to_full(setup):
    cfg, _, tokens = setup
    moe_cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=2,
                     vocab_size=257, seq_length=23, num_experts=2)
    params = init_gpt(jax.random.PRNGKey(0), moe_cfg)
    # chunked request on an MoE model silently uses the aux-aware full path
    l = gpt_loss(params, tokens, moe_cfg, compute_dtype=jnp.float32,
                 loss_seq_chunk=8)
    assert jnp.isfinite(l)
