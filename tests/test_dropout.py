"""Dropout done the JAX way: threaded PRNG keys, deterministic per seed.

Covers megatron's attention/hidden dropout semantics
(model/transformer.py:813-841 bias_dropout_add, CoreAttention
attention_dropout) without the per-rank RNG fork machinery
(tensor_parallel/random.py) — SPMD masks are consistent by construction.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, gpt_loss

TINY = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=128,
              seq_length=32)


def _tcfg(**kw):
    return TINY.transformer(**kw)


def test_dropout_deterministic_per_seed():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, 128)
    tcfg = _tcfg(attention_dropout=0.2, hidden_dropout=0.2)
    fn = jax.jit(lambda p, r: gpt_loss(p, tokens, TINY, tcfg=tcfg,
                                       compute_dtype=jnp.float32, rng=r))
    r = jax.random.PRNGKey(7)
    l1, l2 = float(fn(params, r)), float(fn(params, r))
    assert l1 == l2, "same key must give identical loss"
    l3 = float(fn(params, jax.random.PRNGKey(8)))
    assert l1 != l3, "different key must give a different mask"


def test_no_rng_means_no_dropout():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, 128)
    with_rate = gpt_loss(params, tokens, TINY,
                         tcfg=_tcfg(attention_dropout=0.5, hidden_dropout=0.5),
                         compute_dtype=jnp.float32, rng=None)
    without = gpt_loss(params, tokens, TINY, tcfg=_tcfg(),
                       compute_dtype=jnp.float32, rng=None)
    np.testing.assert_allclose(float(with_rate), float(without), rtol=1e-6)


def test_dropout_changes_loss_and_grads_flow():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, 128)
    tcfg = _tcfg(attention_dropout=0.3, hidden_dropout=0.3)
    loss_d, grads = jax.value_and_grad(
        lambda p: gpt_loss(p, tokens, TINY, tcfg=tcfg,
                           compute_dtype=jnp.float32,
                           rng=jax.random.PRNGKey(3)))(params)
    loss_c = gpt_loss(params, tokens, TINY, tcfg=_tcfg(),
                      compute_dtype=jnp.float32)
    assert float(loss_d) != float(loss_c)
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree.leaves(grads))))
    assert np.isfinite(gn) and gn > 0


def test_gpt_trains_with_dropout():
    """pretrain_gpt with --hidden-dropout 0.1 --attention-dropout 0.1:
    loss decreases on a fixed tiny corpus."""
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--vocab-size", "64", "--batch-size", "8",
        "--train-steps", "30", "--warmup", "3", "--precision", "fp32",
        "--log-interval", "30", "--lr", "1e-2",
        "--attention-dropout", "0.1", "--hidden-dropout", "0.1"]))
    # random tokens have ln(64)=4.16 nats entropy; training should get
    # below the uniform floor's neighbourhood from ~4.7 at init
    assert m["loss"] < 4.5, m


def test_dropout_under_remat_matches_no_remat():
    """jax.checkpoint replays the same dropout bits (keys are inputs)."""
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, 128)
    r = jax.random.PRNGKey(5)
    kw = dict(attention_dropout=0.2, hidden_dropout=0.2)
    g1 = jax.grad(lambda p: gpt_loss(p, tokens, TINY, tcfg=_tcfg(**kw),
                                     compute_dtype=jnp.float32, rng=r))(params)
    g2 = jax.grad(lambda p: gpt_loss(
        p, tokens, TINY, tcfg=_tcfg(remat="full", **kw),
        compute_dtype=jnp.float32, rng=r))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
