"""Context parallelism (ring attention) tests.

The reference has CP process groups and config plumbing but no attention
implementation (megatron/core/parallel_state.py:360-387; mcore 0.4 delegated
CP attention to TransformerEngine, absent from the snapshot). These tests
validate the completed TPU-native capability: ring attention over a
`context` mesh axis == the plain sdpa oracle, forward and backward, for
full / causal / zigzag-load-balanced regimes, plus end-to-end GPT training
with --context-parallel-size.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from megatron_clip_tpu.ops.attention import sdpa_bshd
from megatron_clip_tpu.ops.ring_attention import (
    ring_attention, zigzag_shard, zigzag_unshard)


def _qkv(b=4, s=32, h=2, d=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    return (jax.random.normal(kq, (b, s, h, d), dtype),
            jax.random.normal(kk, (b, s, h, d), dtype),
            jax.random.normal(kv, (b, s, h, d), dtype))


def _cp_mesh(devices8, cp=4):
    return Mesh(np.asarray(devices8).reshape(8 // cp, cp),
                ("data", "context"))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_sdpa(devices8, causal):
    q, k, v = _qkv()
    ref = sdpa_bshd(q, k, v, causal=causal)
    with jax.sharding.set_mesh(_cp_mesh(devices8)):
        out = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, causal=causal))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_zigzag_matches_sdpa(devices8):
    """Load-balanced layout: ranks hold chunks (i, 2cp-1-i); positions ride
    the ring so the causal mask stays exact."""
    cp = 4
    q, k, v = _qkv()
    ref = sdpa_bshd(q, k, v, causal=True)
    qz, kz, vz = (zigzag_shard(t, cp) for t in (q, k, v))
    with jax.sharding.set_mesh(_cp_mesh(devices8, cp)):
        out = jax.jit(lambda q, k, v: ring_attention(
            q, k, v, causal=True, layout="zigzag"))(qz, kz, vz)
    out = zigzag_unshard(np.asarray(out), cp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # round-trip sanity
    np.testing.assert_array_equal(
        np.asarray(zigzag_unshard(zigzag_shard(q, cp), cp)), np.asarray(q))


def test_ring_attention_gradients_match(devices8):
    """Backward through the ring (scan + ppermute transpose) == oracle."""
    q, k, v = _qkv()

    def ref_loss(qkv):
        q, k, v = qkv
        return (sdpa_bshd(q, k, v, causal=True) ** 2).sum()

    def ring_loss(qkv):
        q, k, v = qkv
        return (ring_attention(q, k, v, causal=True) ** 2).sum()

    g_ref = jax.grad(ref_loss)((q, k, v))
    with jax.sharding.set_mesh(_cp_mesh(devices8)):
        g_ring = jax.jit(jax.grad(ring_loss))((q, k, v))
    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_transformer_block_with_cp_matches_serial(devices8):
    """A full transformer stack with context_parallel=True == the same stack
    without (the sharding constraint + ring attention are numerics-neutral)."""
    from megatron_clip_tpu.config import TransformerCfg
    from megatron_clip_tpu.nn.transformer import (
        init_transformer, apply_transformer)

    cfg = TransformerCfg(layers=2, width=64, heads=4, use_flash=False)
    cfg_cp = TransformerCfg(layers=2, width=64, heads=4, use_flash=False,
                            context_parallel=True)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 64), jnp.float32)
    ref = apply_transformer(blocks, x, cfg, causal=True)
    with jax.sharding.set_mesh(_cp_mesh(devices8)):
        out = jax.jit(lambda b, x: apply_transformer(
            b, x, cfg_cp, causal=True))(blocks, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gpt_cp_training_matches_serial(devices8):
    """pretrain_gpt --context-parallel-size 4: loss after one step matches a
    cp=1 run bit-for-bit-ish (fp32, same seed/data)."""
    from pretrain_gpt import parse_args, run

    # >=6 steps: sharding-propagation flip-flop across iterations regressed
    # once at step 4 (outputs resharded per call until out_shardings pinned)
    common = ["--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
              "--seq-length", "32", "--vocab-size", "256",
              "--batch-size", "8", "--train-steps", "6", "--warmup", "1",
              "--precision", "fp32", "--log-interval", "3"]
    m_cp = run(parse_args(common + ["--context-parallel-size", "4"]))
    m_serial = run(parse_args(common))
    assert np.isfinite(m_cp["loss"])
    np.testing.assert_allclose(m_cp["loss"], m_serial["loss"],
                               atol=1e-4, rtol=1e-4)


def test_cp_rejects_zigzag_bias_and_dropout():
    """Remaining CP gates: zigzag + additive bias (the bias rows would need
    a matching reorder no caller performs) and attention-prob dropout.
    Contiguous additive bias is SUPPORTED since round 5 — see
    test_ring_attention_bias_matches_sdpa."""
    from megatron_clip_tpu.ops.attention import multi_head_attention
    from megatron_clip_tpu.ops.ring_attention import ring_attention

    x = jnp.zeros((2, 8, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="zigzag"):
        ring_attention(x, x, x, layout="zigzag",
                       bias=jnp.zeros((2, 1, 8, 8)))
    with pytest.raises(ValueError, match="4-D"):
        ring_attention(x, x, x, bias=jnp.zeros((8, 8)))
    params = {"wqkv": jnp.zeros((32, 96)), "wo": jnp.zeros((32, 32))}
    with pytest.raises(ValueError, match="dropout"):
        multi_head_attention(jnp.zeros((2, 8, 32)), params, 4,
                             context_parallel=True,
                             dropout_rate=0.1,
                             dropout_rng=jax.random.PRNGKey(0))


@pytest.mark.parametrize("rows", ["full", "broadcast"])
def test_ring_attention_bias_matches_sdpa(devices8, rows):
    """Additive bias under CP (round-5 gate removal): the bias's query rows
    shard with q; each ring step gathers the rotating block's columns by
    global position. Per-batch padding masks in both the [B,1,S,S] and the
    query-broadcast [B,1,1,S] forms, forward and backward."""
    q, k, v = _qkv()
    b, s = q.shape[0], q.shape[1]
    lens = jnp.asarray([s, s - 3, s // 2, 5])
    keymask = jnp.arange(s)[None, :] < lens[:, None]
    bias = jnp.where(keymask[:, None, None, :], 0.0, -1e30)  # [B,1,1,S]
    if rows == "full":
        bias = jnp.broadcast_to(bias, (b, 1, s, s))

    ref = sdpa_bshd(q, k, v, bias=bias)
    with jax.sharding.set_mesh(_cp_mesh(devices8)):
        out = jax.jit(lambda q, k, v, bias: ring_attention(
            q, k, v, bias=bias))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(q):
        return jnp.sum(sdpa_bshd(q, k, v, bias=bias) ** 2)

    def loss_ring(q):
        return jnp.sum(ring_attention(q, k, v, bias=bias) ** 2)

    with jax.sharding.set_mesh(_cp_mesh(devices8)):
        g_ring = jax.jit(jax.grad(loss_ring))(q)
    np.testing.assert_allclose(np.asarray(g_ring),
                               np.asarray(jax.grad(loss_ref)(q)),
                               atol=5e-4, rtol=5e-4)


def test_pipeline_bias_with_cp_matches_serial(devices8):
    """Additive bias threading the pipeline under context parallelism
    (round-5 gate removal): bias query rows shard over `context` inside the
    stage region, columns gathered per ring step — pp2 x cp2 with per-row
    padding == the serial forward."""
    from megatron_clip_tpu.config import ParallelCfg, TransformerCfg
    from megatron_clip_tpu.nn.transformer import (apply_transformer,
                                                  init_transformer)
    from megatron_clip_tpu.parallel import build_mesh
    from megatron_clip_tpu.parallel.pipeline import pipeline_transformer

    cfg = TransformerCfg(layers=4, width=64, heads=4,
                         context_parallel=True, use_flash=False)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
    lens = jnp.asarray([16, 11, 8, 16, 5, 16, 13, 7])
    pad = jnp.arange(16)[None, :] < lens[:, None]
    bias = jnp.broadcast_to(
        jnp.where(pad[:, None, None, :], 0.0, -1e30), (8, 1, 16, 16))

    serial_cfg = TransformerCfg(layers=4, width=64, heads=4,
                                use_flash=False)
    want = apply_transformer(blocks, x, serial_cfg, bias=bias)
    mesh = build_mesh(ParallelCfg(dp=2, pp=2, cp=2, microbatches=2))
    got = pipeline_transformer(blocks, x, cfg, mesh=mesh,
                               num_microbatches=2, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    g1 = jax.grad(lambda b_: jnp.sum(apply_transformer(
        b_, x, serial_cfg, bias=bias) ** 2))(blocks)
    g2 = jax.grad(lambda b_: jnp.sum(pipeline_transformer(
        b_, x, cfg, mesh=mesh, num_microbatches=2, bias=bias) ** 2))(blocks)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_gpt_zigzag_cp_training_matches_serial(devices8):
    """--context-parallel-layout zigzag: tokens/targets zigzag-reordered and
    position ids threaded through rope + pos-embed, so the loss matches the
    cp=1 natural-order run (the load-balanced causal layout, megatron-LM's
    cp_rank chunk assignment done end-to-end)."""
    from pretrain_gpt import parse_args, run

    common = ["--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
              "--seq-length", "64", "--vocab-size", "256",
              "--batch-size", "8", "--train-steps", "4", "--warmup", "1",
              "--precision", "fp32", "--log-interval", "2"]
    for pos in ("rope", "learned"):
        m_zig = run(parse_args(common + [
            "--position-embedding", pos,
            "--context-parallel-size", "4",
            "--context-parallel-layout", "zigzag"]))
        m_serial = run(parse_args(common + ["--position-embedding", pos]))
        np.testing.assert_allclose(m_zig["loss"], m_serial["loss"],
                                   atol=2e-4, rtol=2e-4)


def test_gpt_cp_with_pipeline(devices8):
    """cp2 x pp2: the ring-attention context axis threads through the
    pipeline schedule (nested shard_map, context stays auto inside the
    stage-manual region) — previously a SystemExit."""
    from pretrain_gpt import parse_args, run

    common = ["--num-layers", "4", "--hidden-size", "64", "--num-heads", "4",
              "--seq-length", "32", "--vocab-size", "256",
              "--batch-size", "8", "--train-steps", "2", "--warmup", "1",
              "--precision", "fp32", "--log-interval", "1"]
    m = run(parse_args(common + [
        "--context-parallel-size", "2",
        "--pipeline-model-parallel-size", "2",
        "--num-microbatches", "2"]))
    m_serial = run(parse_args(common))
    np.testing.assert_allclose(m["loss"], m_serial["loss"],
                               atol=2e-4, rtol=2e-4)
