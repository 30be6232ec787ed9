"""Pipeline parallelism: the staged shard_map/ppermute schedule must be
numerically identical to the sequential transformer — forward AND gradients —
the contract of the reference's schedule tests
(tests/unit_tests/pipeline_parallel/test_schedules.py)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import (
    CLIPCfg, VisionCfg, TextCfg, ParallelCfg, BranchParallelCfg, TransformerCfg)
from megatron_clip_tpu.nn.transformer import init_transformer, apply_transformer
from megatron_clip_tpu.parallel import build_mesh
from megatron_clip_tpu.parallel.pipeline import pipeline_transformer

CFG = TransformerCfg(layers=4, width=64, heads=2)


@pytest.mark.parametrize("pp,mb,dp,tp", [
    (4, 4, 2, 1),
    (2, 6, 2, 2),
    (4, 8, 1, 2),
])
@pytest.mark.parametrize("causal", [False, True])
def test_pipeline_matches_sequential(devices8, pp, mb, dp, tp, causal):
    mesh = build_mesh(ParallelCfg(dp=dp, tp=tp, pp=pp, microbatches=mb))
    blocks = init_transformer(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 8, 64))

    want = apply_transformer(blocks, x, CFG, causal=causal)
    got = pipeline_transformer(blocks, x, CFG, mesh=mesh, num_microbatches=mb,
                               causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("interleaved", [False, True])
def test_pipeline_per_row_position_ids(devices8, interleaved):
    """[B, S] per-row position_ids (--reset-position-ids document packing)
    thread through both schedules microbatch-by-microbatch — parity with
    the sequential transformer, unlike the reference where the scheduler
    never sees position ids (they ride the batch dict)."""
    from megatron_clip_tpu.parallel.pipeline import (
        pipeline_transformer_interleaved)
    cfg = TransformerCfg(layers=4, width=64, heads=2, rope=True)
    mesh = build_mesh(ParallelCfg(dp=2, tp=1, pp=2, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 64))
    # per-row positions restarting mid-sequence (two packed documents)
    pos = jnp.stack([jnp.concatenate([jnp.arange(3 + r % 3),
                                      jnp.arange(5 - r % 3)])
                     for r in range(8)]).astype(jnp.int32)

    want = apply_transformer(blocks, x, cfg, causal=True, position_ids=pos)
    if interleaved:
        got = pipeline_transformer_interleaved(
            blocks, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2,
            causal=True, position_ids=pos)
    else:
        got = pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                   num_microbatches=4, causal=True,
                                   position_ids=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match(devices8):
    mesh = build_mesh(ParallelCfg(dp=2, tp=1, pp=4, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 64))

    def loss_seq(b):
        return jnp.sum(apply_transformer(b, x, CFG) ** 2)

    def loss_pipe(b):
        return jnp.sum(pipeline_transformer(b, x, CFG, mesh=mesh,
                                            num_microbatches=4) ** 2)

    g_seq = jax.grad(loss_seq)(blocks)
    g_pipe = jax.grad(loss_pipe)(blocks)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_branch_parallel_with_pipeline(devices8):
    """End to end: vision tower pipelined over 4 stages, text tower dp4 —
    the zPretrain/pretrain_clip.sh topology shape (main TP1/PP4 + extra
    branch), checked against the joint single-device step."""
    from megatron_clip_tpu.parallel.branch import BranchParallelCLIP
    from megatron_clip_tpu.factory import CLIPModel
    from megatron_clip_tpu.config import Precision
    from megatron_clip_tpu.models.clip import init_clip
    from megatron_clip_tpu.training import make_train_step, make_optimizer, cosine_lr
    from megatron_clip_tpu.training.train_step import TrainState

    cfg = CLIPCfg(
        embed_dim=64,
        vision=VisionCfg(layers=4, width=64, head_width=32, patch_size=8,
                         image_size=32),
        text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2,
                     layers=2),
    )
    bp = BranchParallelCfg(vision=ParallelCfg(dp=1, tp=1, pp=4, microbatches=4),
                           text=ParallelCfg(dp=4))
    runner = BranchParallelCLIP(cfg=cfg, bp=bp, compute_dtype=jnp.float32)

    def tx_factory(p):
        return make_optimizer(p, cosine_lr(1e-3, 2, 100))

    state = runner.init_state(jax.random.PRNGKey(0), tx_factory)

    model = CLIPModel(cfg=cfg, precision=Precision("float32", "float32"))
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tx = tx_factory(params)
    ref_state = TrainState.create(params, tx)
    ref_step = make_train_step(model, tx)

    k = jax.random.PRNGKey(7)
    images = jax.random.normal(k, (8, 32, 32, 3))
    texts = jax.random.randint(k, (8, 16), 1, 510).astype(jnp.int32)

    for _ in range(2):
        state, m = runner.train_step(state, images, texts)
        ref_state, rm = ref_step(ref_state, images, texts)
        np.testing.assert_allclose(float(m["loss"]), float(rm["loss"]),
                                   rtol=3e-4)


@pytest.mark.parametrize("pp,v,mb", [(2, 2, 4), (4, 2, 4), (2, 3, 6)])
def test_interleaved_matches_sequential(devices8, pp, v, mb):
    """Virtual-pipeline (interleaved) schedule == sequential numerics."""
    from megatron_clip_tpu.parallel.pipeline import pipeline_transformer_interleaved
    cfg = TransformerCfg(layers=pp * v * 2, width=64, heads=2)
    mesh = build_mesh(ParallelCfg(dp=8 // pp, tp=1, pp=pp))
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 8, 64))
    want = apply_transformer(blocks, x, cfg)
    got = pipeline_transformer_interleaved(
        blocks, x, cfg, mesh=mesh, num_microbatches=mb, num_chunks=v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_interleaved_gradients_match(devices8):
    from megatron_clip_tpu.parallel.pipeline import pipeline_transformer_interleaved
    cfg = TransformerCfg(layers=8, width=64, heads=2)
    mesh = build_mesh(ParallelCfg(dp=4, tp=1, pp=2))
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 64))

    g_seq = jax.grad(lambda b: jnp.sum(apply_transformer(b, x, cfg) ** 2))(blocks)
    g_int = jax.grad(lambda b: jnp.sum(pipeline_transformer_interleaved(
        b, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2) ** 2))(blocks)
    for a, b_ in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_int)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("vpp", [1, 2])
def test_pipeline_with_additive_bias_matches_sequential(devices8, vpp):
    """Padding masks travel with their microbatch through the ring —
    pipelined-BERT-with-padding parity (reference schedules carry
    attention_mask per microbatch, schedules.py forward_step)."""
    from megatron_clip_tpu.parallel.pipeline import make_pipelined_layers_fn
    mesh = build_mesh(ParallelCfg(dp=2, tp=1, pp=4, microbatches=4))
    cfg = TransformerCfg(layers=4 * vpp, width=64, heads=2)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 64))
    # per-row padding: rows attend only to their first k positions
    lens = jnp.asarray([8, 5, 6, 8, 3, 8, 7, 4])
    pad = (jnp.arange(8)[None, :] < lens[:, None])
    bias = jnp.where(pad[:, None, None, :], 0.0, -1e30)

    want = apply_transformer(blocks, x, cfg, bias=bias)
    layers_fn = make_pipelined_layers_fn(mesh, 4, vpp)
    got = layers_fn(blocks, x, cfg, causal=False, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_seq(b):
        return jnp.sum(apply_transformer(b, x, cfg, bias=bias) ** 2)

    def loss_pipe(b):
        return jnp.sum(layers_fn(b, x, cfg, causal=False, bias=bias) ** 2)

    g1 = jax.grad(loss_seq)(blocks)
    g2 = jax.grad(loss_pipe)(blocks)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)


def test_pipeline_memory_flat_in_microbatches(devices8):
    """Compile-time memory analysis: with the global batch fixed, per-device
    temp memory must not grow with the microbatch count (GPipe storage is
    ~B block-inputs + (S-1)/M fill slack; M=16 should not exceed M=4 by more
    than the slack). This is the measurable form of the liveness claim."""
    cfg = TransformerCfg(layers=4, width=64, heads=2, remat="full")
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 8, 64))

    def temp_bytes(mb):
        mesh = build_mesh(ParallelCfg(dp=1, tp=2, pp=4, microbatches=mb))

        def loss(b):
            return jnp.sum(pipeline_transformer(
                b, x, cfg, mesh=mesh, num_microbatches=mb) ** 2)

        compiled = jax.jit(jax.grad(loss)).lower(blocks).compile()
        ma = compiled.memory_analysis()
        return ma.temp_size_in_bytes

    t4, t16 = temp_bytes(4), temp_bytes(16)
    # more microbatches => smaller per-tick tensors; allow 25% headroom for
    # scheduling noise but forbid superlinear growth
    assert t16 <= t4 * 1.25, (t4, t16)


# ---------------- feature composition through the schedule -------------------
# The reference scheduler (schedules.py) runs dropout / MoE under pp without
# special-casing; these pin the TPU schedules to the same composability.

DROP_CFG = TransformerCfg(layers=4, width=64, heads=4,
                          attention_dropout=0.1, hidden_dropout=0.1,
                          use_flash=False)


def _microbatched_ref(blocks, x, cfg, rng, m, **kw):
    """pp=1 reference with the per-microbatch key law the pipeline uses:
    split(fold_in(rng, mb), L)."""
    mb = x.shape[0] // m
    outs = []
    for i in range(m):
        r = None if rng is None else jax.random.fold_in(rng, i)
        outs.append(apply_transformer(blocks, x[i * mb:(i + 1) * mb], cfg,
                                      rng=r, **kw))
    return jnp.concatenate(outs, 0)


def test_pipeline_dropout_matches_microbatched(devices8):
    mesh = build_mesh(ParallelCfg(pp=4, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(0), DROP_CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
    rng = jax.random.PRNGKey(42)
    want = _microbatched_ref(blocks, x, DROP_CFG, rng, 4)
    got = pipeline_transformer(blocks, x, DROP_CFG, mesh=mesh,
                               num_microbatches=4, rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_interleaved_dropout_matches_microbatched(devices8):
    from megatron_clip_tpu.parallel.pipeline import \
        pipeline_transformer_interleaved
    mesh = build_mesh(ParallelCfg(pp=2, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(0), DROP_CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
    rng = jax.random.PRNGKey(42)
    want = _microbatched_ref(blocks, x, DROP_CFG, rng, 4)
    got = pipeline_transformer_interleaved(
        blocks, x, DROP_CFG, mesh=mesh, num_microbatches=4, num_chunks=2,
        rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_dropout_gradients_match(devices8):
    mesh = build_mesh(ParallelCfg(pp=4, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(0), DROP_CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
    rng = jax.random.PRNGKey(42)

    def loss_ref(b):
        return (_microbatched_ref(b, x, DROP_CFG, rng, 4) ** 2).sum()

    def loss_pipe(b):
        return (pipeline_transformer(b, x, DROP_CFG, mesh=mesh,
                                     num_microbatches=4, rng=rng) ** 2).sum()

    g_ref = jax.grad(loss_ref)(blocks)
    g_pipe = jax.grad(loss_pipe)(blocks)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_pipeline_moe_aux_matches_microbatched(devices8):
    """MoE aux loss threads through the schedule: mean over microbatches of
    the per-microbatch layer-summed aux (distrib_grad.py:85 analogue)."""
    cfg = TransformerCfg(layers=4, width=64, heads=4, num_experts=4,
                         use_flash=False)
    mesh = build_mesh(ParallelCfg(pp=4, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))

    outs, auxs = [], []
    for i in range(4):
        o, a = apply_transformer(blocks, x[i * 2:(i + 1) * 2], cfg)
        outs.append(o)
        auxs.append(a)
    want, want_aux = jnp.concatenate(outs, 0), jnp.mean(jnp.stack(auxs))
    got, got_aux = pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                        num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(got_aux), float(want_aux), rtol=1e-5)


def test_interleaved_moe_aux_matches_microbatched(devices8):
    from megatron_clip_tpu.parallel.pipeline import \
        pipeline_transformer_interleaved
    cfg = TransformerCfg(layers=4, width=64, heads=4, num_experts=4,
                         use_flash=False)
    mesh = build_mesh(ParallelCfg(pp=2, microbatches=4))
    blocks = init_transformer(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))

    outs, auxs = [], []
    for i in range(4):
        o, a = apply_transformer(blocks, x[i * 2:(i + 1) * 2], cfg)
        outs.append(o)
        auxs.append(a)
    want, want_aux = jnp.concatenate(outs, 0), jnp.mean(jnp.stack(auxs))
    got, got_aux = pipeline_transformer_interleaved(
        blocks, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(got_aux), float(want_aux), rtol=1e-5)


def test_joint_clip_pipeline_matches_single_device(devices8):
    """The flagship configuration: BOTH towers pipelined over the stage axis
    of ONE mesh (pp2 x dp2 x tp2, mb4) must reproduce the single-device
    train step — the capability megatron's pretrain_CLIP.py+schedules.py:1043
    reaches for (and VERDICT r2 flagged as a silent no-op)."""
    from megatron_clip_tpu import factory
    from megatron_clip_tpu.losses import ClipLoss
    from megatron_clip_tpu.training.loop import _JointRunner
    from megatron_clip_tpu.training.optim import make_optimizer

    class A:
        accum_freq = 1
        seed = 0

    tx_factory = lambda p: make_optimizer(p, lambda s: 1e-3)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    texts = jnp.asarray(rng.randint(1, 40000, (8, 32)).astype(np.int32))

    model1, params1 = factory.create_model("test-tiny", precision="fp32")
    r1 = _JointRunner(A(), model1, params1, tx_factory, ParallelCfg(),
                      ClipLoss())
    model2, params2 = factory.create_model("test-tiny", precision="fp32")
    r2 = _JointRunner(A(), model2, params2, tx_factory,
                      ParallelCfg(dp=2, tp=2, pp=2, microbatches=4),
                      ClipLoss())
    for _ in range(2):
        m1 = r1.step(images, texts)
        m2 = r2.step(images, texts)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(r1.state.params),
                    jax.tree.leaves(r2.state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_interleaved_prearranged_matches_logical(devices8):
    """vpp_arrange physical placement (zero cross-stage weight movement) must
    be numerically identical to the logical-order schedule, and vpp_restore
    must invert vpp_arrange exactly (checkpoints stay logical)."""
    from megatron_clip_tpu.parallel.pipeline import (
        pipeline_transformer_interleaved, vpp_arrange, vpp_restore)

    cfg = TransformerCfg(layers=8, width=64, heads=4)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
    mesh = build_mesh(ParallelCfg(dp=4, pp=2))

    want = apply_transformer(blocks, x, cfg)
    log = pipeline_transformer_interleaved(
        blocks, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2)
    pre_blocks = vpp_arrange(blocks, 2, 2)
    pre = pipeline_transformer_interleaved(
        pre_blocks, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2,
        prearranged=True)
    np.testing.assert_allclose(np.asarray(log), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(log),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(vpp_restore(pre_blocks, 2, 2)),
                    jax.tree.leaves(blocks)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_interleaved_prearranged_gradients_match(devices8):
    """Gradients through the prearranged schedule, restored to logical
    order, equal the logical schedule's gradients."""
    from megatron_clip_tpu.parallel.pipeline import (
        pipeline_transformer_interleaved, vpp_arrange, vpp_restore)

    cfg = TransformerCfg(layers=4, width=64, heads=2)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 64))
    mesh = build_mesh(ParallelCfg(dp=4, pp=2))

    g_log = jax.grad(lambda b: jnp.sum(pipeline_transformer_interleaved(
        b, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2) ** 2))(blocks)
    g_pre = jax.grad(lambda b: jnp.sum(pipeline_transformer_interleaved(
        b, x, cfg, mesh=mesh, num_microbatches=4, num_chunks=2,
        prearranged=True) ** 2))(vpp_arrange(blocks, 2, 2))
    for a, b in zip(jax.tree.leaves(vpp_restore(g_pre, 2, 2)),
                    jax.tree.leaves(g_log)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_zigzag_rope_requires_position_ids(devices8):
    """zigzag CP without explicit zigzag position_ids must raise (natural-
    order rope tables against zigzag-masked ring attention would be silently
    wrong) — in the plain transformer, the pipeline, and apply_gpt."""
    import dataclasses
    from megatron_clip_tpu.models.gpt import GPTCfg, apply_gpt, init_gpt

    cfg = dataclasses.replace(CFG, rope=True, context_parallel=True,
                              context_parallel_layout="zigzag")
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 64))
    with pytest.raises(ValueError, match="zigzag"):
        apply_transformer(blocks, x, cfg, causal=True)

    mesh = build_mesh(ParallelCfg(pp=2, cp=2, dp=2))
    with pytest.raises(ValueError, match="zigzag"):
        pipeline_transformer(blocks, x, cfg, mesh=mesh, num_microbatches=2,
                             causal=True)

    gcfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=128,
                  seq_length=16, position_embedding="learned")
    gparams = init_gpt(jax.random.PRNGKey(0), gcfg)
    tcfg = gcfg.transformer(context_parallel=True,
                            context_parallel_layout="zigzag")
    tokens = jnp.ones((2, 16), jnp.int32)
    with pytest.raises(ValueError, match="zigzag"):
        apply_gpt(gparams, tokens, gcfg, tcfg=tcfg)


def test_joint_clip_vpp_prearranged_and_ckpt_layout(devices8, tmp_path):
    """Joint CLIP with the interleaved schedule (vpp2): layers live in
    vpp_arrange physical order in memory, but (a) training matches the
    single-device step, and (b) checkpoints stay in logical layer order —
    a vpp2 save must load into a pp1 runner bit-for-bit."""
    from megatron_clip_tpu import factory
    from megatron_clip_tpu.losses import ClipLoss
    from megatron_clip_tpu.training.loop import _JointRunner
    from megatron_clip_tpu.training.optim import make_optimizer

    class A:
        accum_freq = 1
        seed = 0

    towers = dict(
        vision_cfg={"image_size": 32, "layers": 4, "width": 64,
                    "head_width": 32, "patch_size": 8},
        text_cfg={"context_length": 32, "vocab_size": 49408, "width": 64,
                  "heads": 2, "layers": 4})
    tx_factory = lambda p: make_optimizer(p, lambda s: 1e-3)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    texts = jnp.asarray(rng.randint(1, 40000, (8, 32)).astype(np.int32))

    model1, params1 = factory.create_model("test-tiny", precision="fp32",
                                           **towers)
    r1 = _JointRunner(A(), model1, params1, tx_factory, ParallelCfg(),
                      ClipLoss())
    model2, params2 = factory.create_model("test-tiny", precision="fp32",
                                           **towers)
    r2 = _JointRunner(A(), model2, params2, tx_factory,
                      ParallelCfg(dp=2, tp=2, pp=2, vpp=2, microbatches=4),
                      ClipLoss())
    for _ in range(2):
        m1 = r1.step(images, texts)
        m2 = r2.step(images, texts)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    # in-memory physical order differs from r1's logical order for blocks,
    # but the checkpoint must be logical: save from vpp2, load into pp1
    r2.save(str(tmp_path / "ck"), 2, 16)
    model3, params3 = factory.create_model("test-tiny", precision="fp32",
                                           **towers)
    r3 = _JointRunner(A(), model3, params3, tx_factory, ParallelCfg(),
                      ClipLoss())
    r3.load(str(tmp_path / "ck"))
    for a, b in zip(jax.tree.leaves(r1.state.params),
                    jax.tree.leaves(r3.state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
    # and resuming the vpp2 runner from its own checkpoint round-trips
    r2b = _JointRunner(A(), *factory.create_model(
        "test-tiny", precision="fp32", **towers), tx_factory,
        ParallelCfg(dp=2, tp=2, pp=2, vpp=2, microbatches=4), ClipLoss())
    r2b.load(str(tmp_path / "ck"))
    for a, b in zip(jax.tree.leaves(r2.state.params),
                    jax.tree.leaves(r2b.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_bf16_compiles_and_matches(devices8):
    """bf16 activations through both schedules, forward AND gradient.

    Regression: XLA CPU's AllReducePromotion pass CHECK-failed ("Invalid
    binary instruction opcode copy") cloning the bf16 psum_invariant
    all-reduces that shard_map's pvary transposes emit — which killed every
    bf16-compute pipelined train step on the virtual-device mesh (the
    branch CLI path among them). The pipeline now carries its scan
    state/buffers in f32 on the CPU backend (compute stays bf16)."""
    from megatron_clip_tpu.parallel.pipeline import (
        pipeline_transformer, pipeline_transformer_interleaved)

    cfg = TransformerCfg(layers=4, width=64, heads=2)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    bb = jax.tree.map(lambda l: l.astype(jnp.bfloat16), blocks)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 64)
                          ).astype(jnp.bfloat16)
    mesh = build_mesh(ParallelCfg(dp=2, pp=2))

    want = apply_transformer(bb, x, cfg)
    got = pipeline_transformer(bb, x, cfg, mesh=mesh, num_microbatches=2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)
    got_i = pipeline_transformer_interleaved(
        bb, x, cfg, mesh=mesh, num_microbatches=2, num_chunks=2)
    np.testing.assert_allclose(np.asarray(got_i, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)

    # gradients compile and are finite under bf16 (the crashing graphs)
    for fn in (lambda b: pipeline_transformer(
                   b, x, cfg, mesh=mesh, num_microbatches=2),
               lambda b: pipeline_transformer_interleaved(
                   b, x, cfg, mesh=mesh, num_microbatches=2, num_chunks=2)):
        g = jax.jit(jax.grad(
            lambda b: jnp.sum(fn(b).astype(jnp.float32) ** 2)))(bb)
        assert all(np.isfinite(np.asarray(l, np.float32)).all()
                   for l in jax.tree.leaves(g))


def test_relpos_tower_pipelines(devices8):
    """relpos-ViT (BEiT-style per-layer learned attention bias) under pp2
    == single-device: the per-layer bias tables ride the stage-sharded
    stacked blocks; only the layer-independent [S, S] gather map enters
    the schedule (reference pipelines all towers uniformly,
    megatron/model/transformer.py:1402)."""
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vit import init_vit, apply_vit
    from megatron_clip_tpu.parallel.pipeline import make_pipelined_layers_fn

    cfg = VisionCfg(layers=4, width=64, head_width=32, patch_size=8,
                    image_size=32, rel_pos_bias=True)
    params = init_vit(jax.random.PRNGKey(0), cfg, embed_dim=64)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))

    want = apply_vit(params, images, cfg, 64, compute_dtype=jnp.float32)
    mesh = build_mesh(ParallelCfg(dp=2, pp=2))
    for chunks in (1, 2):
        lf = make_pipelined_layers_fn(mesh, 2, chunks)
        got = apply_vit(params, images, cfg, 64, compute_dtype=jnp.float32,
                        layers_fn=lf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=f"v{chunks}")


def test_relpos_patch_dropout_pipelines(devices8):
    """relpos + patch dropout under the pipeline (round-5 gate removal):
    each example keeps different patches, so the relative-position gather
    map becomes per-example [B, S', S'] — the schedules microbatch it and
    index it per tick. pp2 (plain and interleaved) == the serial forward
    with the same dropout rng."""
    import dataclasses
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vit import init_vit, apply_vit
    from megatron_clip_tpu.parallel.pipeline import make_pipelined_layers_fn

    cfg = VisionCfg(layers=4, width=64, head_width=32, patch_size=8,
                    image_size=32, rel_pos_bias=True, patch_dropout=0.4)
    params = init_vit(jax.random.PRNGKey(0), cfg, embed_dim=64)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    rng = jax.random.PRNGKey(7)

    want = apply_vit(params, images, cfg, 64, compute_dtype=jnp.float32,
                     patch_dropout_rng=rng)
    mesh = build_mesh(ParallelCfg(dp=2, pp=2))
    for chunks in (1, 2):
        lf = make_pipelined_layers_fn(mesh, 2, chunks)
        got = apply_vit(params, images, cfg, 64, compute_dtype=jnp.float32,
                        patch_dropout_rng=rng, layers_fn=lf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=f"v{chunks}")

    # gradients through the per-example map thread the schedule too
    lf = make_pipelined_layers_fn(mesh, 2, 1)
    g1 = jax.grad(lambda p: jnp.sum(apply_vit(
        p, images, cfg, 64, compute_dtype=jnp.float32,
        patch_dropout_rng=rng) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(apply_vit(
        p, images, cfg, 64, compute_dtype=jnp.float32,
        patch_dropout_rng=rng, layers_fn=lf) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_apply_fn_refused_under_cp(devices8):
    """A custom stage runner (CoCa decoder apply_fn/extra) must refuse a
    context-parallel pipeline loudly — the CP branch rebuilds the forward
    around ring-attention rope slices and previously dropped apply_fn
    silently."""
    import dataclasses
    mesh = build_mesh(ParallelCfg(dp=1, tp=1, pp=2, cp=2, microbatches=2))
    cfg = dataclasses.replace(CFG, context_parallel=True)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 64))

    def custom(stage_blocks, x, cfg, **kw):
        return apply_transformer(stage_blocks, x, cfg)

    with pytest.raises(NotImplementedError, match="context parallelism"):
        pipeline_transformer(blocks, x, cfg, mesh=mesh, num_microbatches=2,
                             apply_fn=custom)
    with pytest.raises(NotImplementedError, match="context parallelism"):
        pipeline_transformer(blocks, x, cfg, mesh=mesh, num_microbatches=2,
                             extra=x)


def test_pipeline_bf16_with_context_parallel(devices8):
    """bf16 compute under pp x cp on the CPU backend (session-2 fix): ring
    attention's own psums run in the per-tick compute dtype, so casting the
    promoted f32 carries back to bf16 re-created the XLA CPU
    AllReducePromotion CHECK-failure one level deeper (the pretrain_gpt
    --precision bf16 --pipeline 2 --context-parallel-size 2 CLI crashed).
    Under CP the per-tick compute now stays f32 on CPU; fwd + grad parity
    vs the unpipelined bf16 forward."""
    import dataclasses
    from megatron_clip_tpu.parallel.pipeline import pipeline_transformer

    cfg = dataclasses.replace(CFG, context_parallel=True)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    bb = jax.tree.map(lambda l: l.astype(jnp.bfloat16), blocks)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 64)
                          ).astype(jnp.bfloat16)
    mesh = build_mesh(ParallelCfg(dp=1, tp=1, pp=2, cp=2, microbatches=2))

    want = apply_transformer(bb, x, CFG)     # serial: no cp flag needed
    got = pipeline_transformer(bb, x, cfg, mesh=mesh, num_microbatches=2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)
    g = jax.jit(jax.grad(
        lambda b: jnp.sum(pipeline_transformer(
            b, x, cfg, mesh=mesh, num_microbatches=2
        ).astype(jnp.float32) ** 2)))(bb)
    assert all(np.isfinite(np.asarray(l, np.float32)).all()
               for l in jax.tree.leaves(g))
