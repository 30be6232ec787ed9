"""Branch-parallel CLIP: two towers on disjoint sub-meshes with independent
layouts must train identically to the single-mesh joint step — the
correctness contract for the capability the reference left unfinished
(SURVEY.md §0, parallel_state.py:99-241)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import (
    CLIPCfg, VisionCfg, TextCfg, ParallelCfg, BranchParallelCfg, Precision)
from megatron_clip_tpu.factory import CLIPModel
from megatron_clip_tpu.models.clip import init_clip
from megatron_clip_tpu.parallel.branch import BranchParallelCLIP
from megatron_clip_tpu.training import make_train_step, make_optimizer, cosine_lr
from megatron_clip_tpu.training.train_step import TrainState

TINY = CLIPCfg(
    embed_dim=64,
    vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8, image_size=32),
    text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2, layers=2),
)


def _data(b=8):
    k = jax.random.PRNGKey(7)
    ki, kt = jax.random.split(k)
    images = jax.random.normal(ki, (b, 32, 32, 3))
    texts = jax.random.randint(kt, (b, 16), 1, 510).astype(jnp.int32)
    return images, texts.at[:, 12].set(511)


def _tx_factory(params):
    return make_optimizer(params, cosine_lr(1e-3, 2, 100))


@pytest.mark.parametrize("vision_layout,text_layout", [
    (dict(dp=2, tp=2), dict(dp=2, tp=2)),       # 4 + 4 devices
    (dict(dp=1, tp=4), dict(dp=4, tp=1)),       # asymmetric layouts
    (dict(dp=2, fsdp=2, tp=1), dict(dp=1, tp=2)),  # 4 + 2 (unequal sizes)
])
def test_branch_step_matches_joint_step(devices8, vision_layout, text_layout):
    bp = BranchParallelCfg(vision=ParallelCfg(**vision_layout),
                           text=ParallelCfg(**text_layout))
    runner = BranchParallelCLIP(cfg=TINY, bp=bp, compute_dtype=jnp.float32)
    state = runner.init_state(jax.random.PRNGKey(0), _tx_factory)
    images, texts = _data()

    # reference: joint single-computation step on the default device
    model = CLIPModel(cfg=TINY, precision=Precision("float32", "float32"))
    params = init_clip(jax.random.PRNGKey(0), TINY)
    tx = _tx_factory(params)
    ref_state = TrainState.create(params, tx)
    ref_step = make_train_step(model, tx)

    losses, ref_losses = [], []
    for _ in range(3):
        state, m = runner.train_step(state, images, texts)
        losses.append(float(m["loss"]))
        ref_state, rm = ref_step(ref_state, images, texts)
        ref_losses.append(float(rm["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=3e-4, atol=3e-5)
    # logit_scale must evolve identically too
    np.testing.assert_allclose(float(state.head[0]["logit_scale"]),
                               float(ref_state.params["logit_scale"]),
                               rtol=1e-5)


def test_branch_meshes_are_disjoint(devices8):
    bp = BranchParallelCfg(vision=ParallelCfg(dp=2, tp=2),
                           text=ParallelCfg(dp=2, tp=2))
    runner = BranchParallelCLIP(cfg=TINY, bp=bp, compute_dtype=jnp.float32)
    v = set(d.id for d in runner.vision_mesh.devices.flat)
    t = set(d.id for d in runner.text_mesh.devices.flat)
    assert v.isdisjoint(t) and len(v) == 4 and len(t) == 4


def test_too_few_devices_raises(devices8):
    bp = BranchParallelCfg(vision=ParallelCfg(dp=8), text=ParallelCfg(dp=8))
    with pytest.raises(ValueError, match="extra_world_size"):
        BranchParallelCLIP(cfg=TINY, bp=bp)


def test_branch_accum_freq_matches_full_batch(devices8):
    """--accum-freq in the branch step: chunked tower backward (4 chunks)
    must reproduce the full-batch step exactly — the batch coupling lives
    in the join, so per-chunk vjp grads sum to the full gradient."""
    bp = BranchParallelCfg(vision=ParallelCfg(dp=2, tp=2),
                           text=ParallelCfg(dp=2, tp=2))
    r1 = BranchParallelCLIP(cfg=TINY, bp=bp, compute_dtype=jnp.float32)
    s1 = r1.init_state(jax.random.PRNGKey(0), _tx_factory)
    r4 = BranchParallelCLIP(cfg=TINY, bp=bp, compute_dtype=jnp.float32,
                            accum_freq=4)
    s4 = r4.init_state(jax.random.PRNGKey(0), _tx_factory)
    images, texts = _data()
    for _ in range(2):
        s1, m1 = r1.train_step(s1, images, texts)
        s4, m4 = r4.train_step(s4, images, texts)
    assert abs(float(m1["loss"]) - float(m4["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s1.vision[0]),
                    jax.tree.leaves(s4.vision[0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_branch_eval_params_runs_eval(devices8):
    """eval_params gathers both towers + logit scale onto the vision mesh;
    the joint CLIPModel apply must run on them (epoch-eval parity,
    open_CLIP main.py eval cadence)."""
    bp = BranchParallelCfg(vision=ParallelCfg(dp=1, tp=4),
                           text=ParallelCfg(dp=4, tp=1))
    runner = BranchParallelCLIP(cfg=TINY, bp=bp, compute_dtype=jnp.float32)
    state = runner.init_state(jax.random.PRNGKey(0), _tx_factory)
    images, texts = _data()
    state, _ = runner.train_step(state, images, texts)

    params = runner.eval_params(state)
    model = CLIPModel(cfg=TINY, precision=Precision("float32", "float32"))
    out = model(params, images, texts)
    fi, ft = out["image_features"], out["text_features"]
    assert fi.shape == (8, TINY.embed_dim) and ft.shape == (8, TINY.embed_dim)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(fi, axis=-1)),
                               np.ones(8), rtol=1e-5)


def test_branch_vpp_prearranged_matches_joint(devices8):
    """Branch towers under interleaved vpp2 use the zero-copy vpp_arrange
    physical placement (round-4 adoption of the joint runner's layout) and
    still match the joint single-device step; to_logical_state restores the
    checkpoint/eval layer order exactly."""
    bp = BranchParallelCfg(
        vision=ParallelCfg(dp=2, pp=2, vpp=2, microbatches=2),
        text=ParallelCfg(dp=4))
    import dataclasses
    cfg = dataclasses.replace(
        TINY, vision=dataclasses.replace(TINY.vision, layers=4))
    runner = BranchParallelCLIP(cfg=cfg, bp=bp, compute_dtype=jnp.float32)
    assert runner._v_vpp == (2, 2) and runner._t_vpp is None
    state = runner.init_state(jax.random.PRNGKey(0), _tx_factory)

    # physical placement really happened, and to_logical inverts it
    ref_params = init_clip(jax.random.PRNGKey(0), cfg)
    from megatron_clip_tpu.parallel.pipeline import vpp_arrange
    want_phys = vpp_arrange(ref_params["visual"]["blocks"], 2, 2)
    for a, b in zip(jax.tree.leaves(state.vision[0]["blocks"]),
                    jax.tree.leaves(want_phys)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    logical = runner.to_logical_state(state)
    for a, b in zip(jax.tree.leaves(logical.vision[0]["blocks"]),
                    jax.tree.leaves(ref_params["visual"]["blocks"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # eval_params is logical too
    ev = runner.eval_params(state)
    for a, b in zip(jax.tree.leaves(ev["visual"]["blocks"]),
                    jax.tree.leaves(ref_params["visual"]["blocks"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training parity vs the joint step
    model = CLIPModel(cfg=cfg, precision=Precision("float32", "float32"))
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tx = _tx_factory(params)
    ref_state = TrainState.create(params, tx)
    ref_step = make_train_step(model, tx)
    images, texts = _data()
    for _ in range(2):
        state, m = runner.train_step(state, images, texts)
        ref_state, rm = ref_step(ref_state, images, texts)
        np.testing.assert_allclose(float(m["loss"]), float(rm["loss"]),
                                   rtol=2e-4, atol=2e-4)


def test_branch_vpp_prearranged_no_weight_permute(devices8):
    """The prearranged interleaved schedule moves NO weights across stages:
    its compiled HLO carries fewer collective ops than the logical-layout
    schedule of the same model (the VERDICT-r3 collective-count check)."""
    from megatron_clip_tpu.config import TransformerCfg
    from megatron_clip_tpu.nn.transformer import init_transformer
    from megatron_clip_tpu.parallel.mesh import build_mesh
    from megatron_clip_tpu.parallel.pipeline import (
        pipeline_transformer_interleaved, vpp_arrange)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from megatron_clip_tpu.parallel.mesh import STAGE

    cfg = TransformerCfg(layers=4, width=64, heads=2)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 64))
    mesh = build_mesh(ParallelCfg(dp=4, pp=2))
    stage_sh = NamedSharding(mesh, P(STAGE))  # layers split across stages

    def counts(fn, b):
        b = jax.tree.map(lambda l: jax.device_put(l, stage_sh), b)
        txt = jax.jit(fn).lower(b).compile().as_text()
        return sum(txt.count(op) for op in
                   ("collective-permute", "all-gather", "all-to-all"))

    n_log = counts(lambda b: pipeline_transformer_interleaved(
        b, x, cfg, mesh=mesh, num_microbatches=2, num_chunks=2), blocks)
    n_pre = counts(lambda b: pipeline_transformer_interleaved(
        b, x, cfg, mesh=mesh, num_microbatches=2, num_chunks=2,
        prearranged=True), vpp_arrange(blocks, 2, 2))
    assert n_pre < n_log, (n_pre, n_log)


def test_branch_local_loss_join_matches_global(devices8):
    """The local_loss join (per-shard logit rows + offset labels, shard_map —
    open_CLIP loss.py:95-121) must train bit-for-bit like the full-matrix
    join: same losses, same logit_scale, same tower params after steps."""
    bp = BranchParallelCfg(vision=ParallelCfg(dp=2, fsdp=2),
                           text=ParallelCfg(dp=4))
    images, texts = _data()
    results = []
    for ll in (True, False):
        runner = BranchParallelCLIP(cfg=TINY, bp=bp,
                                    compute_dtype=jnp.float32, local_loss=ll)
        state = runner.init_state(jax.random.PRNGKey(0), _tx_factory)
        losses = []
        for _ in range(2):
            state, m = runner.train_step(state, images, texts)
            losses.append(float(m["loss"]))
        results.append((losses, state))
    (l_loc, s_loc), (l_glob, s_glob) = results
    np.testing.assert_allclose(l_loc, l_glob, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(s_loc.head[0]["logit_scale"]),
                               float(s_glob.head[0]["logit_scale"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_loc.vision[0]),
                    jax.tree.leaves(s_glob.vision[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(s_loc.text[0]),
                    jax.tree.leaves(s_glob.text[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
