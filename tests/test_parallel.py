"""Parallelism correctness: the sharded (DP×FSDP×TP) train step must produce
the same numbers as the single-device step — the TPU analogue of the
reference's mpu tests comparing TP layers vs a single-GPU oracle
(megatron/mpu/tests/test_layers.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megatron_clip_tpu.config import CLIPCfg, VisionCfg, TextCfg, ParallelCfg
from megatron_clip_tpu.factory import CLIPModel
from megatron_clip_tpu.config import Precision
from megatron_clip_tpu.models.clip import init_clip
from megatron_clip_tpu.parallel import (
    build_mesh, clip_param_specs, shard_params, DATA, FSDP, TENSOR, STAGE,
    CONTEXT)
from megatron_clip_tpu.training import make_train_step, make_optimizer, cosine_lr
from megatron_clip_tpu.training.train_step import TrainState, shard_train_state

TINY = CLIPCfg(
    embed_dim=64,
    vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8, image_size=32),
    text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2, layers=2),
)


def _model():
    return CLIPModel(cfg=TINY, precision=Precision("float32", "float32"))


def _data(b=8):
    k = jax.random.PRNGKey(7)
    ki, kt = jax.random.split(k)
    images = jax.random.normal(ki, (b, 32, 32, 3))
    texts = jax.random.randint(kt, (b, 16), 1, 510).astype(jnp.int32)
    texts = texts.at[:, 12].set(511)
    return images, texts


def _run_steps(mesh, pcfg, n=3):
    model = _model()
    params = init_clip(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(params, cosine_lr(1e-3, 2, 100), grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    if mesh is not None:
        specs = clip_param_specs(params)
        state = shard_train_state(state, mesh, specs)
    step = make_train_step(model, tx, mesh=mesh)
    images, texts = _data()
    losses = []
    for _ in range(n):
        state, m = step(state, images, texts)
        losses.append(float(m["loss"]))
    return losses, state


def test_mesh_shapes(devices8):
    cfg = ParallelCfg(dp=2, fsdp=2, tp=2, pp=1)
    mesh = build_mesh(cfg)
    assert mesh.shape == {DATA: 2, FSDP: 2, STAGE: 1, CONTEXT: 1, TENSOR: 2}


def test_param_specs_cover_tree():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    specs = clip_param_specs(params)
    assert jax.tree.structure(specs) == jax.tree.structure(
        params, is_leaf=lambda x: hasattr(x, "shape"))
    # spot-check the column/row rules on stacked block leaves
    v = specs["visual"]["blocks"]
    assert v["attn"]["wqkv"] == P(None, FSDP, TENSOR)
    assert v["attn"]["wo"] == P(None, TENSOR, FSDP)
    assert v["mlp"]["w1"] == P(None, FSDP, TENSOR)
    assert v["mlp"]["w2"] == P(None, TENSOR, FSDP)
    assert specs["text"]["tok_embed"] == P(TENSOR, FSDP)


@pytest.mark.parametrize("layout", [
    dict(dp=8, fsdp=1, tp=1),
    dict(dp=2, fsdp=2, tp=2),
    dict(dp=1, fsdp=1, tp=8),   # heads=2 < tp=8: XLA still partitions correctly
    dict(dp=1, fsdp=8, tp=1),   # pure ZeRO/FSDP
])
def test_sharded_step_matches_single_device(devices8, layout):
    ref_losses, _ = _run_steps(None, None)
    mesh = build_mesh(ParallelCfg(**layout))
    got_losses, state = _run_steps(mesh, layout)
    np.testing.assert_allclose(got_losses, ref_losses, rtol=2e-4, atol=2e-5)
    # params stay finite and sharded
    ls = float(state.params["logit_scale"])
    assert np.isfinite(ls)


def test_optimizer_state_is_sharded(devices8):
    mesh = build_mesh(ParallelCfg(dp=1, fsdp=8, tp=1))
    params = init_clip(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(params, cosine_lr(1e-3, 2, 100))
    state = TrainState.create(params, tx)
    specs = clip_param_specs(params)
    state = shard_train_state(state, mesh, specs)
    # find a moment leaf for a big matrix and confirm it is not fully replicated
    leaves = [x for x in jax.tree.leaves(state.opt_state)
              if hasattr(x, "sharding") and x.ndim >= 2]
    assert any(not l.sharding.is_fully_replicated for l in leaves)


def test_sequence_parallel_matches(devices8):
    """--sequence-parallel activation sharding must not change numerics
    (Korthikanti SP, SURVEY §2.1)."""
    import dataclasses
    from megatron_clip_tpu.factory import CLIPModel
    mesh = build_mesh(ParallelCfg(dp=2, tp=4))
    model = CLIPModel(cfg=TINY, precision=Precision("float32", "float32"))
    model_sp = dataclasses.replace(model, sequence_parallel=True)
    params = init_clip(jax.random.PRNGKey(0), TINY)
    sparams = shard_params(params, mesh)
    images, texts = _data()
    want = model(params, images, texts)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda p, i, t: model_sp(p, i, t))(sparams, images, texts)
    np.testing.assert_allclose(np.asarray(got["image_features"]),
                               np.asarray(want["image_features"]),
                               rtol=2e-4, atol=2e-5)


def test_accum_freq_matches_full_batch():
    """Feature-cached gradient accumulation (open_CLIP --accum-freq) must
    produce the EXACT full-global-batch gradient — losses and updated params
    equal between microbatches=2 and microbatches=1."""
    from megatron_clip_tpu.training import make_train_step
    model = _model()
    params = init_clip(jax.random.PRNGKey(0), TINY)
    images, texts = _data(b=8)

    results = {}
    for m in (1, 2, 4):
        p = jax.tree.map(jnp.copy, params)  # step donates its input state
        tx = make_optimizer(p, cosine_lr(1e-3, 2, 100))
        state = TrainState.create(p, tx)
        step = make_train_step(model, tx, microbatches=m)
        state, metrics = step(state, images, texts)
        results[m] = (float(metrics["loss"]), state.params)

    np.testing.assert_allclose(results[2][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[4][0], results[1][0], rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(results[1][1]),
                     jax.tree.leaves(results[2][1])):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)
