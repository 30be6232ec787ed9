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
