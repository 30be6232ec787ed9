"""Multi-slice (DCN) data parallelism: `ParallelCfg.dcn_dp` carves the data
axis into slice-major blocks (mesh.py build_mesh) so only the gradient
all-reduce crosses the data-center network — the reference's inter-node DP
over IB (megatron initialize.py NCCL world), TPU-native via hybrid meshes."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.config import (CLIPCfg, ParallelCfg, Precision,
                                      TextCfg, VisionCfg)
from megatron_clip_tpu.parallel import build_mesh


def _tiny_cfg():
    return CLIPCfg(
        embed_dim=64,
        vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                         image_size=32),
        text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2,
                     layers=2))


def test_dcn_mesh_shape_and_device_count(devices8):
    mesh = build_mesh(ParallelCfg(dp=2, tp=2, dcn_dp=2))
    assert mesh.shape["data"] == 4       # dcn_dp * dp merged, slice-major
    assert mesh.shape["tensor"] == 2
    assert len(mesh.devices.reshape(-1)) == 8
    # slice-major: the first data block holds the first dp*tp devices
    devs = np.asarray(mesh.devices)      # [data, fsdp, stage, ctx, tensor]
    first_block = {d.id for d in devs[:2].reshape(-1)}
    assert first_block == {d.id for d in jax.devices()[:4]}


def test_dcn_dp_train_step_matches_flat_dp(devices8):
    """A dcn_dp=2 x dp=2 CLIP step must be numerically identical to the
    flat dp=4 step (the split only relabels the data axis layout)."""
    from megatron_clip_tpu.factory import CLIPModel
    from megatron_clip_tpu.models.clip import init_clip
    from megatron_clip_tpu.parallel import clip_param_specs
    from megatron_clip_tpu.training import (cosine_lr, make_optimizer,
                                            make_train_step)
    from megatron_clip_tpu.training.train_step import (TrainState,
                                                       shard_train_state)

    cfg = _tiny_cfg()
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3),
                               jnp.float32)
    texts = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 1,
                               510).astype(jnp.int32)

    def one_step(pcfg):
        mesh = build_mesh(pcfg)
        model = CLIPModel(cfg=cfg, precision=Precision("float32", "float32"))
        params = init_clip(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(params, cosine_lr(1e-3, 2, 10))
        state = shard_train_state(TrainState.create(params, tx), mesh,
                                  clip_param_specs(params))
        step = make_train_step(model, tx, mesh=mesh)
        _, metrics = step(state, images, texts)
        return float(metrics["loss"]), float(metrics["grad_norm"])

    flat = one_step(ParallelCfg(dp=4, tp=2))
    dcn = one_step(ParallelCfg(dp=2, tp=2, dcn_dp=2))
    np.testing.assert_allclose(dcn, flat, rtol=1e-6)


def test_workload_runtime_accepts_dcn_flag(devices8):
    import argparse

    from megatron_clip_tpu.training.workload import (add_runtime_args,
                                                     build_workload_mesh,
                                                     runtime_cfg_from_args)
    p = argparse.ArgumentParser()
    add_runtime_args(p)
    args = p.parse_args(
        ["--train-steps", "1", "--batch-size", "8",
         "--dcn-data-parallel-size", "2",
         "--tensor-model-parallel-size", "2"])
    rc = runtime_cfg_from_args(args, "t")
    assert rc.dcn_dp == 2
    mesh, layers_fn = build_workload_mesh(rc)
    assert mesh.shape["data"] == 4 and mesh.shape["tensor"] == 2
    assert layers_fn is None
