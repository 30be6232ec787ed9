#!/usr/bin/env python
"""Vision inpainting pretraining (reference: pretrain_vision_inpaint.py +
megatron/model/vision/inpainting.py): ViT reconstructs randomly masked
patches; MSE on masked regions."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("vision inpainting pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--head-width", type=int, default=64)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--mask-ratio", type=float, default=0.5)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-dir", type=str, default=None,
                   help="ImageFolder dir; synthetic if unset")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=1e-4, batch_size=16)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.inpaint import (
        init_inpaint, inpaint_loss, random_patch_mask)
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload)

    cfg = VisionCfg(layers=args.num_layers, width=args.hidden_size,
                    head_width=args.head_width, patch_size=args.patch_size,
                    image_size=args.image_size)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_inpaint(jax.random.PRNGKey(args.seed), cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"inpaint ViT {n/1e6:.1f}M params", flush=True)
    rc = runtime_cfg_from_args(args, "inpaint")
    if rc.pp > 1:
        raise SystemExit("inpainting does not support pipeline parallelism "
                         "yet; use tp/fsdp/dp")
    mesh, _ = build_workload_mesh(rc)
    specs = generic_param_specs(params)
    n_patches = (args.image_size // args.patch_size) ** 2

    def batches(seed=args.seed, start_step=0):
        if args.data_dir:
            # decode-free seek (image_folder skip_batches)
            from megatron_clip_tpu.data.image_folder import image_folder_batches
            for images, _ in image_folder_batches(
                    args.data_dir, args.batch_size, args.image_size,
                    is_train=True, epochs=10 ** 6, seed=seed,
                    skip_batches=start_step):
                yield jnp.asarray(images)
        else:
            # per-step keyed rng: resume seeks without replaying the stream
            step = start_step
            while True:
                step += 1
                rng = np.random.RandomState(
                    (seed * 2654435761 + step) % (2 ** 31))
                yield jnp.asarray(rng.rand(
                    args.batch_size, args.image_size, args.image_size, 3
                ).astype(np.float32))

    def masked_batches(seed=args.seed, start_step=0):
        # mask keys fold in the absolute step index, so the mask stream is
        # position-exact under resume too
        base_key = jax.random.PRNGKey(seed + 1)
        step = start_step
        for images in batches(seed, start_step=start_step):
            step += 1
            sub = jax.random.fold_in(base_key, step)
            mask = random_patch_mask(sub, images.shape[0], n_patches,
                                     args.mask_ratio)
            yield images, mask

    def loss_fn(p, batch, step_rng):
        images, mask = batch
        return inpaint_loss(p, images, mask, cfg, compute_dtype=compute)

    out = run_workload(params, loss_fn,
                       lambda start_step: masked_batches(
                           start_step=start_step), rc, mesh=mesh,
                       param_specs=specs,
                       val_iter_factory=(None if args.data_dir else
                                         lambda: masked_batches(
                                             args.seed + 7919)), args_ns=args)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
