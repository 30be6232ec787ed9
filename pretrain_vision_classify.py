#!/usr/bin/env python
"""Vision classification pretraining (reference: pretrain_vision_classify.py)
with selectable backbone: vit (default), swin, or mit (the reference's
swin_backbone/mit_backbone families)."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("ViT classification")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--classes-fraction", type=float, default=1.0,
                   help="train on the first fraction of classes "
                        "(megatron --classes-fraction)")
    p.add_argument("--data-per-class-fraction", type=float, default=1.0,
                   help="train on the first fraction of each class's images "
                        "(megatron --data-per-class-fraction)")
    p.add_argument("--backbone", choices=["vit", "swin", "mit"],
                   default="vit")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--val-data-dir", type=str, default=None,
                   help="held-out ImageFolder for --eval-interval val loss")
    p.add_argument("--data-dir", type=str, default=None,
                   help="ImageFolder-style dir; synthetic if unset")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=3e-4, batch_size=32)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vision_classify import (
        init_vit_classifier, classification_loss)
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload)

    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    if args.backbone == "swin":
        from megatron_clip_tpu.models.swin import SwinCfg, init_swin, apply_swin
        from megatron_clip_tpu.ops.cross_entropy import cross_entropy
        cfg = SwinCfg(image_size=args.img_size)
        params = init_swin(jax.random.PRNGKey(args.seed), cfg,
                           num_classes=args.num_classes)
        def _loss(p, images, labels):
            logits = apply_swin(p, images, cfg, compute_dtype=compute)
            return cross_entropy(logits[None], labels[None]).mean()
    elif args.backbone == "mit":
        from megatron_clip_tpu.models.mit import MiTCfg, init_mit, apply_mit
        from megatron_clip_tpu.ops.cross_entropy import cross_entropy
        cfg = MiTCfg(image_size=args.img_size)
        params = init_mit(jax.random.PRNGKey(args.seed), cfg,
                          num_classes=args.num_classes)
        def _loss(p, images, labels):
            logits = apply_mit(p, images, cfg, compute_dtype=compute)
            return cross_entropy(logits[None], labels[None]).mean()
    else:
        cfg = VisionCfg(layers=args.num_layers, width=args.hidden_size,
                        patch_size=args.patch_size, image_size=args.img_size)
        params = init_vit_classifier(jax.random.PRNGKey(args.seed), cfg,
                                     args.num_classes)
        _loss = None
    rc = runtime_cfg_from_args(args, "vit-classify")
    if rc.pp > 1 and args.backbone != "vit":
        raise SystemExit("pipeline parallelism requires the uniform vit "
                         "backbone (swin/mit have stage-varying widths); "
                         "use tp/fsdp/dp")
    mesh, layers_fn = build_workload_mesh(rc)
    from megatron_clip_tpu.parallel.mesh import STAGE
    specs = generic_param_specs(
        params, stage_axis=STAGE if rc.pp > 1 else None)
    def batches(seed=args.seed, data_dir=None, start_step=0):
        if data_dir or args.data_dir:
            # decode-free seek: skipped batches are never opened
            from megatron_clip_tpu.data.image_folder import image_folder_batches
            yield from image_folder_batches(
                data_dir or args.data_dir, args.batch_size, args.img_size,
                seed=seed, classes_fraction=args.classes_fraction,
                per_class_fraction=args.data_per_class_fraction,
                skip_batches=start_step)
        # per-step keyed rng: resume seeks without replaying the stream
        step = start_step
        while True:
            step += 1
            rng = np.random.RandomState(
                (seed * 2654435761 + step) % (2 ** 31))
            yield (jnp.asarray(rng.randn(args.batch_size, args.img_size,
                                         args.img_size, 3).astype(np.float32)),
                   jnp.asarray(rng.randint(0, args.num_classes,
                                           args.batch_size).astype(np.int32)))

    # validation source: --val-data-dir if given; synthetic held-out stream
    # when training synthetically; none otherwise (run_workload warns)
    val_factory = None
    if getattr(args, "val_data_dir", None):
        val_factory = lambda: batches(data_dir=args.val_data_dir)
    elif not args.data_dir:
        val_factory = lambda: batches(seed=args.seed + 7919)

    def loss_fn(p, batch, step_rng):
        images, labels = batch
        if _loss is not None:
            return _loss(p, images, labels)
        return classification_loss(p, images, labels, cfg,
                                   compute_dtype=compute,
                                   layers_fn=layers_fn)

    out = run_workload(params, loss_fn,
                       lambda start_step: batches(start_step=start_step),
                       rc, mesh=mesh,
                       param_specs=specs, val_iter_factory=val_factory, args_ns=args)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
