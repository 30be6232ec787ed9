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
    p.add_argument("--backbone", choices=["vit", "swin", "mit"],
                   default="vit")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-dir", type=str, default=None,
                   help="ImageFolder-style dir; synthetic if unset")
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vision_classify import (
        init_vit_classifier, classification_loss)
    from megatron_clip_tpu.training.simple_loop import simple_train

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
    rng = np.random.RandomState(args.seed)

    def batches():
        if args.data_dir:
            from megatron_clip_tpu.data.image_folder import image_folder_batches
            yield from image_folder_batches(args.data_dir, args.batch_size,
                                            args.img_size, seed=args.seed)
        while True:
            yield (jnp.asarray(rng.randn(args.batch_size, args.img_size,
                                         args.img_size, 3).astype(np.float32)),
                   jnp.asarray(rng.randint(0, args.num_classes,
                                           args.batch_size).astype(np.int32)))

    def loss_fn(p, batch):
        images, labels = batch
        if _loss is not None:
            return _loss(p, images, labels)
        return classification_loss(p, images, labels, cfg,
                                   compute_dtype=compute)

    out = simple_train(params, loss_fn, batches(), args.train_steps,
                       lr=args.lr, warmup=args.warmup,
                       log_interval=args.log_interval, name="vit-classify")
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
