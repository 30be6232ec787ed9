#!/usr/bin/env python
"""DINO self-supervised ViT pretraining (reference: pretrain_vision_dino.py,
megatron/model/vision/dino.py): student/teacher EMA with centered+sharpened
cross-view loss."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parse_args(argv=None):
    p = argparse.ArgumentParser("DINO pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--out-dim", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vision_classify import (
        DinoCfg, init_dino, dino_loss, dino_update_teacher)
    from megatron_clip_tpu.training.optim import make_optimizer, cosine_lr

    vcfg = VisionCfg(layers=args.num_layers, width=args.hidden_size,
                     patch_size=args.patch_size, image_size=args.img_size)
    dcfg = DinoCfg(out_dim=args.out_dim)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    state = init_dino(jax.random.PRNGKey(args.seed), vcfg, dcfg)
    student = state["student"]
    tx = make_optimizer(student, cosine_lr(args.lr, args.warmup,
                                           args.train_steps),
                        weight_decay=0.04, grad_clip_norm=3.0)
    opt_state = tx.init(student)
    rng = np.random.RandomState(args.seed)

    @jax.jit
    def step(student, opt_state, state, v1, v2):
        (loss, new_center), grads = jax.value_and_grad(
            lambda s: dino_loss(s, state, v1, v2, vcfg, dcfg,
                                compute_dtype=compute), has_aux=True)(student)
        updates, opt_state = tx.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        state = dict(state, center=new_center)
        state = dino_update_teacher(state, student, dcfg)
        return student, opt_state, state, loss

    t0 = time.perf_counter()
    loss = None
    for i in range(1, args.train_steps + 1):
        base = rng.randn(args.batch_size, args.img_size, args.img_size, 3)
        v1 = jnp.asarray((base + 0.1 * rng.randn(*base.shape)).astype(np.float32))
        v2 = jnp.asarray((base + 0.1 * rng.randn(*base.shape)).astype(np.float32))
        student, opt_state, state, loss = step(student, opt_state, state, v1, v2)
        if i % args.log_interval == 0 or i == args.train_steps:
            print(f"[dino] step {i}/{args.train_steps} | loss {float(loss):.4f} | "
                  f"{args.log_interval / (time.perf_counter() - t0):.2f} it/s",
                  flush=True)
            t0 = time.perf_counter()
    return {"loss": float(loss)}


if __name__ == "__main__":
    run(parse_args())
