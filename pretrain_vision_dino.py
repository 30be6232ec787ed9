#!/usr/bin/env python
"""DINO self-supervised ViT pretraining (reference: pretrain_vision_dino.py,
megatron/model/vision/dino.py): student/teacher EMA with centered+sharpened
cross-view loss. Runs on the shared mesh runtime (training/workload.py) with
the teacher/center as auxiliary (non-gradient) state — sharded, checkpointed
and resumed alongside the student."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("DINO pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--out-dim", type=int, default=4096)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-dir", type=str, default=None,
                   help="ImageFolder dir; synthetic if unset")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=5e-4, weight_decay=0.04, batch_size=32)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vision_classify import (
        DinoCfg, init_dino, dino_loss, dino_update_teacher)
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload)

    vcfg = VisionCfg(layers=args.num_layers, width=args.hidden_size,
                     patch_size=args.patch_size, image_size=args.img_size)
    dcfg = DinoCfg(out_dim=args.out_dim)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    state = init_dino(jax.random.PRNGKey(args.seed), vcfg, dcfg)
    student = state["student"]
    aux = {k: v for k, v in state.items() if k != "student"}

    rc = runtime_cfg_from_args(args, "dino")
    rc.grad_clip_norm = 3.0
    if rc.pp > 1:
        raise SystemExit("DINO does not support pipeline parallelism (the "
                         "teacher forward runs alongside the student); use "
                         "tp/fsdp/dp")
    mesh, _ = build_workload_mesh(rc)
    specs = generic_param_specs(student)

    rng = np.random.RandomState(args.seed)

    def batches():
        if args.data_dir:
            from megatron_clip_tpu.data.image_folder import \
                image_folder_batches
            src = (im for im, _ in image_folder_batches(
                args.data_dir, args.batch_size, args.img_size,
                is_train=True, epochs=10 ** 6, seed=args.seed))
        else:
            def synth():
                while True:
                    yield rng.randn(args.batch_size, args.img_size,
                                    args.img_size, 3).astype(np.float32)
            src = synth()
        for base in src:
            base = np.asarray(base)
            yield {"v1": (base + 0.1 * rng.randn(*base.shape)
                          ).astype(np.float32),
                   "v2": (base + 0.1 * rng.randn(*base.shape)
                          ).astype(np.float32)}

    def loss_fn(p, batch, step_rng, aux):
        loss, new_center = dino_loss(p, aux, batch["v1"], batch["v2"],
                                     vcfg, dcfg, compute_dtype=compute)
        return loss, new_center

    def aux_update(aux, params, new_center):
        aux = dict(aux, center=new_center)
        return dino_update_teacher(aux, params, dcfg)

    out = run_workload(student, loss_fn, batches(), rc, mesh=mesh,
                       param_specs=specs, aux_state=aux,
                       aux_update=aux_update, args_ns=args)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
