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
    # the megatron --dino-* hyperparameter family (arguments.py vision group)
    p.add_argument("--dino-teacher-temp", type=float, default=0.04,
                   help="final teacher temperature (megatron default 0.07)")
    p.add_argument("--dino-warmup-teacher-temp", type=float, default=None,
                   help="starting teacher temperature; enables the linear "
                        "warmup (megatron --dino-warmup-teacher-temp)")
    p.add_argument("--dino-warmup-teacher-temp-iters", type=int, default=0,
                   help="warmup length in steps (megatron's "
                        "--dino-warmup-teacher-temp-epochs, in iterations)")
    p.add_argument("--dino-ema-momentum", type=float, default=0.996,
                   help="teacher EMA base momentum (dino.py momentum_teacher)")
    p.add_argument("--dino-momentum-cosine", action="store_true",
                   help="cosine-anneal the EMA momentum base->1.0 over the "
                        "run (dino.py momentum_schedule)")
    p.add_argument("--dino-head-hidden-size", type=int, default=2048)
    p.add_argument("--dino-bottleneck-size", type=int, default=256)
    p.add_argument("--dino-norm-last-layer", action="store_true",
                   help="freeze the prototype layer's weight-norm gain at 1 "
                        "(dino.py norm_last_layer)")
    p.add_argument("--dino-local-crops-number", type=int, default=0,
                   help="student-only local crops per image (multi-crop, "
                        "dino.py MultiCropWrapper); 0 = globals only")
    p.add_argument("--dino-local-img-size", type=int, default=96,
                   help="local crop side; here a random CROP of the global "
                        "view (no rescale) with interpolated pos-embeds")
    p.add_argument("--dino-freeze-last-layer", type=int, default=0,
                   help="gate gradients off the prototype layer for this "
                        "many steps (megatron --dino-freeze-last-layer, "
                        "in epochs there)")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-dir", type=str, default=None,
                   help="ImageFolder dir; synthetic if unset")
    # weighted-kNN monitor (megatron knn_monitor.py + the eval branch of
    # pretrain_vision_dino.py loss_func): teacher-feature bank over the
    # train ImageFolder, knn_acc_{10,20,100,200} on a val ImageFolder
    p.add_argument("--knn-eval-dir", type=str, default=None,
                   help="val ImageFolder for the kNN monitor (runs every "
                        "--eval-interval steps; needs --data-dir for the "
                        "feature bank)")
    p.add_argument("--knn-bank-size", type=int, default=0,
                   help="cap the feature bank (0 = embed the full train "
                        "folder like the reference)")
    p.add_argument("--knn-t", type=float, default=0.07,
                   help="kNN softmax temperature (knn_monitor.py uses 0.07)")
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
    dcfg = DinoCfg(out_dim=args.out_dim,
                   teacher_temp=args.dino_teacher_temp,
                   ema_momentum=args.dino_ema_momentum,
                   head_hidden=args.dino_head_hidden_size,
                   bottleneck=args.dino_bottleneck_size,
                   norm_last_layer=args.dino_norm_last_layer)
    n_local, local_size = args.dino_local_crops_number, \
        args.dino_local_img_size
    local_vcfg = None
    if n_local:
        import dataclasses
        if local_size % args.patch_size or local_size >= args.img_size:
            raise SystemExit("--dino-local-img-size must be a multiple of "
                             "--patch-size and smaller than --img-size")
        local_vcfg = dataclasses.replace(vcfg, image_size=local_size)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    state = init_dino(jax.random.PRNGKey(args.seed), vcfg, dcfg)
    student = state["student"]
    aux = {k: v for k, v in state.items() if k != "student"}
    # step counter rides the aux state: the temp/momentum schedules are
    # functions of training progress and must survive checkpoint/resume
    aux["step"] = jnp.zeros((), jnp.int32)

    rc = runtime_cfg_from_args(args, "dino")
    rc.grad_clip_norm = 3.0
    if rc.pp > 1:
        raise SystemExit("DINO does not support pipeline parallelism (the "
                         "teacher forward runs alongside the student); use "
                         "tp/fsdp/dp")
    mesh, _ = build_workload_mesh(rc)
    specs = generic_param_specs(student)

    def batches(start_step=0):
        # per-step keyed rng (views/crops included): resume seeks O(1)
        # without replaying the augmentation stream
        if args.data_dir:
            from megatron_clip_tpu.data.image_folder import \
                image_folder_batches
            src = (im for im, _ in image_folder_batches(
                args.data_dir, args.batch_size, args.img_size,
                is_train=True, epochs=10 ** 6, seed=args.seed,
                skip_batches=start_step))
        else:
            src = None
        step = start_step
        while True:
            step += 1
            rng = np.random.RandomState(
                (args.seed * 2654435761 + step) % (2 ** 31))
            if src is not None:
                base = np.asarray(next(src))
            else:
                base = rng.randn(args.batch_size, args.img_size,
                                 args.img_size, 3).astype(np.float32)
            out = {"v1": (base + 0.1 * rng.randn(*base.shape)
                          ).astype(np.float32),
                   "v2": (base + 0.1 * rng.randn(*base.shape)
                          ).astype(np.float32)}
            if n_local:
                # local views = random crops of the global view (student
                # only; multi-crop MultiCropWrapper semantics)
                b = base.shape[0]
                crops = np.empty((n_local * b, local_size, local_size, 3),
                                 np.float32)
                lim = args.img_size - local_size
                for li in range(n_local):
                    for bi in range(b):
                        y0, x0 = rng.randint(0, lim + 1, 2)
                        crops[li * b + bi] = base[bi, y0:y0 + local_size,
                                                  x0:x0 + local_size]
                out["locals"] = crops
            yield out

    warm_t, warm_n = args.dino_warmup_teacher_temp, \
        args.dino_warmup_teacher_temp_iters

    def loss_fn(p, batch, step_rng, aux):
        tt = None
        if warm_t is not None and warm_n > 0:
            # linear warmup_temp -> final_temp (dino.py
            # teacher_temp_schedule via np.linspace)
            frac = jnp.clip(aux["step"].astype(jnp.float32) / warm_n,
                            0.0, 1.0)
            tt = warm_t + (dcfg.teacher_temp - warm_t) * frac
        freeze = None
        if args.dino_freeze_last_layer > 0:
            freeze = (aux["step"] < args.dino_freeze_last_layer
                      ).astype(jnp.float32)
        loss, new_center = dino_loss(p, aux, batch["v1"], batch["v2"],
                                     vcfg, dcfg, compute_dtype=compute,
                                     teacher_temp=tt,
                                     local_views=batch.get("locals"),
                                     local_vcfg=local_vcfg,
                                     freeze_last=freeze)
        return loss, new_center

    def aux_update(aux, params, new_center):
        m = None
        if args.dino_momentum_cosine:
            # cosine base->1.0 over the run (dino.py momentum_schedule)
            frac = jnp.clip(aux["step"].astype(jnp.float32)
                            / max(rc.train_steps, 1), 0.0, 1.0)
            m = 1.0 - (1.0 - dcfg.ema_momentum) * \
                0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        aux = dict(aux, center=new_center, step=aux["step"] + 1)
        return dino_update_teacher(aux, params, dcfg, momentum=m)

    custom_eval = None
    if args.knn_eval_dir:
        if not args.data_dir:
            raise SystemExit("--knn-eval-dir needs --data-dir (the train "
                             "ImageFolder provides the feature bank)")
        from megatron_clip_tpu.data.image_folder import (
            image_folder_batches, scan_image_folder)
        from megatron_clip_tpu.evaluation.knn import (
            compute_feature_bank, knn_eval)
        from megatron_clip_tpu.models.vit import apply_vit
        _, classes = scan_image_folder(args.data_dir)

        @jax.jit
        def teacher_feats(teacher, images):
            return apply_vit(teacher["backbone"], images, vcfg, vcfg.width,
                             compute_dtype=compute)

        def custom_eval(params, aux, step):
            enc = lambda im: teacher_feats(aux["teacher"], im)
            bank, bank_lbl = compute_feature_bank(
                enc, image_folder_batches(
                    args.data_dir, args.batch_size, args.img_size,
                    is_train=False, epochs=1, seed=args.seed),
                max_samples=args.knn_bank_size)
            return knn_eval(enc, bank, bank_lbl, len(classes),
                            image_folder_batches(
                                args.knn_eval_dir, args.batch_size,
                                args.img_size, is_train=False, epochs=1,
                                seed=args.seed),
                            knn_t=args.knn_t)

    out = run_workload(student, loss_fn, batches, rc, mesh=mesh,
                       param_specs=specs, aux_state=aux,
                       aux_update=aux_update, custom_eval=custom_eval,
                       args_ns=args)
    result = {"loss": out["loss"], "history": out["history"]}
    if custom_eval is not None:
        # skip the final re-run when the loop's periodic eval already fired
        # on the last step (same teacher state — it would duplicate the
        # full bank-embedding pass)
        ran_at_end = (out.get("last_custom_eval") is not None
                      and out.get("last_custom_eval_step")
                      == out.get("last_step"))
        result["knn"] = out["last_custom_eval"] if ran_at_end else \
            custom_eval(out["params"], out["aux"], -1)
    return result


if __name__ == "__main__":
    run(parse_args())
