"""The training orchestration — `pretrain()` for the TPU stack.

Plays the role of megatron's pretrain()/train() (megatron/training.py:60-860:
init → model+optimizer → data iterators → step loop with logging/eval/save)
and open_CLIP's main()/train_one_epoch (training/main.py:73-524,
train.py:338-525), reduced to what TPU actually needs: no DDP wrapping, no
loss scaling, no rank guards.
"""
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu import factory
from megatron_clip_tpu.config import ParallelCfg, BranchParallelCfg
from megatron_clip_tpu.checkpoints import (
    save_checkpoint, load_checkpoint, latest_checkpoint_step)
from megatron_clip_tpu.data.loaders import get_data
from megatron_clip_tpu.parallel import build_mesh, clip_param_specs
from megatron_clip_tpu.training.optim import (
    make_optimizer, cosine_lr, const_lr, const_lr_cooldown)
from megatron_clip_tpu.training.train_step import (
    make_train_step, TrainState, shard_train_state)


def _log(msg: str):
    print(msg, flush=True)


def _make_schedule(args, total_steps: int):
    if getattr(args, "skip_scheduler", False):
        # open_CLIP --skip-scheduler: raw constant lr, no warmup/decay
        return lambda step: args.lr
    if args.lr_scheduler == "cosine":
        return cosine_lr(args.lr, args.warmup, total_steps)
    if args.lr_scheduler == "const":
        return const_lr(args.lr, args.warmup)
    cooldown = (args.epochs_cooldown or 1) * max(total_steps // max(args.epochs, 1), 1)
    return const_lr_cooldown(args.lr, args.warmup, total_steps, cooldown,
                             args.lr_cooldown_power, args.lr_cooldown_end)


def _load_pretrained_init(args, model, params):
    """open_CLIP main.py: --pretrained initializes the trained model from a
    released checkpoint (finetune workflow); --pretrained-image grafts only
    the vision tower (timm pretrained-image analogue / LiT-style init)
    leaving the text tower at random init."""
    pre = getattr(args, "pretrained", "")
    pre_img = getattr(args, "pretrained_image", "")
    if not (pre or pre_img):
        return params
    from megatron_clip_tpu.checkpoints.torch_interop import \
        load_openclip_checkpoint
    from megatron_clip_tpu.pretrained import resolve_pretrained
    name = args.model.replace("/", "-")
    if pre:
        params = load_openclip_checkpoint(
            resolve_pretrained(name, pre), model.cfg, params)
        _log(f"initialized from pretrained {pre!r}")
    if pre_img:
        full = load_openclip_checkpoint(
            resolve_pretrained(name, pre_img), model.cfg, params)
        params = dict(params, visual=full["visual"])
        _log(f"vision tower initialized from {pre_img!r}")
    return params


def _model_overrides(args) -> dict:
    ov = {}
    vision = {}
    if args.v_num_layers:
        vision["layers"] = args.v_num_layers
    if args.v_hidden_size:
        vision["width"] = args.v_hidden_size
    if args.v_patch_size:
        vision["patch_size"] = args.v_patch_size
    if args.v_image_size:
        vision["image_size"] = args.v_image_size
    fis = getattr(args, "force_image_size", None)
    if fis:
        # open_CLIP --force-image-size (factory.py force_image_size →
        # model.py resize_pos_embed); square towers: take the first dim
        vision["image_size"] = int(fis[0] if isinstance(fis, (list, tuple))
                                   else fis)
    if getattr(args, "force_patch_dropout", None) is not None:
        # open_CLIP --force-patch-dropout: override the config's rate
        vision["patch_dropout"] = args.force_patch_dropout
    if vision:
        base = factory.get_model_config(args.model.replace("/", "-"))
        base_v = dict(base["vision_cfg"]) if base else {}
        base_v.update(vision)
        ov["vision_cfg"] = base_v
    return ov


def _call_tx_factory(factory, params, **kw):
    """Call an optimizer factory, forwarding only the keyword hints
    (tower=/vpp_layout=) its signature accepts — user-supplied factories
    are often plain single-arg lambdas."""
    import inspect
    try:
        sig = inspect.signature(factory)
        has_var_kw = any(q.kind == inspect.Parameter.VAR_KEYWORD
                         for q in sig.parameters.values())
        if not has_var_kw:
            kw = {k: v for k, v in kw.items() if k in sig.parameters}
    except (TypeError, ValueError):
        kw = {}
    return factory(params, **kw)


def _prune_older_checkpoints(root: str, keep_step: int) -> None:
    """open_CLIP --delete-previous-checkpoint: only the newest survives."""
    import glob
    import shutil
    for d in glob.glob(os.path.join(root, "iter_*")):
        try:
            s = int(os.path.basename(d)[5:])
        except ValueError:
            continue
        if s != keep_step:
            shutil.rmtree(d, ignore_errors=True)


def run_training(args) -> dict:
    # SIGTERM latch around the whole run: the shared context manager
    # restores the previous handler on every exit path, exceptions
    # included (a leaked handler makes the host process unkillable)
    from megatron_clip_tpu.training.signals import sigterm_latch
    with sigterm_latch() as term:
        return _run_training(args, term)


def _run_training(args, term) -> dict:
    devices = jax.devices()
    tp, pp = args.tensor_model_parallel_size, args.pipeline_model_parallel_size
    fsdp = args.fsdp_parallel_size
    extra = args.extra_world_size
    dcn = getattr(args, "dcn_data_parallel_size", 1)
    main_world = len(devices) - extra
    dp = max(1, main_world // (tp * pp * fsdp * dcn))

    model, params = factory.create_model(
        args.model, precision=args.precision, seed=args.seed,
        force_quick_gelu=args.force_quick_gelu, **_model_overrides(args))
    params = _load_pretrained_init(args, model, params)
    model = dataclasses.replace(model, remat=args.recompute_granularity,
                                sequence_parallel=args.sequence_parallel)
    if model.is_coca:
        # the captioning head trains in the joint contrastive step
        # (--accum-freq composes since round 4: contrastive via the
        # feature cache, caption CE per-block / M; the pipeline composes
        # since round 5: towers + decoder stage-shard, _JointRunner);
        # the branch split and distill remain contrastive-tower-only
        for flag, bad in [("extra_world_size", extra > 0),
                          ("distill_model",
                           bool(getattr(args, "distill_model", None)))]:
            if bad:
                raise SystemExit(f"CoCa training does not support --{flag}"
                                 .replace("_", "-"))
        if pp > 1 and model.cfg.hf_text is not None:
            raise SystemExit("CoCa with an HF text tower does not support "
                             "--pipeline-model-parallel-size > 1 (post-LN "
                             "stack outside the stacked-pytree format)")
    n_params = sum(x.size for x in jax.tree.leaves(params))
    _log(f"model {args.model}: {n_params/1e6:.1f}M params | devices="
         f"{len(devices)} dp={dp} fsdp={fsdp} tp={tp} pp={pp} extra={extra}")

    try:
        from megatron_clip_tpu.tokenizer import get_tokenizer
        tokenizer = get_tokenizer(args.model)
    except FileNotFoundError:
        tokenizer = None
        if args.dataset_type != "synthetic":
            raise
    from megatron_clip_tpu.data.transforms import image_transform
    mean = getattr(args, "image_mean", None)
    std = getattr(args, "image_std", None)
    pp_train = image_transform(model.image_size, is_train=True,
                               mean=mean, std=std,
                               aug_cfg=getattr(args, "aug_cfg", None))
    pp_val = image_transform(model.image_size, is_train=False,
                             mean=mean, std=std)
    data = get_data(args, pp_train, pp_val, tokenizer,
                    context_length=model.context_length,
                    image_size=model.image_size)
    steps_per_epoch = args.steps_per_epoch or data["train"].num_batches
    total_steps = steps_per_epoch * args.epochs

    schedule = _make_schedule(args, total_steps)
    lock_image = getattr(args, "lock_image", False)
    lock_text = getattr(args, "lock_text", False)

    def tx_factory(p, tower=None, vpp_layout=None):
        """Optimizer for a param tree `p`.

        tower: "visual"/"text" when `p` is a single tower subtree (the
        branch-parallel runner optimizes each tower separately — without
        the tower name the LiT lock mask can't tell which tower it is
        masking and --lock-* silently no-ops).
        vpp_layout: (pp, vpp) when the stacked blocks in `p` are in
        vpp_arrange PHYSICAL order — the per-layer lock-group vector is
        computed in logical layer order and must be permuted the same way,
        else --lock-*-unlocked-layers freezes the wrong layers.
        """
        lock_mask = None
        if lock_image or lock_text:
            from megatron_clip_tpu.training.optim import tower_lock_mask
            tree = {tower: p} if tower is not None else p
            lock_mask = tower_lock_mask(
                tree, lock_image=lock_image,
                image_unlocked_groups=getattr(
                    args, "lock_image_unlocked_groups", 0),
                lock_text=lock_text,
                text_unlocked_layers=getattr(
                    args, "lock_text_unlocked_layers", 0),
                vpp_layout=vpp_layout)
            if tower is not None:
                lock_mask = lock_mask[tower]
        return make_optimizer(
            p, schedule, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
            weight_decay=args.wd, grad_clip_norm=args.grad_clip_norm,
            lock_mask=lock_mask)

    loss_obj = factory.create_loss(args, model=model)

    # distillation teacher (open_CLIP main.py dist_model; runs under
    # stop_gradient inside the student's jitted step)
    teacher = None
    if getattr(args, "distill_model", None):
        tmodel, tparams = factory.create_model(
            args.distill_model, precision=args.precision, seed=args.seed + 1)
        dist_pre = getattr(args, "distill_pretrained", None)
        if dist_pre:
            from megatron_clip_tpu.checkpoints.torch_interop import \
                load_openclip_checkpoint
            from megatron_clip_tpu.pretrained import resolve_pretrained
            path = resolve_pretrained(
                args.distill_model.replace("/", "-"), dist_pre)
            tparams = load_openclip_checkpoint(path, tmodel.cfg, tparams)
        tn = sum(x.size for x in jax.tree.leaves(tparams))
        _log(f"distill teacher {args.distill_model}: {tn/1e6:.1f}M params")
        teacher = (tmodel, tparams)

    if extra > 0:
        if teacher is not None:
            raise ValueError("--distill-model is not supported with "
                             "branch-parallel training (--extra-world-size "
                             "> 0); the teacher forward lives in the joint "
                             "step")
        if dcn > 1:
            raise ValueError("--dcn-data-parallel-size is not supported "
                             "with branch-parallel training (the two "
                             "sub-meshes are carved within one slice); "
                             "drop --extra-world-size or the dcn flag")
        runner = _BranchRunner(args, model, tx_factory, devices)
    else:
        runner = _JointRunner(args, model, params, tx_factory,
                              ParallelCfg(dp=dp, fsdp=fsdp, tp=tp, pp=pp,
                                          vpp=args.virtual_pipeline_parallel_size,
                                          dcn_dp=dcn,
                                          microbatches=args.num_microbatches),
                              loss_obj, teacher=teacher)

    start_step, consumed = 0, 0
    if args.resume:
        # open_CLIP --resume semantics (main.py:108-170): "latest" finds the
        # newest checkpoint under the run dir; anything else is an explicit
        # checkpoint root to load from (and loading from it does not require
        # --save).
        if args.resume != "latest":
            root = os.path.expanduser(args.resume)
            if latest_checkpoint_step(root) is None:
                raise FileNotFoundError(
                    f"--resume {args.resume}: no checkpoint tracker found "
                    f"under that directory")
            state, meta, start_step = runner.load(root)
            consumed = meta.get("consumed_samples", 0)
            _log(f"resumed from {root} @ step {start_step} "
                 f"(consumed_samples={consumed})")
        elif args.save:
            root = os.path.join(args.save, args.name or "default")
            if latest_checkpoint_step(root) is not None:
                state, meta, start_step = runner.load(root)
                consumed = meta.get("consumed_samples", 0)
                _log(f"resumed from {root} @ step {start_step} "
                     f"(consumed_samples={consumed})")
        else:
            _log("WARNING: --resume latest needs --save to locate the run "
                 "dir; starting from scratch")

    save_root = os.path.join(args.save, args.name or "default") if args.save else None
    if getattr(args, "copy_codebase", False) and save_root:
        # open_CLIP --copy-codebase (main.py copy_codebase): snapshot the
        # code into the experiment dir for reproducibility
        import shutil
        code_dir = os.path.join(save_root, "code")
        if not os.path.exists(code_dir):
            src = os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
            base_ignore = shutil.ignore_patterns(
                ".git", "__pycache__", "*.pyc", "logs", "wandb")
            save_abs = os.path.abspath(args.save)

            def _ignore(path, names):
                ignored = set(base_ignore(path, names))
                for n in names:
                    # never recurse into the experiment root itself —
                    # matched by PATH, not basename (a basename pattern
                    # would both skip unrelated same-named dirs and copy
                    # sibling runs' checkpoints when --save is nested)
                    if os.path.abspath(os.path.join(path, n)) == save_abs:
                        ignored.add(n)
                return ignored

            shutil.copytree(src, code_dir, ignore=_ignore)
            _log(f"copied codebase to {code_dir}")
    writer = None
    if "tensorboard" in (args.report_to or "") and save_root:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join(save_root, "tensorboard"))
        except ImportError:
            _log("tensorboardX unavailable; skipping TB logging")
    # wandb mirror (megatron global_vars.py:144-187 / open_CLIP --report-to
    # wandb); a clean no-op when the package is absent from the image
    wandb_run = None
    if "wandb" in (args.report_to or ""):
        try:
            import wandb
            wandb_run = wandb.init(project=args.wandb_project_name,
                                   name=args.name or None,
                                   notes=getattr(args, "wandb_notes", None),
                                   config=vars(args))
        except Exception as e:  # noqa: BLE001 — logging must not kill training
            _log(f"wandb unavailable ({type(e).__name__}); skipping")
    # background checkpoint mirroring (open_CLIP --remote-sync,
    # main.py:176-196)
    syncer = None
    if getattr(args, "remote_sync", None) and save_root:
        from megatron_clip_tpu.utils.remote_sync import RemoteSync
        syncer = RemoteSync(save_root, args.remote_sync,
                            frequency=args.remote_sync_frequency).start()
        _log(f"remote-sync: {save_root} -> {args.remote_sync} "
             f"every {args.remote_sync_frequency}s")

    def _finish():
        from megatron_clip_tpu.checkpoints.io import global_saver
        global_saver().wait()  # barrier on any in-flight async save —
        # remote-sync below must see the committed checkpoint files
        if syncer is not None:
            n = syncer.final()
            _log(f"remote-sync final: {n} files")
        if wandb_run is not None:
            wandb_run.finish()
    # SIGTERM -> save-and-exit (megatron DistributedSignalHandler
    # semantics); `term` is the latch installed by run_training
    step = start_step
    t_window = time.perf_counter()
    run_t0 = t_window
    window_samples = 0
    nan_iters = 0  # NaN surveillance (megatron training.py:527-539)
    final_metrics = {}
    # consumed-samples resume: fast-forward within the interrupted epoch
    # (megatron/training.py:1031-1038 dataloader resume semantics). Loaders
    # with skip_batches() seek without decoding (tar entries skipped raw);
    # others are replayed-and-discarded.
    start_epoch = start_step // steps_per_epoch
    skip_batches = start_step % steps_per_epoch
    if start_epoch and hasattr(data["train"], "set_epoch"):
        # sync the loader's epoch-keyed shard order/seeds so the mid-epoch
        # fast-forward skips the samples the interrupted run consumed
        # (detshuffle2's epoch determinism, data.py:242-273)
        data["train"].set_epoch(start_epoch)
    for epoch in range(start_epoch, args.epochs):
        loader = data["train"]
        pre_skipped = 0
        if epoch == start_epoch and skip_batches and \
                hasattr(loader, "skip_batches"):
            loader.skip_batches(skip_batches)
            pre_skipped = skip_batches
        for batch_i, (images, texts) in enumerate(loader):
            if epoch == start_epoch and \
                    batch_i < skip_batches - pre_skipped:
                continue
            if step >= total_steps or (args.exit_interval and
                                       step >= args.exit_interval):
                break
            if step >= (epoch + 1) * steps_per_epoch:
                # --steps-per-epoch shorter than the loader: stop the epoch
                # here so the step//steps_per_epoch resume math, the LR
                # schedule, and the epoch-boundary eval/save cadence all
                # agree on where epochs fall
                break
            metrics = runner.step(images, texts)
            step += 1
            consumed += args.batch_size
            window_samples += args.batch_size
            if step % args.log_interval == 0 or step == total_steps:
                loss = float(metrics["loss"])  # forces device sync
                if not np.isfinite(loss):
                    nan_iters += 1
                    _log(f"WARNING: non-finite loss at step {step} "
                         f"(nan iters so far: {nan_iters})")
                dt = time.perf_counter() - t_window
                ips = window_samples / dt if dt > 0 else 0.0
                lr_now = float(schedule(step))
                scale = float(metrics.get("logit_scale", 0.0))
                _log(f"step {step}/{total_steps} | epoch {epoch} | "
                     f"loss {loss:.4f} | lr {lr_now:.3e} | "
                     f"logit_scale {scale:.2f} | {ips:.1f} samples/s")
                if writer is not None:
                    writer.add_scalar("train/loss", loss, step)
                    writer.add_scalar("train/lr", lr_now, step)
                    writer.add_scalar("train/logit_scale", scale, step)
                    writer.add_scalar("train/samples_per_s", ips, step)
                if wandb_run is not None:
                    wandb_run.log({"train/loss": loss, "train/lr": lr_now,
                                   "train/logit_scale": scale,
                                   "train/samples_per_s": ips}, step=step)
                final_metrics = {"loss": loss, "samples_per_s": ips,
                                 "step": step}
                t_window = time.perf_counter()
                window_samples = 0
            if save_root and args.save_interval and step % args.save_interval == 0:
                # async: the step loop continues while Orbax serializes;
                # SIGTERM/exit/epoch saves barrier on the in-flight write
                # (checkpoints/io.AsyncSaver)
                # pruning rides the post-commit hook: until the async
                # write's tracker lands, the PREVIOUS checkpoint is the
                # only durable one — deleting it here would make a crash
                # mid-serialization lose every checkpoint
                prune = ((lambda s=step: _prune_older_checkpoints(
                    save_root, s))
                    if args.delete_previous_checkpoint else None)
                runner.save(save_root, step, consumed, block=False,
                            on_commit=prune)
            if term["flag"]:
                if save_root:
                    # skip the save when the interval branch above just
                    # wrote this very step (a preemption grace window is
                    # short; don't re-serialize multi-GB state)
                    if not args.save_interval \
                            or step % args.save_interval != 0:
                        runner.save(save_root, step, consumed)
                    _log(f"SIGTERM: saved checkpoint @ step {step}, exiting")
                else:
                    _log(f"SIGTERM: exiting @ step {step} (no --save)")
                _finish()
                return final_metrics
            if args.exit_duration_in_mins is not None and \
                    time.perf_counter() - run_t0 > \
                    args.exit_duration_in_mins * 60:
                # megatron --exit-duration-in-mins: save-then-exit on a
                # wall-clock budget (training.py:829-851)
                if save_root:
                    runner.save(save_root, step, consumed)
                _log(f"exiting at step {step}: --exit-duration-in-mins "
                     f"{args.exit_duration_in_mins} budget reached")
                _finish()
                return final_metrics
        # a step budget (total_steps or --exit-interval) ends the RUN, not
        # just the epoch: save/eval once below, then stop — looping over the
        # remaining epochs would re-save the same step and re-run the same
        # eval every epoch (megatron --exit-interval exits outright,
        # training.py:829)
        run_done = step >= total_steps or (args.exit_interval and
                                           step >= args.exit_interval)
        # run_done always saves: megatron's --exit-interval path persists a
        # checkpoint before exiting (training.py:829) even when the epoch
        # save gate (save_frequency > 1) would not fire this epoch
        if save_root and ((epoch + 1) % args.save_frequency == 0
                          or args.save_most_recent or run_done):
            runner.save(save_root, step, consumed)
            _log(f"saved checkpoint @ step {step}")
            if args.delete_previous_checkpoint:
                _prune_older_checkpoints(save_root, step)
        # validation + zero-shot eval at epoch boundaries (open_CLIP
        # evaluate/zero_shot_eval cadence, train.py:530, main.py epoch loop)
        if ((epoch + 1) % max(args.val_frequency, 1) == 0
                and hasattr(runner, "eval_model")):
            model_, params_ = runner.eval_model()
            if "val" in data:
                from megatron_clip_tpu.evaluation import contrastive_eval_metrics
                em = contrastive_eval_metrics(model_, params_, data["val"])
                _log("val: " + " ".join(f"{k}={v:.4f}" for k, v in em.items()
                                        if isinstance(v, float)))
                final_metrics.update({f"val_{k}": v for k, v in em.items()})
                if save_root:
                    import json as _json
                    with open(os.path.join(save_root, "results.jsonl"),
                              "a") as rf:
                        rf.write(_json.dumps({"epoch": epoch, **{
                            k: v for k, v in em.items()
                            if isinstance(v, (int, float))}}) + "\n")
                if wandb_run is not None:
                    wandb_run.log({f"val/{k}": v for k, v in em.items()
                                   if isinstance(v, (int, float))}, step=step)
            if (args.imagenet_val or args.imagenet_v2) \
                    and tokenizer is not None and \
                    (epoch + 1) % max(args.zeroshot_frequency, 1) == 0:
                from megatron_clip_tpu.evaluation import (
                    build_zero_shot_classifier, zero_shot_eval)
                from megatron_clip_tpu.evaluation.zero_shot import (
                    load_imagenet_metadata, SIMPLE_IMAGENET_TEMPLATES)
                from megatron_clip_tpu.data.image_folder import image_folder_batches, scan_image_folder
                names, templates = load_imagenet_metadata()
                if names is None:
                    _, names = scan_image_folder(args.imagenet_val
                                                 or args.imagenet_v2)
                    templates = SIMPLE_IMAGENET_TEMPLATES
                clf = build_zero_shot_classifier(model_, params_, names,
                                                 templates, tokenizer)
                if args.imagenet_val:
                    zs = zero_shot_eval(model_, params_, clf,
                                        image_folder_batches(
                                            args.imagenet_val,
                                            args.batch_size,
                                            model_.image_size,
                                            is_train=False, epochs=1))
                    _log("zero-shot: " + " ".join(f"{k}={v:.4f}"
                                                  for k, v in zs.items()))
                    final_metrics.update(zs)
                if args.imagenet_v2:
                    # second eval set, same classifier (open_CLIP
                    # --imagenet-v2, zero_shot.py zero_shot_eval)
                    zs2 = zero_shot_eval(model_, params_, clf,
                                         image_folder_batches(
                                             args.imagenet_v2,
                                             args.batch_size,
                                             model_.image_size,
                                             is_train=False, epochs=1))
                    _log("zero-shot v2: " + " ".join(
                        f"{k}={v:.4f}" for k, v in zs2.items()))
                    final_metrics.update(
                        {f"v2_{k}": v for k, v in zs2.items()})
        if run_done:
            break
    if nan_iters:
        _log(f"total non-finite loss iterations: {nan_iters}")
    _finish()
    return final_metrics


class _JointRunner:
    """Single-mesh (dp/fsdp/tp[/pp]) train-step runner.

    With pp > 1 both towers run under the pipelined layer schedule on the
    `stage` axis (the reference's flagship configuration: one scheduler over
    both towers, schedules.py:1043 driving pretrain_CLIP.py) — the pipeline
    microbatch count is --num-microbatches, and vpp > 1 selects the
    interleaved schedule."""

    def __init__(self, args, model, params, tx_factory, pcfg, loss_obj,
                 teacher=None):
        self.mesh = build_mesh(pcfg) if pcfg.num_devices > 1 else None
        self._vpp = None
        if pcfg.pp > 1:
            if self.mesh is None:
                raise ValueError("--pipeline-model-parallel-size > 1 needs "
                                 "more than one device")
            from megatron_clip_tpu.parallel.pipeline import (
                make_pipelined_layers_fn, vpp_arrange)
            mm_fn = None
            if model.is_coca:
                # the CoCa multimodal decoder stage-shards under the PLAIN
                # schedule (its self+cross pairs + image-context side input
                # ride pipeline_transformer's apply_fn/extra path) even
                # when the towers interleave
                mm_fn = make_pipelined_layers_fn(
                    self.mesh, max(1, pcfg.microbatches), 1)
            model = dataclasses.replace(
                model, layers_fn=make_pipelined_layers_fn(
                    self.mesh, max(1, pcfg.microbatches), pcfg.vpp,
                    vpp_prearranged=pcfg.vpp > 1),
                mm_layers_fn=mm_fn)
            if pcfg.vpp > 1:
                # interleaved schedule: place BOTH towers' stacked layers in
                # vpp_arrange physical order once (stage s's contiguous
                # shard = its round-robin chunks) so the per-step chunk
                # lookup moves no weights across stages; checkpoints stay in
                # logical layer order via _to_logical/_to_physical below.
                # The pipelined joint path guarantees plain ViT+text towers
                # (clip.py rejects layers_fn for resnet/convnext/swin/HF),
                # so both subtrees have stacked "blocks".
                self._vpp = (pcfg.pp, pcfg.vpp)
                params = {**params}
                for twr in ("visual", "text"):
                    params[twr] = dict(params[twr], blocks=vpp_arrange(
                        params[twr]["blocks"], pcfg.pp, pcfg.vpp))
        self.model = model
        # the per-layer lock-mask must follow the vpp physical layer order
        # (tx_factory's vpp_layout); plain single-arg factories (tests,
        # __graft_entry__) are called as-is
        self.tx = _call_tx_factory(tx_factory, params, vpp_layout=self._vpp) \
            if self._vpp else _call_tx_factory(tx_factory, params)
        state = TrainState.create(params, self.tx)
        if self.mesh is not None:
            from megatron_clip_tpu.parallel.mesh import STAGE
            stage_axis = STAGE if pcfg.pp > 1 else None
            specs = clip_param_specs(params, stage_axis=stage_axis)
            state = shard_train_state(state, self.mesh, specs)
        self.state = state
        self.step_fn = make_train_step(model, self.tx, loss_obj=loss_obj,
                                       mesh=self.mesh, teacher=teacher,
                                       microbatches=max(1, args.accum_freq),
                                       seed=args.seed)

    def step(self, images, texts):
        self.state, metrics = self.step_fn(self.state, jnp.asarray(images),
                                           jnp.asarray(texts))
        return metrics

    def eval_model(self):
        return self.model, self.state.params

    def _map_blocks(self, state, leaf_fn):
        """Map each tower's stacked blocks (params AND the mirrored optimizer
        leaves, via optax.tree_map_params) with leaf_fn — the layout hop
        between the in-memory vpp_arrange physical order and the
        layout-independent logical checkpoint order."""
        import optax

        tags = jax.tree.map(lambda _: False, state.params)
        for twr in ("visual", "text"):
            tags[twr] = dict(tags[twr], blocks=jax.tree.map(
                lambda _: True, state.params[twr]["blocks"]))
        def f(leaf, tag):
            if not tag:
                return leaf
            out = leaf_fn(leaf)
            if hasattr(leaf, "sharding"):
                # host-index reordering drops the mesh placement; restore it
                # so the next step doesn't silently reshard on entry
                out = jax.device_put(out, leaf.sharding)
            return out

        return state._replace(
            params=jax.tree.map(f, state.params, tags),
            opt_state=optax.tree_map_params(self.tx, f, state.opt_state,
                                            tags))

    def _to_logical(self, state):
        if self._vpp is None:
            return state
        from megatron_clip_tpu.parallel.pipeline import vpp_layer_order
        pp, vpp = self._vpp
        inv_cache = {}

        def restore(leaf):
            n = leaf.shape[0]
            if n not in inv_cache:
                inv_cache[n] = np.argsort(vpp_layer_order(n, pp, vpp))
            return leaf[inv_cache[n]]

        return self._map_blocks(state, restore)

    def _to_physical(self, state):
        if self._vpp is None:
            return state
        from megatron_clip_tpu.parallel.pipeline import vpp_layer_order
        pp, vpp = self._vpp
        return self._map_blocks(
            state, lambda leaf: leaf[vpp_layer_order(leaf.shape[0], pp, vpp)])

    def save(self, root, step, consumed, block=True, on_commit=None):
        save_checkpoint(root, step, self._to_logical(self.state)._asdict(),
                        {"consumed_samples": consumed}, block=block,
                        on_commit=on_commit)

    def load(self, root):
        tree, meta, step = load_checkpoint(root, self.state._asdict())
        self.state = self._to_physical(TrainState(**tree))
        return self.state, meta, step


class _BranchRunner:
    """Branch-parallel (two-mesh) runner: --extra-world-size > 0."""

    def __init__(self, args, model, tx_factory, devices):
        from megatron_clip_tpu.parallel.branch import BranchParallelCLIP
        extra = args.extra_world_size
        main_world = len(devices) - extra
        tp, pp = args.tensor_model_parallel_size, args.pipeline_model_parallel_size
        xtp, xpp = args.xtensor_model_parallel_size, args.xpipeline_model_parallel_size
        fsdp = max(1, args.fsdp_parallel_size)
        vdp = max(1, main_world // (tp * pp * fsdp))
        tdp = max(1, extra // (xtp * xpp * fsdp))
        bp = BranchParallelCfg(
            vision=ParallelCfg(dp=vdp, fsdp=fsdp, tp=tp, pp=pp,
                               vpp=args.virtual_pipeline_parallel_size,
                               microbatches=args.num_microbatches),
            text=ParallelCfg(dp=tdp, fsdp=fsdp, tp=xtp, pp=xpp,
                             vpp=args.virtual_pipeline_parallel_size,
                             microbatches=args.num_microbatches))
        self.model = model
        self.runner = BranchParallelCLIP(
            cfg=model.cfg, bp=bp, compute_dtype=model.precision.compute_jnp,
            remat=model.remat, devices=devices,
            accum_freq=max(1, args.accum_freq))
        self.state = self.runner.init_state(jax.random.PRNGKey(args.seed),
                                            tx_factory)

    def step(self, images, texts):
        self.state, metrics = self.runner.train_step(
            self.state, jnp.asarray(images), jnp.asarray(texts))
        return metrics

    def eval_model(self):
        """(model, params) for the epoch eval/zero-shot harness: the two
        towers + logit scale gathered onto the vision mesh."""
        return self.model, self.runner.eval_params(self.state)

    def save(self, root, step, consumed, block=True, on_commit=None):
        # checkpoints stay in LOGICAL layer order (vpp_arrange is an
        # in-memory placement detail, same contract as the joint runner)
        save_checkpoint(root, step,
                        self.runner.to_logical_state(self.state)._asdict(),
                        {"consumed_samples": consumed}, block=block,
                        on_commit=on_commit)

    def load(self, root):
        from megatron_clip_tpu.parallel.branch import BranchState
        tree, meta, step = load_checkpoint(root, self.state._asdict())
        self.state = self.runner.to_physical_state(BranchState(**tree))
        return self.state, meta, step
