"""Shared mesh-aware training runtime for every pretrain entry point.

The reference funnels all of its workloads (GPT/BERT/T5/ICT/RETRO/vision)
through one `pretrain()` with full parallelism, checkpointing, eval cadence
and logging (megatron/training.py:60-860). This module is that runtime for
the TPU stack: one `run_workload()` that gives any (params, loss_fn, data)
triple

  - a dp x fsdp x tp [x pp] mesh with parameter shardings and the
    distributed-optimizer-by-sharding state placement,
  - Orbax checkpointing with megatron's tracker-file + consumed-samples
    semantics (checkpoints/io.py; megatron/checkpointing.py:241,525) and
    `--resume`-style restart,
  - periodic validation (`--eval-interval` / `--eval-iters`,
    megatron/training.py:861 evaluate()),
  - loss/throughput logging and a deterministic per-step dropout rng.

It replaces the single-device simple loop the secondary workloads trained
on in earlier rounds.
"""
import argparse
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterator, Optional, Tuple

import jax

if os.environ.get("MCT_FORCE_CPU") == "1" or \
        os.environ.get("JAX_PLATFORMS") == "cpu":
    # axon sitecustomize force-registers the TPU plugin regardless of
    # JAX_PLATFORMS; honor a cpu request (virtual-device tests) at the
    # config level, before any backend initialization
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — backend already initialized
        pass

import jax.numpy as jnp
import numpy as np
import optax

from megatron_clip_tpu.config import ParallelCfg
from megatron_clip_tpu.training.optim import make_optimizer, cosine_lr


@dataclass
class RuntimeCfg:
    """Runtime knobs shared by every entry (megatron's training/checkpoint
    argument groups, arguments.py)."""
    train_steps: int
    batch_size: int
    lr: float = 1e-4
    warmup: int = 10
    # megatron --lr-decay-style/--min-lr/--lr-decay-iters
    # (optimizer_param_scheduler.py)
    lr_decay_style: str = "cosine"
    min_lr: float = 0.0
    lr_decay_iters: Optional[int] = None
    weight_decay: float = 0.01
    # megatron --weight-decay-incr-style/--start/--end-weight-decay
    wd_incr_style: str = "constant"
    start_wd: Optional[float] = None
    end_wd: Optional[float] = None
    grad_clip_norm: float = 1.0
    skip_train: bool = False   # megatron --skip-train: eval only
    log_interval: int = 5
    # parallel layout
    tp: int = 1
    fsdp: int = 1
    pp: int = 1
    vpp: int = 1
    cp: int = 1
    dcn_dp: int = 1   # data parallelism across slices/pods (DCN)
    num_microbatches: int = 1
    # megatron --micro-batch-size at pp == 1: gradient accumulation over
    # batch_size // micro_batch_size microbatches via a lax.scan INSIDE the
    # jitted step (the no-pipelining scheduler's microbatch loop,
    # megatron/core/pipeline_parallel/schedules.py:286), with fp32 grad
    # accumulators (megatron's main_grad). Lets an activation-bound config
    # train when the full-batch activations would OOM. With pp > 1 the
    # microbatch split is the pipeline schedule instead (num_microbatches).
    micro_batch_size: Optional[int] = None
    tokens_per_sample: int = 0   # >0: log tok/s alongside samples/s
    # megatron --rampup-batch-size START INCREMENT RAMP_SAMPLES
    # (microbatches.py:83-144): the EFFECTIVE batch grows from START to
    # batch_size by INCREMENT every RAMP_SAMPLES/n_increments consumed
    # samples. The runtime draws EXACTLY gbs samples per step (unused rows
    # of a source batch carry to the next step — megatron's
    # consumed-samples law, sample-for-sample); consumed_samples in the
    # checkpoint metadata tracks the ramped count. Each distinct batch
    # size compiles the step once (XLA caches by shape).
    rampup_batch_size: Optional[Tuple[int, int, int]] = None
    # checkpointing (megatron --save/--save-interval/--load/--finetune)
    save: Optional[str] = None
    save_interval: int = 0
    resume: bool = False
    # --load: initialize from a checkpoint under a DIFFERENT root than
    # --save (megatron checkpointing.py --load). Plain --load continues the
    # run (optimizer state + iteration restored); with --finetune only the
    # params load and the iteration resets to 0 (checkpointing.py:525).
    load: Optional[str] = None
    finetune: bool = False
    # eval (megatron --eval-interval/--eval-iters)
    eval_interval: int = 0
    eval_iters: int = 10
    # time-budget exit (megatron --exit-duration-in-mins,
    # training.py:829-851: save a checkpoint, then stop cleanly)
    exit_duration_mins: Optional[float] = None
    seed: int = 0
    name: str = "train"
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    # megatron --optimizer {adam,sgd} / --sgd-momentum
    optimizer: str = "adam"
    sgd_momentum: float = 0.9
    # "bf16" = fully-bf16 adam state (adamw_lowbits) — the 1.3b-on-one-chip
    # configuration (megatron's fp16 optimizer analogue, reversed: master
    # state shrinks instead of compute)
    nu_dtype: Optional[str] = None
    # megatron --no-load-optim / --no-save-optim (checkpointing.py):
    # params-only load keeping the iteration; save without optimizer state
    no_load_optim: bool = False
    no_save_optim: bool = False
    tensorboard_dir: Optional[str] = None  # megatron --tensorboard-dir
    log_params_norm: bool = False          # megatron --log-params-norm
    log_num_zeros_in_grad: bool = False    # megatron --log-num-zeros-in-grad
    # megatron --profile/--profile-step-start/--profile-step-end
    # (training.py:764-768 cudaProfilerStart window -> jax.profiler trace,
    # viewable in TensorBoard/Perfetto)
    profile: bool = False
    profile_step_start: int = 10
    profile_step_end: int = 12
    profile_dir: Optional[str] = None


def add_runtime_args(p, *, lr: float = 1e-4, weight_decay: float = 0.01,
                     batch_size: int = 8, warmup: int = 10):
    """Attach the shared runtime flags to an entry's argparse parser.

    Megatron spellings are registered as aliases of the same dest
    (--global-batch-size, --train-iters, --lr-warmup-iters, --clip-grad):
    a step consumes the global batch here — grad accumulation dissolves
    into the jit (microbatching exists only as the pipeline schedule)."""
    p.add_argument("--batch-size", "--global-batch-size", type=int,
                   default=batch_size,
                   help="samples consumed per step (megatron "
                        "--global-batch-size)")
    p.add_argument("--rampup-batch-size", type=int, nargs=3, default=None,
                   metavar=("START", "INCREMENT", "RAMP_SAMPLES"),
                   help="grow the effective batch from START to "
                        "--batch-size by INCREMENT as samples are consumed "
                        "(megatron --rampup-batch-size, microbatches.py); "
                        "each distinct size compiles the step once")
    p.add_argument("--micro-batch-size", type=int, default=None,
                   help="megatron per-rank microbatch; with pp>1 derives "
                        "num_microbatches = batch_size // micro; at pp=1 "
                        "enables in-jit gradient accumulation over "
                        "batch_size // micro microbatches (schedules.py:286 "
                        "no-pipelining loop)")
    p.add_argument("--train-steps", "--train-iters", type=int, default=20)
    p.add_argument("--train-samples", type=int, default=None,
                   help="run length in samples instead of steps (megatron "
                        "--train-samples; converted to "
                        "ceil(samples/batch-size) steps)")
    p.add_argument("--lr", type=float, default=lr)
    p.add_argument("--warmup", "--lr-warmup-iters", type=int,
                   default=warmup)
    p.add_argument("--lr-decay-style",
                   choices=["constant", "linear", "cosine",
                            "inverse-square-root"], default="cosine",
                   help="megatron --lr-decay-style")
    p.add_argument("--min-lr", type=float, default=0.0)
    p.add_argument("--lr-decay-iters", type=int, default=None,
                   help="decay horizon in steps (defaults to --train-steps)")
    p.add_argument("--lr-warmup-fraction", type=float, default=None,
                   help="warmup as a fraction of the decay horizon instead "
                        "of --warmup steps (megatron --lr-warmup-fraction)")
    p.add_argument("--weight-decay", type=float, default=weight_decay)
    p.add_argument("--weight-decay-incr-style",
                   choices=["constant", "linear", "cosine"],
                   default="constant",
                   help="ramp weight decay from --start-weight-decay to "
                        "--end-weight-decay over the run (megatron flag)")
    p.add_argument("--start-weight-decay", type=float, default=None)
    p.add_argument("--end-weight-decay", type=float, default=None)
    p.add_argument("--grad-clip-norm", "--clip-grad", type=float,
                   default=1.0)
    p.add_argument("--skip-train", action="store_true",
                   help="run validation only, no training (megatron "
                        "--skip-train)")
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--tensor-model-parallel-size", type=int, default=1)
    p.add_argument("--fsdp-parallel-size", type=int, default=1)
    p.add_argument("--pipeline-model-parallel-size", type=int, default=1)
    p.add_argument("--virtual-pipeline-parallel-size", type=int, default=1)
    p.add_argument("--dcn-data-parallel-size", type=int, default=1,
                   help="data parallelism across slices/pods over DCN "
                        "(carved out of the auto-computed dp; only the "
                        "grad all-reduce crosses the DCN, every other "
                        "collective stays on ICI)")
    p.add_argument("--num-microbatches", type=int, default=1)
    p.add_argument("--save", type=str, default=None,
                   help="checkpoint root (iter_XXXXXXX dirs + tracker file)")
    p.add_argument("--save-interval", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint under --save")
    p.add_argument("--load", type=str, default=None,
                   help="initialize from a checkpoint root distinct from "
                        "--save (megatron --load); continues optimizer "
                        "state + iteration unless --finetune")
    p.add_argument("--finetune", action="store_true",
                   help="with --load: restore model params only and reset "
                        "the iteration/optimizer (megatron --finetune)")
    p.add_argument("--eval-interval", type=int, default=0)
    p.add_argument("--eval-iters", type=int, default=10)
    p.add_argument("--no-load-optim", action="store_true",
                   help="restore params + iteration but re-init the "
                        "optimizer (megatron --no-load-optim; also how to "
                        "resume from a --no-save-optim checkpoint)")
    p.add_argument("--no-save-optim", action="store_true",
                   help="save checkpoints without optimizer state "
                        "(megatron --no-save-optim)")
    p.add_argument("--exit-duration-in-mins", type=float, default=None,
                   help="stop (after saving, if --save) once this much "
                        "wall-clock has elapsed (megatron "
                        "--exit-duration-in-mins)")
    p.add_argument("--use-checkpoint-args", action="store_true",
                   help="override model-architecture flags from the "
                        "checkpoint being loaded (megatron "
                        "checkpointing.py:441 load_args_from_checkpoint)")
    p.add_argument("--adam-beta1", type=float, default=None,
                   help="megatron --adam-beta1 (default 0.9)")
    p.add_argument("--adam-beta2", type=float, default=None,
                   help="megatron --adam-beta2 (entries pick their recipe "
                        "default when unset)")
    p.add_argument("--adam-eps", type=float, default=None,
                   help="megatron --adam-eps (default 1e-8)")
    p.add_argument("--optimizer", choices=["adam", "sgd"], default="adam",
                   help="megatron --optimizer")
    p.add_argument("--sgd-momentum", type=float, default=0.9,
                   help="megatron --sgd-momentum")
    p.add_argument("--nu-dtype", choices=["fp32", "bf16"], default="fp32",
                   help="adam second-moment storage; bf16 = fully-bf16 "
                        "optimizer state (fits 1.3b-class models on one "
                        "16G chip)")
    p.add_argument("--tensorboard-dir", type=str, default=None,
                   help="write train/val scalars here (megatron "
                        "--tensorboard-dir; every workload logs TB, "
                        "training.py training_log)")
    p.add_argument("--log-num-zeros-in-grad", action="store_true",
                   help="count exact zeros in the gradients each logged "
                        "step (megatron --log-num-zeros-in-grad)")
    p.add_argument("--log-params-norm", action="store_true",
                   help="log the global parameter norm each interval "
                        "(megatron --log-params-norm)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace over the "
                        "[--profile-step-start, --profile-step-end] window "
                        "(megatron --profile, training.py:764-768)")
    p.add_argument("--profile-step-start", type=int, default=10)
    p.add_argument("--profile-step-end", type=int, default=12)
    p.add_argument("--profile-dir", type=str, default=None,
                   help="trace output dir (default --tensorboard-dir or "
                        "./profile); view with tensorboard or Perfetto")
    add_megatron_compat_args(p)
    return p


# megatron flags that have no TPU/XLA meaning: CUDA kernel-fusion toggles
# (XLA fuses), fp16 dynamic loss scaling (bf16 needs none), NCCL/process-
# group wiring (one XLA runtime over ICI), CUDA allocator knobs, and
# host-side RNG checkpointing (step-keyed threaded PRNG is stateless).
# Accepted so reference launch scripts run unmodified; warned when set.
_MEGATRON_NOOP_STORE_TRUE = (
    "--use-flash-attn",                    # always on (Pallas kernels)
    "--no-masked-softmax-fusion", "--no-bias-gelu-fusion",
    "--no-bias-dropout-fusion", "--no-persist-layer-norm",
    "--no-gradient-accumulation-fusion",
    "--no-async-tensor-model-parallel-allreduce",
    "--overlap-grad-reduce", "--overlap-p2p-communication",
    "--use-ring-exchange-p2p", "--no-scatter-gather-tensors-in-pipeline",
    "--use-cpu-initialization", "--data-parallel-random-init",
    "--attention-softmax-in-fp32",         # kernels accumulate fp32 already
    "--accumulate-allreduce-grads-in-fp32",
    "--fp32-residual-connection",
    "--no-load-rng", "--no-save-rng",
    "--no-check-for-nan-in-loss-and-grad", "--distribute-saved-activations",
    "--no-query-key-layer-scaling", "--use-mcore-models",
    "--no-barrier-with-level-1-timing",
)
_MEGATRON_NOOP_VALUE = {
    "--distributed-backend": str, "--distributed-timeout-minutes": int,
    "--loss-scale": float, "--initial-loss-scale": float,
    "--min-loss-scale": float, "--loss-scale-window": int,
    "--hysteresis": int, "--empty-unused-memory-level": int,
    "--num-workers": int, "--timing-log-level": int,
    "--timing-log-option": str, "--max-tokens-to-oom": int,
    "--tensorboard-log-interval": int, "--tensorboard-queue-size": int,
    "--transformer-impl": str, "--recompute-method": str,
    "--recompute-num-layers": int, "--lazy-mpu-init": str,
    # real (pos-table length) on the GPT entry, which defines it first;
    # accepted-for-parity on encoder entries where seq_length bounds it
    "--max-position-embeddings": int,
}


def add_megatron_compat_args(p):
    """Megatron arguments.py flags accepted for CLI compatibility.

    Three kinds: (a) true no-ops (warned), (b) remaps onto native knobs
    (--bf16/--fp16 -> --precision, --checkpoint-activations /
    --recompute-activations -> --recompute-granularity, applied in
    runtime_cfg_from_args), (c) --dataloader-type, accepted with 'single'
    semantics (the dataset shuffle index covers 'cyclic''s intent)."""
    g = p.add_argument_group(
        "megatron compatibility",
        "accepted so reference megatron commands run unmodified; "
        "no-ops warn once (see MIGRATING.md)")
    # only flags the ENTRY did not already define for real are no-ops —
    # e.g. pretrain_gpt's --max-position-embeddings actively sizes the pos
    # table; warning "no-op" about it there would be wrong
    registered = []
    for flag in _MEGATRON_NOOP_STORE_TRUE:
        try:
            g.add_argument(flag, action="store_true",
                           help=argparse.SUPPRESS)
            registered.append(flag)
        except argparse.ArgumentError:
            pass  # the entry defines a real version of this flag
    for flag, typ in _MEGATRON_NOOP_VALUE.items():
        try:
            g.add_argument(flag, type=typ, default=None,
                           help=argparse.SUPPRESS)
            registered.append(flag)
        except argparse.ArgumentError:
            pass
    p.set_defaults(_mct_noop_flags=tuple(registered))
    for flag, hlp in (
            ("--bf16", "megatron --bf16: maps to --precision bf16"),
            ("--fp16", "megatron --fp16: bf16 is used instead on TPU "
                       "(strictly better numerics, no loss scaling)"),
            ("--checkpoint-activations",
             "deprecated megatron spelling of full recompute"),
            ("--recompute-activations",
             "megatron selective recompute (core attention only)")):
        try:
            g.add_argument(flag, action="store_true", help=hlp)
        except argparse.ArgumentError:
            pass
    for flag, hlp in (
            ("--vocab-file", "tokenizer vocab (megatron --vocab-file): "
                             "when given, the model vocab size derives "
                             "from the tokenizer + padding, like megatron "
                             "build_tokenizer"),
            ("--merge-file", "GPT2 BPE merges.txt (megatron --merge-file)"),
            ("--tokenizer-model", "sentencepiece .model "
                                  "(megatron --tokenizer-model)")):
        try:
            g.add_argument(flag, type=str, default=None, help=hlp)
        except argparse.ArgumentError:
            pass
    try:
        g.add_argument("--tokenizer-type", type=str, default=None,
                       choices=["BertWordPieceLowerCase", "BertWordPieceCase",
                                "GPT2BPETokenizer", "SentencePieceTokenizer",
                                "GPTSentencePieceTokenizer",
                                "Llama2Tokenizer", "NullTokenizer",
                                "CLIPTokenizer"],
                       help="megatron --tokenizer-type (picks the vocab-size "
                            "derivation; data here is already tokenized)")
        g.add_argument("--data-impl", type=str, default=None,
                       help=argparse.SUPPRESS)  # mmap is the only impl
        g.add_argument("--profile-ranks", type=int, nargs="*", default=None,
                       help=argparse.SUPPRESS)
        g.add_argument("--dataloader-type", choices=["single", "cyclic"],
                       default=None,
                       help="megatron --dataloader-type: 'single' = "
                            "sequential with consumed-samples resume "
                            "(MegatronPretrainingSampler, "
                            "data_samplers.py:48); 'cyclic' = per-epoch "
                            "random resampling "
                            "(MegatronPretrainingRandomSampler, :93), both "
                            "O(1)-seekable (data/samplers.py)")
        g.add_argument("--no-data-sharding", action="store_false",
                       dest="data_sharding", default=True,
                       help="megatron --no-data-sharding: cyclic sampler "
                            "draws from one shared permutation (rank-"
                            "strided) instead of per-rank buckets")
        g.add_argument("--sampler-rng", choices=["numpy", "torch"],
                       default=None,
                       help="permutation generator for the cyclic sampler: "
                            "'torch' reproduces the reference's "
                            "torch.Generator(epoch)+randperm stream "
                            "bit-for-bit (use when resuming a megatron "
                            "run or A/B-ing data order); default numpy "
                            "PCG64 (same law, different order)")
    except argparse.ArgumentError:
        pass


def vocab_size_from_tokenizer_args(args, extra_ids: int = 0,
                                   with_real: bool = False):
    """megatron sizes the embedding from the tokenizer files, not a
    --vocab-size flag (tokenizer.py build_tokenizer +
    _vocab_size_with_padding): when --vocab-file / --merge-file /
    --tokenizer-model are passed, derive the padded vocab size the same
    way so reference launch scripts produce the same model shape. Returns
    None when no tokenizer files were given (the entry's --vocab-size
    applies). with_real=True returns (padded, real) — datasets that SAMPLE
    token ids (BERT MLM random replacement) must draw from the real
    tokenizer vocab, never the padding rows (megatron bert_dataset.py
    vocab_id_list)."""
    from megatron_clip_tpu.tokenizer import megatron_tokenizers as mt
    tt = getattr(args, "tokenizer_type", None) or ""
    vf = getattr(args, "vocab_file", None)
    mf = getattr(args, "merge_file", None)
    sp = getattr(args, "tokenizer_model", None)
    if not (vf or sp):
        return (None, None) if with_real else None
    if tt in ("NullTokenizer", "CLIPTokenizer"):
        # fixed-size vocabs; the entry's default already matches
        return (None, None) if with_real else None
    if sp or tt in ("SentencePieceTokenizer", "GPTSentencePieceTokenizer",
                    "Llama2Tokenizer"):
        tok = mt.SentencePieceTokenizer(sp or vf)
    elif mf or tt == "GPT2BPETokenizer":
        tok = mt.GPT2BPETokenizer(vf, mf)
    else:  # bert wordpiece — megatron's default for a bare vocab.txt
        tok = mt.BertWordPieceTokenizer(
            vf, lower_case=tt != "BertWordPieceCase")
    # T5 appends <extra_id_k> sentinels to the tokenizer before padding
    # (megatron --vocab-extra-ids, tokenizer.py _T5 vocab build)
    d = getattr(args, "make_vocab_size_divisible_by", None) or 128
    tp = getattr(args, "tensor_model_parallel_size", 1) or 1
    real = tok.vocab_size + extra_ids
    padded = mt.vocab_size_with_padding(real, d, tp)
    return (padded, real) if with_real else padded


def normalize_megatron_compat(ns):
    """Apply the (b)-kind remaps and warn once for set no-ops."""
    import warnings
    if getattr(ns, "bf16", False):
        ns.precision = "bf16"
    if getattr(ns, "fp16", False):
        warnings.warn("--fp16 requested: using bf16 on TPU (no loss "
                      "scaling needed; megatron's Float16 optimizer "
                      "machinery has no equivalent here)")
        ns.precision = "bf16"
    if hasattr(ns, "recompute_granularity"):
        if getattr(ns, "checkpoint_activations", False) \
                and ns.recompute_granularity == "none":
            ns.recompute_granularity = "full"
        if getattr(ns, "recompute_activations", False) \
                and ns.recompute_granularity == "none":
            ns.recompute_granularity = "selective"
    # warn only for flags registered AS no-ops on this entry's parser
    # (an entry's real flag of the same name is behavior-bearing)
    noop_true = set(getattr(ns, "_mct_noop_flags",
                            tuple(_MEGATRON_NOOP_STORE_TRUE)
                            + tuple(_MEGATRON_NOOP_VALUE)))
    set_noops = [f for f in _MEGATRON_NOOP_STORE_TRUE if f in noop_true
                 and getattr(ns, f[2:].replace("-", "_"), False) is True]
    set_noops += [f for f in _MEGATRON_NOOP_VALUE if f in noop_true
                  and getattr(ns, f[2:].replace("-", "_"), None) is not None]
    if set_noops:
        warnings.warn("megatron flags accepted but no-ops on TPU: "
                      + " ".join(sorted(set_noops)))
    return ns


def runtime_cfg_from_args(args, name: str) -> RuntimeCfg:
    normalize_megatron_compat(args)
    if getattr(args, "sampler_rng", None):
        from megatron_clip_tpu.data.samplers import set_default_perm_impl
        set_default_perm_impl(args.sampler_rng)
    steps = args.train_steps
    if getattr(args, "train_samples", None):
        steps = -(-args.train_samples // args.batch_size)
    warmup = args.warmup
    if getattr(args, "lr_warmup_fraction", None) is not None:
        horizon = getattr(args, "lr_decay_iters", None) or steps
        warmup = int(args.lr_warmup_fraction * horizon)
    return RuntimeCfg(
        train_steps=steps, batch_size=args.batch_size,
        lr=args.lr, warmup=warmup,
        lr_decay_style=getattr(args, "lr_decay_style", "cosine"),
        min_lr=getattr(args, "min_lr", 0.0),
        lr_decay_iters=getattr(args, "lr_decay_iters", None),
        weight_decay=args.weight_decay,
        wd_incr_style=getattr(args, "weight_decay_incr_style", "constant"),
        start_wd=getattr(args, "start_weight_decay", None),
        end_wd=getattr(args, "end_weight_decay", None),
        skip_train=getattr(args, "skip_train", False),
        grad_clip_norm=args.grad_clip_norm, log_interval=args.log_interval,
        tp=args.tensor_model_parallel_size, fsdp=args.fsdp_parallel_size,
        pp=args.pipeline_model_parallel_size,
        vpp=args.virtual_pipeline_parallel_size,
        cp=getattr(args, "context_parallel_size", 1),
        dcn_dp=getattr(args, "dcn_data_parallel_size", 1),
        # megatron --micro-batch-size: with pipelining, the microbatch
        # count is global/micro (microbatches.py with dp folded into the
        # jit-sharded batch); without pp it is informational
        num_microbatches=max(
            args.num_microbatches,
            (args.batch_size // args.micro_batch_size)
            if getattr(args, "micro_batch_size", None)
            and args.pipeline_model_parallel_size > 1 else 1),
        micro_batch_size=(getattr(args, "micro_batch_size", None)
                          if args.pipeline_model_parallel_size == 1
                          else None),
        save=args.save, save_interval=args.save_interval,
        resume=args.resume, load=getattr(args, "load", None),
        finetune=getattr(args, "finetune", False),
        eval_interval=args.eval_interval,
        eval_iters=args.eval_iters,
        exit_duration_mins=getattr(args, "exit_duration_in_mins", None),
        # explicit None checks: 0.0 is a legitimate beta1 (RMSProp-style)
        beta1=(lambda v: 0.9 if v is None else v)(
            getattr(args, "adam_beta1", None)),
        beta2=(lambda v: 0.999 if v is None else v)(
            getattr(args, "adam_beta2", None)),
        eps=(lambda v: 1e-8 if v is None else v)(
            getattr(args, "adam_eps", None)),
        optimizer=getattr(args, "optimizer", "adam"),
        sgd_momentum=getattr(args, "sgd_momentum", 0.9),
        no_load_optim=getattr(args, "no_load_optim", False),
        no_save_optim=getattr(args, "no_save_optim", False),
        tensorboard_dir=getattr(args, "tensorboard_dir", None),
        log_params_norm=getattr(args, "log_params_norm", False),
        log_num_zeros_in_grad=getattr(args, "log_num_zeros_in_grad", False),
        profile=getattr(args, "profile", False),
        profile_step_start=getattr(args, "profile_step_start", 10),
        profile_step_end=getattr(args, "profile_step_end", 12),
        profile_dir=getattr(args, "profile_dir", None),
        rampup_batch_size=(tuple(args.rampup_batch_size)
                           if getattr(args, "rampup_batch_size", None)
                           else None),
        seed=args.seed, name=name,
        nu_dtype=None if getattr(args, "nu_dtype", "fp32") == "fp32"
        else args.nu_dtype)


# flags that describe the RUN, not the model: --use-checkpoint-args must
# not clobber these (megatron's load_args_from_checkpoint likewise only
# restores architecture/tokenizer args, checkpointing.py:441-524; parallel
# sizes are excluded here — unlike rank-file checkpoints, Orbax global
# arrays reshard freely, so the new run's layout flags win)
_RUN_ARG_KEYS = frozenset({
    "batch_size", "train_steps", "train_samples", "lr", "warmup",
    "lr_decay_style",
    "min_lr", "lr_decay_iters", "weight_decay",
    "grad_clip_norm", "log_interval", "tensor_model_parallel_size",
    "fsdp_parallel_size", "pipeline_model_parallel_size",
    "virtual_pipeline_parallel_size", "num_microbatches",
    "context_parallel_size", "save", "save_interval", "resume", "load",
    "finetune", "eval_interval", "eval_iters", "exit_duration_in_mins",
    "use_checkpoint_args", "seed", "nu_dtype", "data_path", "split",
    "recompute_granularity", "adam_beta1", "adam_beta2", "adam_eps",
    "optimizer", "sgd_momentum", "no_load_optim", "no_save_optim",
    "lr_warmup_fraction", "weight_decay_incr_style", "start_weight_decay",
    "end_weight_decay", "skip_train", "tensorboard_dir", "log_params_norm",
    "log_num_zeros_in_grad", "micro_batch_size",
    # execution-strategy / environment knobs, never architecture
    "profile", "profile_step_start", "profile_step_end", "profile_dir",
    "dataloader_type", "rampup_batch_size", "sampler_rng", "data_sharding",
    "precision", "params_dtype", "quantize_matmuls", "sequence_parallel",
    "context_parallel_layout", "fused_ce", "loss_seq_chunk",
    "attention_dropout", "hidden_dropout", "eod_token", "eod_mask_loss",
    "reset_position_ids", "reset_attention_mask",
})


def _is_run_key(k: str) -> bool:
    # any path/dir/file-valued flag describes the environment, not the model
    return k in _RUN_ARG_KEYS or k.endswith(("_path", "_dir", "_file"))


def maybe_apply_checkpoint_args(args):
    """megatron --use-checkpoint-args (checkpointing.py:441-524): override
    the namespace's model-architecture flags from the metadata of the
    checkpoint about to be loaded (--load, or --save when --resume).
    Call before building the model config."""
    if not getattr(args, "use_checkpoint_args", False):
        return args
    from megatron_clip_tpu.checkpoints import (
        load_checkpoint_metadata, latest_checkpoint_step)
    root = getattr(args, "load", None) or \
        (args.save if getattr(args, "resume", False) else None)
    if not root or latest_checkpoint_step(root) is None:
        raise SystemExit("--use-checkpoint-args needs a checkpoint to read "
                         "args from (--load PATH, or --resume with --save)")
    stored = load_checkpoint_metadata(root).get("args")
    if stored is None:
        raise SystemExit(f"checkpoint under {root} was saved without an "
                         "args record; cannot --use-checkpoint-args")
    applied = {}
    for k, v in stored.items():
        if _is_run_key(k) or not hasattr(args, k):
            continue
        if getattr(args, k) != v:
            applied[k] = (getattr(args, k), v)
            setattr(args, k, v)
    if applied:
        print("[use-checkpoint-args] overriding from checkpoint: " +
              ", ".join(f"{k}: {old!r} -> {new!r}"
                        for k, (old, new) in applied.items()), flush=True)
    return args


def _json_safe_args(args) -> dict:
    out = {}
    for k, v in vars(args).items():
        if isinstance(v, (str, int, float, bool)) or v is None:
            out[k] = v
    return out


def build_workload_mesh(rc: RuntimeCfg, *, vpp_prearranged: bool = False):
    """(mesh, layers_fn) for the runtime layout; mesh is None single-device.
    layers_fn is the pipelined schedule adapter when pp > 1 (pass it into
    the model's apply). vpp_prearranged=True declares the entry places its
    stacked layers in vpp_arrange physical order (zero-copy interleaved
    chunk placement) and supplies matching ckpt_transforms — see
    vpp_ckpt_transforms."""
    from megatron_clip_tpu.parallel import build_mesh

    devices = jax.devices()
    denom = rc.tp * rc.fsdp * rc.pp * rc.cp * rc.dcn_dp
    dp = max(1, len(devices) // denom)
    if dp * denom == 1:
        return None, None
    mesh = build_mesh(ParallelCfg(dp=dp, fsdp=rc.fsdp, tp=rc.tp, pp=rc.pp,
                                  vpp=rc.vpp, cp=rc.cp, dcn_dp=rc.dcn_dp,
                                  microbatches=rc.num_microbatches))
    layers_fn = None
    if rc.pp > 1:
        from megatron_clip_tpu.parallel.pipeline import \
            make_pipelined_layers_fn
        layers_fn = make_pipelined_layers_fn(
            mesh, max(1, rc.num_microbatches), rc.vpp,
            vpp_prearranged=vpp_prearranged and rc.vpp > 1)
    return mesh, layers_fn


def vpp_ckpt_transforms(params, blocks_key: str, pp: int, vpp: int):
    """(tag_tree, to_ckpt, from_ckpt) for run_workload's ckpt_transforms:
    keeps checkpoints in LOGICAL layer order while the in-memory stacked
    blocks (params[blocks_key]) live in vpp_arrange physical order."""
    import numpy as np
    from megatron_clip_tpu.parallel.pipeline import vpp_layer_order
    n_layers = jax.tree.leaves(params[blocks_key])[0].shape[0]
    order = vpp_layer_order(n_layers, pp, vpp)
    inv = np.argsort(order)
    tags = jax.tree.map(lambda _: False, params)
    tags[blocks_key] = jax.tree.map(lambda _: True, params[blocks_key])
    to_ckpt = lambda leaf, tag: leaf[inv] if tag else leaf      # noqa: E731
    from_ckpt = lambda leaf, tag: leaf[order] if tag else leaf  # noqa: E731
    return tags, to_ckpt, from_ckpt


class _BatchDrawer:
    """Draw exactly-n-row batches from a fixed-size batch iterator, carrying
    the unused tail of each source batch over to the next draw.

    megatron's rampup sampler draws exactly gbs samples per step
    (microbatches.py:83-144 + data_samplers.py), so the consumed-samples ->
    dataset-position mapping is sample-exact; slicing the first gbs rows of
    a fixed-size batch and dropping the rest (the round-3 behavior) would
    diverge from that stream. Leaves whose leading dim != the source batch
    size (scalar/step metadata) are passed through, latest value wins.
    """

    def __init__(self, it: Iterator, src_bs: int):
        self.it, self.src_bs = it, src_bs
        self.buf = None          # leftover rows (batch leaves only sliced)
        self.buf_rows = 0
        self.mask = None         # pytree[bool]: leaf participates in rows

    def _pull(self):
        b = next(self.it)
        if self.mask is None:
            self.mask = jax.tree.map(
                lambda x: getattr(x, "ndim", 0) > 0
                and x.shape[0] == self.src_bs, b)
        return b

    def draw(self, n: int):
        parts, rows = [], []
        if self.buf_rows:
            parts.append(self.buf)
            rows.append(self.buf_rows)
        have = sum(rows)
        while have < n:
            parts.append(self._pull())
            rows.append(self.src_bs)
            have += self.src_bs
        if len(parts) == 1:
            cat = parts[0]
        else:
            cat = jax.tree.map(
                lambda m, *xs: np.concatenate([np.asarray(x) for x in xs])
                if m else xs[-1], self.mask, *parts)
        out = jax.tree.map(lambda m, x: x[:n] if m else x, self.mask, cat)
        if have > n:
            self.buf = jax.tree.map(lambda m, x: x[n:] if m else x,
                                    self.mask, cat)
        else:
            self.buf = None
        self.buf_rows = have - n
        return out

    def skip_rows(self, n: int):
        """Discard n rows (resume mid-source-batch)."""
        if n:
            self.draw(n)


def run_workload(params, loss_fn: Callable, batch_iter: Iterator,
                 rc: RuntimeCfg, *, mesh=None, param_specs=None,
                 use_rng: bool = False, post_step: Callable = None,
                 val_iter_factory: Callable = None,
                 eval_loss_fn: Callable = None,
                 custom_eval: Callable = None,
                 aux_state: Any = None, aux_update: Callable = None,
                 args_ns=None, ckpt_transforms=None) -> dict:
    """Train `loss_fn(params, batch, rng) -> scalar` for rc.train_steps.

    `aux_state`/`aux_update`: non-gradient training state (e.g. DINO's EMA
    teacher + center). loss_fn then has signature
    (params, batch, rng, aux) -> (loss, loss_aux) and
    aux_update(aux_state, params, loss_aux) -> aux_state runs inside the
    jitted step; aux_state is checkpointed alongside params.

    batch: any pytree of arrays (leading axis = batch). With a mesh the
    entry is responsible for batch-sharding constraints inside loss_fn (or
    relies on XLA propagation from the param shardings, which is correct
    for pure dp/fsdp/tp).

    Checkpoint layout matches training/loop.py: iter_XXXXXXX/state +
    metadata.json{consumed_samples} + latest_checkpointed_iteration.txt.
    `batch_iter` may be an iterator OR a factory `fn(start_step) ->
    iterator`: on resume a factory seeks directly (the consumed-samples
    sampler fast-forward, megatron data_samplers.py:14-48), a plain
    iterator is replayed-and-discarded for start_step batches.

    `ckpt_transforms`: (tag_tree, to_ckpt, from_ckpt) for entries whose
    in-memory param layout differs from the (layout-independent) checkpoint
    layout — e.g. the interleaved pipeline's vpp_arrange physical layer
    order. tag_tree is params-shaped; to_ckpt(leaf, tag)/from_ckpt(leaf,
    tag) map each leaf at save/load. Applied to params directly and to the
    optimizer state structurally via optax.tree_map_params.
    """
    from megatron_clip_tpu.checkpoints import (
        save_checkpoint, load_checkpoint, latest_checkpoint_step)

    from megatron_clip_tpu.training.optim import megatron_lr, megatron_wd
    lr_sched = megatron_lr(rc.lr, rc.warmup, rc.train_steps,
                           decay_style=rc.lr_decay_style, min_lr=rc.min_lr,
                           decay_steps=rc.lr_decay_iters)
    wd_schedule = None
    if rc.wd_incr_style != "constant":
        start = rc.start_wd if rc.start_wd is not None else rc.weight_decay
        end = rc.end_wd if rc.end_wd is not None else rc.weight_decay
        wd_schedule = megatron_wd(start, end, rc.train_steps,
                                  incr_style=rc.wd_incr_style)
    tx = make_optimizer(params, lr_sched,
                        weight_decay=rc.weight_decay,
                        grad_clip_norm=rc.grad_clip_norm, beta1=rc.beta1,
                        beta2=rc.beta2, eps=rc.eps,
                        optimizer=rc.optimizer, sgd_momentum=rc.sgd_momentum,
                        weight_decay_schedule=wd_schedule,
                        nu_dtype=jnp.bfloat16 if rc.nu_dtype == "bf16"
                        else None)

    if mesh is not None and param_specs is not None:
        from megatron_clip_tpu.parallel.sharding import make_sharding_tree
        params = jax.device_put(params, make_sharding_tree(mesh, param_specs))
    opt_state = tx.init(params)

    base_rng = jax.random.PRNGKey(rc.seed + 1)

    def _loss_and_grads(params, batch, rng, aux):
        if aux_update is not None:
            (loss, loss_aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng, aux), has_aux=True)(params)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng))(params)
            loss_aux = None
        return loss, loss_aux, grads

    accum_mbs = rc.micro_batch_size if rc.pp == 1 else None

    def _accum_loss_and_grads(params, batch, rng, aux):
        """Gradient accumulation over batch//micro microbatches: the
        reference's no-pipelining scheduler loop (megatron
        core/pipeline_parallel/schedules.py:286), as a lax.scan inside the
        jit. Grads accumulate in fp32 (megatron's main_grad buffer,
        core/distributed.py GradBuffer); activations exist for ONE
        microbatch at a time, which is what lets an activation-bound
        config train."""
        from jax import lax
        leads = {x.shape[0] for x in jax.tree.leaves(batch)
                 if getattr(x, "ndim", 0) > 0}
        if len(leads) != 1:
            raise ValueError(
                "--micro-batch-size accumulation requires every batch leaf "
                f"to share one leading (batch) dim; got {sorted(leads)}")
        (gbs,) = leads
        if gbs % accum_mbs:
            raise ValueError(f"global batch {gbs} not divisible by "
                             f"--micro-batch-size {accum_mbs}")
        n = gbs // accum_mbs
        if n <= 1:
            return _loss_and_grads(params, batch, rng, aux)
        # 0-d leaves (step tags/metadata) broadcast across microbatches
        mb = jax.tree.map(
            lambda x: x.reshape((n, accum_mbs) + x.shape[1:])
            if getattr(x, "ndim", 0) > 0 else jnp.broadcast_to(x, (n,)),
            batch)
        # loss_aux accumulator template via abstract eval (no extra compile)
        la_sds = jax.eval_shape(
            lambda p, b, r, a: _loss_and_grads(p, b, r, a)[1],
            params, jax.tree.map(lambda x: x[0], mb), rng, aux)

        def _la_zero(s):
            return jnp.zeros(s.shape, jnp.float32
                             if jnp.issubdtype(s.dtype, jnp.inexact)
                             else s.dtype)

        def body(carry, xs):
            mb_i, idx = xs
            r = jax.random.fold_in(rng, idx) if rng is not None else None
            loss_i, la_i, g_i = _loss_and_grads(params, mb_i, r, aux)
            acc_l, acc_la, acc_g = carry
            acc_l = acc_l + loss_i.astype(jnp.float32) / n
            acc_g = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32) / n, acc_g, g_i)
            if la_i is not None:
                # inexact leaves: mean over microbatches; others: last wins
                acc_la = jax.tree.map(
                    lambda a, x: a + x.astype(jnp.float32) / n
                    if jnp.issubdtype(x.dtype, jnp.inexact) else x,
                    acc_la, la_i)
            return (acc_l, acc_la, acc_g), None

        init = (jnp.zeros((), jnp.float32),
                jax.tree.map(_la_zero, la_sds),
                jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                             params))
        (loss, loss_aux, grads), _ = lax.scan(
            body, init, (mb, jnp.arange(n, dtype=jnp.int32)))
        grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)
        loss_aux = jax.tree.map(
            lambda a, s: a.astype(s.dtype), loss_aux, la_sds)
        return loss, loss_aux, grads

    # base_rng is an explicit argument, NOT a closure constant: a captured
    # live ArrayImpl const in a donated step breaks jax 0.9's C++ fastpath
    # on the second pipelined run in a process ("Execution supplied N
    # buffers but compiled program expected N+4")
    def _step(params, opt_state, aux, batch, step_idx, base_rng):
        rng = jax.random.fold_in(base_rng, step_idx) if use_rng else None
        if accum_mbs:
            loss, loss_aux, grads = _accum_loss_and_grads(
                params, batch, rng, aux)
        else:
            loss, loss_aux, grads = _loss_and_grads(params, batch, rng, aux)
        # megatron training_log metrics: grad norm always, params norm
        # opt-in (--log-params-norm); both computed inside the jit
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        if rc.log_params_norm:
            metrics["params_norm"] = optax.global_norm(params)
        if rc.log_num_zeros_in_grad:
            # float accumulator: int32 would overflow past ~2B zeros
            metrics["num_zeros"] = sum(
                jnp.sum(g == 0).astype(jnp.float32)
                for g in jax.tree.leaves(grads))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if post_step is not None:
            params = post_step(params)
        if aux_update is not None:
            aux = aux_update(aux, params, loss_aux)
        return params, opt_state, aux, metrics

    aux = aux_state
    if mesh is not None:
        # pin state output shardings to the input shardings — without this
        # XLA's per-call propagation can flip layouts between steps and
        # retrigger compilation (the pretrain_gpt.py lesson)
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())

        def _sh(x):
            s = getattr(x, "sharding", None)
            return s if isinstance(s, NamedSharding) else repl

        opt_state = jax.device_put(opt_state, jax.tree.map(_sh, opt_state))
        if aux is not None:
            aux = jax.device_put(aux, jax.tree.map(_sh, aux))
        # donate the train state: without donation XLA double-buffers
        # params+opt (a 1.3b-param model's bf16 state alone is 10.5 GB —
        # donation is what fits it on one 16G chip)
        step = jax.jit(_step, donate_argnums=(0, 1, 2), out_shardings=(
            jax.tree.map(_sh, params), jax.tree.map(_sh, opt_state),
            None if aux is None else jax.tree.map(_sh, aux), repl))
    else:
        step = jax.jit(_step, donate_argnums=(0, 1, 2))

    # eval step compiled once (megatron evaluate(), training.py:861).
    # Eval batches come ONLY from val_iter_factory: drawing them from
    # batch_iter would shift the training stream and break the
    # consumed-samples resume contract (checkpoints record i*batch_size).
    eval_step = None
    if val_iter_factory is not None:
        if eval_loss_fn is not None:
            eval_step = jax.jit(eval_loss_fn)
        elif aux_update is None:
            eval_step = jax.jit(lambda p, b: loss_fn(p, b, None))
        # aux entries (EMA-teacher losses) must pass an explicit
        # eval_loss_fn: the default would bake a stale aux into the jit
    if rc.eval_interval and eval_step is None and custom_eval is None:
        print(f"[{rc.name}] WARNING: --eval-interval set but this entry "
              "provides no validation data source / eval fn; skipping eval",
              flush=True)

    def _to_ckpt(p, o):
        """In-memory (possibly rearranged) layout -> the layout-independent
        checkpoint layout; identity without ckpt_transforms."""
        if ckpt_transforms is None:
            return p, o
        tags, to_ckpt, _ = ckpt_transforms
        p = jax.tree.map(to_ckpt, p, tags)
        if o is not None:
            o = optax.tree_map_params(tx, to_ckpt, o, tags)
        return p, o

    def _from_ckpt(p, o):
        if ckpt_transforms is None:
            return p, o
        tags, _, from_ckpt = ckpt_transforms
        p = jax.tree.map(from_ckpt, p, tags)
        if o is not None:
            o = optax.tree_map_params(tx, from_ckpt, o, tags)
        return p, o

    def _ckpt_state():
        p, o = _to_ckpt(params, None if rc.no_save_optim else opt_state)
        s = {"params": p}
        if o is not None:
            s["opt_state"] = o
        if aux is not None:
            s["aux"] = aux
        return s

    def _load_template():
        # loading always expects the full state (a --no-save-optim run can
        # only be resumed with --no-load-optim)
        s = {"params": params, "opt_state": opt_state}
        if aux is not None:
            s["aux"] = aux
        return s

    def _place_like(loaded, template):
        return jax.tree.map(
            lambda v, p: jax.device_put(
                jnp.asarray(v, dtype=p.dtype),
                p.sharding if isinstance(p, jax.Array) else None),
            loaded, template)

    def _params_only_load(root):
        """Restore the params subtree (and the aux subtree, when both the
        checkpoint and this run have one), re-placed on this run's
        shardings; the caller re-inits the optimizer (megatron
        --no-load-optim / --finetune model-only load). Aux is MODEL state
        (e.g. DINO's EMA teacher/center/schedule step), not optimizer
        state — dropping it on --no-load-optim would silently reset the
        distillation target."""
        from megatron_clip_tpu.checkpoints import load_params_subtree
        loaded, from_step = load_params_subtree(root)
        if jax.tree.structure(loaded) != jax.tree.structure(params):
            raise ValueError(f"params loaded from {root} do not match this "
                             "model's parameter tree")
        loaded_aux = None
        if aux is not None:
            try:
                raw_aux, _ = load_params_subtree(root, key="aux")
                loaded_aux = _place_like(raw_aux, aux)
            except KeyError:
                pass
        p, _ = _from_ckpt(_place_like(loaded, params), None)
        return p, loaded_aux, from_step

    def _meta(i):
        # `consumed` is the running (rampup-aware) sample count; before the
        # loop starts it is the step-derived default
        m = {"consumed_samples": consumed}
        if args_ns is not None:
            # args record backing --use-checkpoint-args (megatron saves the
            # full args namespace in the rank file, checkpointing.py:215)
            m["args"] = _json_safe_args(args_ns)
        return m

    start_step = 0
    if rc.resume and rc.save and latest_checkpoint_step(rc.save) is not None:
        if rc.no_load_optim:
            params, loaded_aux, start_step = _params_only_load(rc.save)
            aux = loaded_aux if loaded_aux is not None else aux
            opt_state = tx.init(params)
            print(f"[{rc.name}] resumed params-only from {rc.save} @ step "
                  f"{start_step} (--no-load-optim: fresh optimizer)",
                  flush=True)
        else:
            tree, meta, start_step = load_checkpoint(rc.save, _load_template())
            params, opt_state = _from_ckpt(tree["params"], tree["opt_state"])
            aux = tree.get("aux", aux)
            print(f"[{rc.name}] resumed from {rc.save} @ step {start_step} "
                  f"(consumed_samples={meta.get('consumed_samples', 0)})",
                  flush=True)
    elif rc.load:
        if rc.finetune:
            params, loaded_aux, from_step = _params_only_load(rc.load)
            if loaded_aux is not None:
                if isinstance(loaded_aux, dict) and "step" in loaded_aux:
                    # --finetune = fresh schedules: model-state aux (EMA
                    # teacher/center) restores, its schedule counter resets
                    loaded_aux = dict(loaded_aux,
                                      step=jnp.zeros_like(loaded_aux["step"]))
                aux = loaded_aux
            opt_state = tx.init(params)
            print(f"[{rc.name}] finetune init: params from {rc.load} "
                  f"@ step {from_step} (optimizer/iteration reset)",
                  flush=True)
        elif rc.no_load_optim:
            params, loaded_aux, start_step = _params_only_load(rc.load)
            aux = loaded_aux if loaded_aux is not None else aux
            opt_state = tx.init(params)
            print(f"[{rc.name}] loaded params-only {rc.load} @ step "
                  f"{start_step} (--no-load-optim: fresh optimizer)",
                  flush=True)
        else:
            tree, meta, start_step = load_checkpoint(rc.load, _load_template())
            params, opt_state = _from_ckpt(tree["params"], tree["opt_state"])
            aux = tree.get("aux", aux)
            print(f"[{rc.name}] loaded {rc.load} @ step {start_step} "
                  f"(continuing; saving to {rc.save})", flush=True)

    if rc.skip_train:
        # megatron --skip-train (training.py): validation only, no training.
        # The eval traces INSIDE the mesh context: sequence/context-parallel
        # sharding constraints silently no-op without an ambient mesh
        if eval_step is None:
            raise SystemExit("--skip-train needs a validation source "
                             "(this entry provides none)")
        import contextlib
        with (jax.sharding.set_mesh(mesh) if mesh is not None
              else contextlib.nullcontext()):
            vit = val_iter_factory()
            vals = [float(eval_step(params, jax.tree.map(jnp.asarray,
                                                         next(vit))))
                    for _ in range(rc.eval_iters)]
        v = float(np.mean(vals))
        print(f"[{rc.name}] --skip-train: val loss {v:.4f} over "
              f"{rc.eval_iters} batches", flush=True)
        return {"loss": v, "params": params, "aux": aux,
                "history": [], "val_loss": v}

    # --rampup-batch-size: effective-batch calculator (megatron
    # microbatches.py:83-144). Granularity = what the mesh batch axes and
    # the pipeline microbatch split require of the leading dim. Built
    # BEFORE the data stream is positioned: a ramped run's dataset position
    # is consumed SAMPLES (drawn exactly, megatron data_samplers.py), not
    # steps.
    rampup = None
    consumed = start_step * rc.batch_size
    if rc.micro_batch_size and rc.batch_size % rc.micro_batch_size:
        raise SystemExit(f"--batch-size {rc.batch_size} must be divisible "
                         f"by --micro-batch-size {rc.micro_batch_size}")
    if rc.rampup_batch_size is not None:
        import math
        from megatron_clip_tpu.training.microbatches import (
            build_num_microbatches_calculator)
        gran = 1
        if mesh is not None:
            gran = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        if rc.pp > 1:
            gran *= max(1, rc.num_microbatches)
        if rc.micro_batch_size and rc.pp == 1:
            # every ramped size must still split into whole microbatches
            gran = math.lcm(gran, rc.micro_batch_size)
        try:
            rampup = build_num_microbatches_calculator(
                rc.batch_size, 1, gran, rc.rampup_batch_size)
        except (ValueError, ZeroDivisionError) as e:
            raise SystemExit(
                f"--rampup-batch-size {rc.rampup_batch_size}: {e} (the "
                f"mesh batch axes / pipeline microbatch split require "
                f"multiples of {gran})") from e
        if start_step and (rc.save or rc.load):
            # a resumed rampup run restores the RAMPED consumed count (the
            # step-derived default undercounts only if metadata is absent)
            from megatron_clip_tpu.checkpoints import (
                load_checkpoint_metadata)
            try:
                consumed = int(load_checkpoint_metadata(
                    rc.save if rc.resume else rc.load).get(
                        "consumed_samples", consumed))
            except (FileNotFoundError, KeyError, ValueError):
                pass
        start, inc, _ = rc.rampup_batch_size
        n_sizes = (rc.batch_size - start) // inc + 1
        print(f"[{rc.name}] batch rampup {start} -> {rc.batch_size} "
              f"(+{inc}; up to {n_sizes} distinct step compilations)",
              flush=True)

    # Position the data stream. Without rampup a step consumes exactly one
    # source batch, so the position is start_step batches. With rampup the
    # position is `consumed` SAMPLES: seek whole source batches, then
    # discard the already-consumed rows of the next one — megatron's
    # consumed-samples law, sample-for-sample (microbatches.py:83-144).
    drawer = None
    if rampup is None:
        if callable(batch_iter):
            batch_iter = batch_iter(start_step)  # seekable factory: O(1)
        else:
            for _ in range(start_step):          # replay-and-discard
                next(batch_iter)
    else:
        src_batches, skip_rows = divmod(consumed, rc.batch_size)
        if callable(batch_iter):
            batch_iter = batch_iter(src_batches)
        else:
            for _ in range(src_batches):
                next(batch_iter)
        drawer = _BatchDrawer(batch_iter, rc.batch_size)
        drawer.skip_rows(skip_rows)

    writer = None
    if rc.tensorboard_dir:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(rc.tensorboard_dir)
        except ImportError:
            print(f"[{rc.name}] tensorboardX unavailable; skipping TB "
                  "logging", flush=True)

    import contextlib
    mesh_ctx = jax.sharding.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
    from megatron_clip_tpu.training.signals import sigterm_latch

    t0 = time.perf_counter()
    run_t0 = t0
    loss = None
    history = []
    win_samples = 0
    profiling = False
    last_step, exited_early = start_step, False
    last_custom_eval, last_custom_eval_step = None, -1
    with sigterm_latch() as term, mesh_ctx:
        for i in range(start_step + 1, rc.train_steps + 1):
            if rc.profile and i == rc.profile_step_start:
                # megatron --profile window (training.py:764-768
                # cudaProfilerStart/emit_nvtx -> jax.profiler trace)
                pdir = rc.profile_dir or rc.tensorboard_dir or "./profile"
                jax.profiler.start_trace(pdir)
                profiling = True
                print(f"[{rc.name}] profiler trace started -> {pdir}",
                      flush=True)
            gbs = rc.batch_size
            if rampup is not None:
                rampup.update(consumed)
                gbs = rampup.current_global_batch_size()
                batch = drawer.draw(gbs)  # exactly gbs samples, tail kept
            else:
                batch = next(batch_iter)
            batch = jax.tree.map(jnp.asarray, batch)
            params, opt_state, aux, metrics = step(params, opt_state, aux,
                                                   batch, jnp.int32(i),
                                                   base_rng)
            loss = metrics["loss"]
            last_step = i
            consumed += gbs
            win_samples += gbs
            if profiling and i >= rc.profile_step_end:
                # `>=` + the started flag: a resume or early exit must
                # neither call stop_trace with no active trace nor leave
                # one open
                float(metrics["loss"])  # drain the pipeline into the trace
                jax.profiler.stop_trace()
                profiling = False
                print(f"[{rc.name}] profiler trace stopped @ step {i}",
                      flush=True)
            if i % rc.log_interval == 0 or i == rc.train_steps:
                l = float(loss)
                history.append((i, l))
                dt = time.perf_counter() - t0
                ips = win_samples / dt
                win_samples = 0
                extra = (f" | {ips * rc.tokens_per_sample:.0f} tok/s"
                         if rc.tokens_per_sample else "")
                gn = float(metrics["grad_norm"])
                pn = (f" | params norm {float(metrics['params_norm']):.2f}"
                      if "params_norm" in metrics else "")
                if "num_zeros" in metrics:
                    pn += f" | num zeros {int(metrics['num_zeros'])}"
                print(f"[{rc.name}] step {i}/{rc.train_steps} | "
                      f"loss {l:.4f} | grad norm {gn:.3f}{pn} | "
                      f"{ips:.1f} samples/s{extra}",
                      flush=True)
                if writer is not None:
                    # megatron training_log TB scalars (training.py:503-698)
                    writer.add_scalar("train/loss", l, i)
                    writer.add_scalar("train/learning-rate",
                                      float(lr_sched(i)), i)
                    writer.add_scalar("train/grad-norm", gn, i)
                    if "params_norm" in metrics:
                        writer.add_scalar("train/params-norm",
                                          float(metrics["params_norm"]), i)
                    writer.add_scalar("train/samples-per-s", ips, i)
                t0 = time.perf_counter()
            if rc.save and rc.save_interval and i % rc.save_interval == 0:
                # async: training proceeds while Orbax serializes (device->
                # host snapshot happens inside the call); the tracker file
                # appears only after commit, and SIGTERM/exit/final saves
                # barrier on it (checkpoints/io.AsyncSaver)
                save_checkpoint(rc.save, i, _ckpt_state(), _meta(i),
                                block=False)
            if (rc.eval_interval and eval_step is not None
                    and i % rc.eval_interval == 0):
                vals = []
                vit = val_iter_factory()
                for _ in range(rc.eval_iters):
                    vals.append(float(eval_step(
                        params, jax.tree.map(jnp.asarray, next(vit)))))
                print(f"[{rc.name}] eval @ {i}: "
                      f"val loss {np.mean(vals):.4f}", flush=True)
                if writer is not None:
                    writer.add_scalar("val/loss", float(np.mean(vals)), i)
            if (rc.eval_interval and custom_eval is not None
                    and i % rc.eval_interval == 0):
                # entry-specific eval hook (e.g. DINO's weighted-kNN
                # monitor, pretrain_vision_dino.py loss_func eval branch)
                metrics_ce = custom_eval(params, aux, i)
                last_custom_eval, last_custom_eval_step = metrics_ce, i
                line = " ".join(f"{k} {v:.4f}"
                                for k, v in metrics_ce.items())
                print(f"[{rc.name}] eval @ {i}: {line}", flush=True)
                if writer is not None:
                    for k, v in metrics_ce.items():
                        writer.add_scalar(f"val/{k}", float(v), i)
            if term["flag"]:
                if rc.save and (not rc.save_interval
                                or i % rc.save_interval != 0):
                    save_checkpoint(rc.save, i, _ckpt_state(), _meta(i))
                if rc.save:
                    print(f"[{rc.name}] SIGTERM: saved checkpoint @ step "
                          f"{i}, exiting", flush=True)
                else:
                    print(f"[{rc.name}] SIGTERM: exiting @ step {i} "
                          "(no --save configured)", flush=True)
                exited_early = True
                break
            if rc.exit_duration_mins is not None and \
                    time.perf_counter() - run_t0 > rc.exit_duration_mins * 60:
                # megatron --exit-duration-in-mins (training.py:829-851):
                # save first, then stop cleanly mid-run
                if rc.save and (not rc.save_interval
                                or i % rc.save_interval != 0):
                    save_checkpoint(rc.save, i, _ckpt_state(), _meta(i))
                print(f"[{rc.name}] exiting at step {i}: "
                      f"--exit-duration-in-mins {rc.exit_duration_mins} "
                      "budget reached", flush=True)
                exited_early = True
                break
        if profiling:
            # early exit inside the profile window: close the trace so the
            # captured steps are not lost
            jax.profiler.stop_trace()
            profiling = False
            print(f"[{rc.name}] profiler trace stopped (early exit)",
                  flush=True)
        if rc.save and not exited_early \
                and (not rc.save_interval
                     or last_step % rc.save_interval != 0) \
                and last_step > start_step:
            save_checkpoint(rc.save, last_step, _ckpt_state(),
                            _meta(last_step))
    if writer is not None:
        writer.close()
    from megatron_clip_tpu.checkpoints.io import global_saver
    global_saver().wait()  # run_workload's contract: checkpoints durable
    return {"loss": float(loss) if loss is not None else None,
            "params": params, "aux": aux, "history": history,
            "last_step": last_step,
            "last_custom_eval": last_custom_eval,
            "last_custom_eval_step": last_custom_eval_step}
