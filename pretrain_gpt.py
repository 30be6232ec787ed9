#!/usr/bin/env python
"""GPT pretraining entry point (the reference's pretrain_gpt.py workload on
a TPU mesh, driven by megatron/training.py:60 pretrain() semantics). Data:
an indexed token dataset (--data-path, see
megatron_clip_tpu/data/indexed_dataset.py) or synthetic tokens. Runs on the
shared mesh runtime (training/workload.py): dp x fsdp x tp x pp x cp, Orbax
save/resume with consumed-samples (megatron/checkpointing.py:241,525),
--eval-interval val loss (training.py:861 evaluate()).

Example:
  python pretrain_gpt.py --num-layers 12 --hidden-size 768 --num-heads 12 \\
      --seq-length 1024 --batch-size 32 --train-steps 100 \\
      --tensor-model-parallel-size 2 --fsdp-parallel-size 2 \\
      --save /ckpt/gpt --save-interval 50 --resume
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("megatron_clip_tpu GPT pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", "--num-attention-heads",
                   type=int, default=12)
    p.add_argument("--kv-heads", "--num-query-groups", type=int,
                   default=None,
                   help="GQA kv-head count (megatron --num-query-groups;\n"
                        "--group-query-attention is implied when set)")
    p.add_argument("--group-query-attention",
                   action="store_true",
                   help="accepted for megatron CLI parity; GQA activates\n"
                        "when --num-query-groups/--kv-heads is set")
    p.add_argument("--ffn-hidden-size", type=int, default=None,
                   help="MLP hidden size (megatron --ffn-hidden-size;\n"
                        "default 4*hidden, or swiglu sizing)")
    p.add_argument("--kv-channels", type=int, default=None,
                   help="per-head projection dim when not hidden/heads "
                        "(megatron --kv-channels)")
    p.add_argument("--max-position-embeddings", type=int, default=None,
                   help="learned position-table length >= --seq-length "
                        "(megatron --max-position-embeddings)")
    p.add_argument("--seq-length", type=int, default=1024)
    p.add_argument("--vocab-size", type=int, default=50304)
    p.add_argument("--make-vocab-size-divisible-by", type=int, default=None,
                   help="pad --vocab-size up to a multiple (megatron "
                        "--make-vocab-size-divisible-by, x tp size there)")
    p.add_argument("--position-embedding", choices=["learned", "rope"],
                   default="learned")
    p.add_argument("--rotary-percent", type=float, default=1.0,
                   help="rotate only the first head_dim*percent channels "
                        "(megatron --rotary-percent)")
    p.add_argument("--rotary-seq-len-interpolation-factor", type=float,
                   default=None,
                   help="divide rope positions for linear context extension "
                        "(megatron flag of the same name)")
    p.add_argument("--swiglu", action="store_true")
    p.add_argument("--squared-relu", action="store_true",
                   help="relu(x)^2 MLP activation (megatron --squared-relu)")
    p.add_argument("--init-method-std", type=float, default=0.02,
                   help="stddev of weight init (megatron --init-method-std)")
    p.add_argument("--normalization", choices=["layernorm", "rmsnorm"],
                   default="layernorm")
    p.add_argument("--disable-bias-linear", action="store_true")
    p.add_argument("--untie-embeddings-and-output-weights", action="store_true")
    p.add_argument("--num-experts", type=int, default=0)
    p.add_argument("--sequence-parallel", action="store_true")
    p.add_argument("--context-parallel-size", type=int, default=1,
                   help="shard the sequence over a `context` mesh axis; "
                        "attention runs as a ppermute ring (the capability "
                        "megatron's --context-parallel-size plumbs but never "
                        "implements)")
    p.add_argument("--context-parallel-layout",
                   choices=["contiguous", "zigzag"], default="contiguous",
                   help="zigzag = megatron-LM's load-balanced causal CP "
                        "chunk assignment: tokens/targets/loss-mask are "
                        "zigzag-reordered on the host and position ids "
                        "thread through rope/pos-embed, so every ring rank "
                        "does ~equal causal work")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--params-dtype", choices=["fp32", "bf16"],
                   default="fp32",
                   help="bf16 = pure-bf16 params (open_CLIP pure_bf16 "
                        "semantics; halves param+grad HBM — with "
                        "--nu-dtype bf16 the 1.3b rung trains on one chip)")
    p.add_argument("--recompute-granularity",
                   choices=["none", "selective", "mlp", "full"], default="none")
    p.add_argument("--quantize-matmuls", choices=["none", "int8"],
                   default="none",
                   help="int8 MXU matmuls for the MLP GEMMs w/ STE backward "
                        "(the TPU equivalent of the reference's optional "
                        "TransformerEngine fp8 path)")
    p.add_argument("--data-path", type=str, default=None,
                   help="indexed dataset prefix (.bin/.idx); synthetic if unset")
    p.add_argument("--data-cache-path", type=str, default=None,
                   help="directory for the packing-index cache instead of "
                        "next to the data (megatron --data-cache-path)")
    p.add_argument("--split", type=str, default="969,30,1",
                   help="train/valid/test doc-split weights over --data-path "
                        "(megatron --split semantics); --eval-interval "
                        "validates on the valid range")
    p.add_argument("--loss-seq-chunk", type=int, default=0,
                   help="compute lm-head + cross-entropy in sequence chunks "
                        "of this size (recomputed in backward): caps peak "
                        "logits memory at [B,chunk,V]")
    p.add_argument("--fused-ce", action="store_true",
                   help="fused lm-head+CE Pallas kernel: logits never "
                        "materialize in HBM (ops/pallas/fused_ce.py; "
                        "TPU only)")
    p.add_argument("--eod-token", type=int, default=None,
                   help="end-of-document token id (megatron reads it from "
                        "the tokenizer; required by the document-boundary "
                        "flags below)")
    p.add_argument("--eod-mask-loss", action="store_true",
                   help="zero the loss at EOD input positions (megatron "
                        "--eod-mask-loss)")
    p.add_argument("--reset-position-ids", action="store_true",
                   help="restart position ids after each EOD (megatron "
                        "--reset-position-ids)")
    p.add_argument("--reset-attention-mask", action="store_true",
                   help="block attention across EOD boundaries (megatron "
                        "--reset-attention-mask)")
    p.add_argument("--attention-dropout", type=float, default=0.0,
                   help="attention-prob dropout (megatron default 0.1)")
    p.add_argument("--hidden-dropout", type=float, default=0.0,
                   help="hidden/embedding dropout (megatron default 0.1)")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=3e-4, weight_decay=0.1)
    return p.parse_args(argv)


def gpt_cfg_from_args(args):
    """GPTCfg from the parsed entry flags — shared with the serving entry
    (tools/run_text_generation_server.py) so every architecture flag a
    checkpoint was trained with also shapes the served model."""
    from megatron_clip_tpu.models.gpt import GPTCfg
    from megatron_clip_tpu.training.workload import \
        vocab_size_from_tokenizer_args

    # megatron sizes the embedding from --vocab-file/--merge-file when
    # given; --vocab-size (+ optional explicit padding) otherwise
    vocab = vocab_size_from_tokenizer_args(args)
    if vocab is None:
        vocab = args.vocab_size
        if args.make_vocab_size_divisible_by:
            d = args.make_vocab_size_divisible_by
            vocab = -(-vocab // d) * d
    return GPTCfg(
        num_layers=args.num_layers, hidden_size=args.hidden_size,
        num_heads=args.num_heads, kv_heads=args.kv_heads,
        kv_channels=args.kv_channels,
        max_position_embeddings=args.max_position_embeddings,
        mlp_ratio=(args.ffn_hidden_size / args.hidden_size
                   if args.ffn_hidden_size else 4.0),
        vocab_size=vocab, seq_length=args.seq_length,
        position_embedding=args.position_embedding,
        rotary_percent=args.rotary_percent,
        rope_interpolation=args.rotary_seq_len_interpolation_factor,
        swiglu=args.swiglu, squared_relu=args.squared_relu,
        normalization=args.normalization,
        use_bias=not args.disable_bias_linear,
        num_experts=args.num_experts,
        init_std=args.init_method_std,
        tie_embeddings=not args.untie_embeddings_and_output_weights)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.models.gpt import (
        init_gpt, gpt_loss, gpt_param_specs)
    from megatron_clip_tpu.parallel.mesh import STAGE
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload)

    cfg = gpt_cfg_from_args(args)
    vocab = cfg.vocab_size
    compute_dtype = jnp.bfloat16 if args.precision in ("bf16", "amp_bf16") \
        else jnp.float32
    cp = args.context_parallel_size
    cp_layout = args.context_parallel_layout
    tcfg = cfg.transformer(remat=args.recompute_granularity,
                           sequence_parallel=args.sequence_parallel,
                           context_parallel=cp > 1,
                           context_parallel_layout=cp_layout,
                           quantize=args.quantize_matmuls,
                           attention_dropout=args.attention_dropout,
                           hidden_dropout=args.hidden_dropout,
                           train=True)
    # eval uses per-token argmax MoE routing (megatron switch_mlp.py
    # not-self.training): sinkhorn is batch-dependent
    import dataclasses as _dc
    tcfg_eval = _dc.replace(tcfg, train=False)
    use_dropout = args.attention_dropout > 0 or args.hidden_dropout > 0
    if cp > 1 and args.seq_length % cp != 0:
        raise SystemExit("--seq-length must be divisible by "
                         "--context-parallel-size")
    if cp > 1 and cp_layout == "zigzag" and args.seq_length % (2 * cp) != 0:
        raise SystemExit("--seq-length must be divisible by 2x "
                         "--context-parallel-size for the zigzag layout")
    doc_flags = (args.eod_mask_loss or args.reset_position_ids
                 or args.reset_attention_mask)
    if doc_flags:
        if args.eod_token is None:
            raise SystemExit("--eod-mask-loss/--reset-position-ids/"
                             "--reset-attention-mask need --eod-token")
        if cp > 1:
            raise SystemExit("document-boundary flags do not compose with "
                             "--context-parallel-size > 1")
        # pp>1 + --reset-position-ids is supported: the pipeline schedules
        # microbatch the per-row [B, S] ids alongside the bias

    params = init_gpt(jax.random.PRNGKey(args.seed), cfg,
                      dtype=jnp.bfloat16 if args.params_dtype == "bf16"
                      else jnp.float32)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"GPT {n/1e6:.1f}M params, seq {cfg.seq_length}", flush=True)

    rc = runtime_cfg_from_args(args, "gpt")
    if args.adam_beta2 is None:
        rc.beta2 = 0.95      # the megatron GPT recipe default
    rc.tokens_per_sample = args.seq_length
    mesh, layers_fn = build_workload_mesh(rc, vpp_prearranged=True)
    ckpt_transforms = None
    if mesh is not None and rc.pp > 1 and rc.vpp > 1:
        # interleaved pipeline: place the stacked layers in vpp_arrange
        # physical order ONCE (stage s's contiguous shard = its round-robin
        # chunks) so the schedule reads weights with zero cross-stage
        # traffic; checkpoints stay logical via the transforms
        from megatron_clip_tpu.parallel.pipeline import vpp_arrange
        from megatron_clip_tpu.training.workload import vpp_ckpt_transforms
        ckpt_transforms = vpp_ckpt_transforms(params, "blocks", rc.pp, rc.vpp)
        params = dict(params,
                      blocks=vpp_arrange(params["blocks"], rc.pp, rc.vpp))
    specs = gpt_param_specs(params,
                            stage_axis=STAGE if rc.pp > 1 else None)

    def batches(start_step=0):
        if args.data_path:
            # O(1) seek: the sampler position is arithmetic on consumed
            # samples; no skipped batch is decoded (megatron
            # data_samplers.py consumed-samples fast-forward)
            from megatron_clip_tpu.data.gpt_dataset import gpt_batch_iterator
            yield from gpt_batch_iterator(
                args.data_path, args.batch_size,
                args.seq_length, seed=args.seed,
                split=args.split, split_index=0,
                cache_dir=args.data_cache_path,
                start_sample=start_step * args.batch_size,
                dataloader_type=getattr(args, "dataloader_type", None)
                or "single",
                data_sharding=getattr(args, "data_sharding", False))
        else:
            # per-step keyed rng: seekable without replaying the stream
            step = start_step
            while True:
                step += 1
                rng = np.random.RandomState(
                    (args.seed * 2654435761 + step) % (2 ** 31))
                yield rng.randint(0, cfg.vocab_size,
                                  (args.batch_size, cfg.seq_length + 1)
                                  ).astype(np.int32)

    def val_batches():
        # validation never touches the training stream (consumed-samples
        # resume contract); real data reads the --split valid doc range
        if args.data_path:
            from megatron_clip_tpu.data.gpt_dataset import gpt_batch_iterator
            return gpt_batch_iterator(args.data_path, args.batch_size,
                                      args.seq_length, seed=args.seed,
                                      split=args.split, split_index=1,
                                      cache_dir=args.data_cache_path)

        def synth():
            rng = np.random.RandomState(args.seed + 7919)
            while True:
                yield rng.randint(0, cfg.vocab_size,
                                  (args.batch_size, cfg.seq_length + 1)
                                  ).astype(np.int32)
        return synth()

    zigzag = cp > 1 and cp_layout == "zigzag"
    if zigzag:
        from megatron_clip_tpu.ops.ring_attention import zigzag_shard
        # global positions in zigzag array order: rope / learned pos-embed /
        # loss all see the true token positions even though the array is
        # chunk-permuted for ring load balance
        zig_pos = zigzag_shard(jnp.arange(args.seq_length, dtype=jnp.int32),
                               cp, axis=0)

    def loss_fn(p, tokens, rng, _tcfg=tcfg):
        if zigzag:
            # next-token shift in NATURAL order, then zigzag-reorder both
            # sides so (input i -> target i) pairs stay aligned per slot
            inputs = zigzag_shard(tokens[:, :-1], cp, axis=1)
            tgt = zigzag_shard(tokens[:, 1:], cp, axis=1)
            return gpt_loss(p, inputs, cfg, targets=tgt,
                            position_ids=zig_pos,
                            compute_dtype=compute_dtype, tcfg=_tcfg,
                            layers_fn=layers_fn, rng=rng,
                            fused_ce=args.fused_ce,
                            loss_seq_chunk=args.loss_seq_chunk)
        if doc_flags:
            # megatron get_ltor_masks_and_position_ids over the INPUT
            # tokens; loss mask / positions / attention isolation all
            # follow document boundaries in the packed stream
            from megatron_clip_tpu.models.gpt import \
                get_ltor_masks_and_position_ids
            inputs, tgt = tokens[:, :-1], tokens[:, 1:]
            ab, lm, pid = get_ltor_masks_and_position_ids(
                inputs, args.eod_token,
                reset_position_ids=args.reset_position_ids,
                reset_attention_mask=args.reset_attention_mask,
                eod_mask_loss=args.eod_mask_loss)
            return gpt_loss(p, inputs, cfg, targets=tgt, loss_mask=lm,
                            attn_bias=ab, position_ids=pid,
                            compute_dtype=compute_dtype, tcfg=_tcfg,
                            layers_fn=layers_fn, rng=rng,
                            fused_ce=args.fused_ce,
                            loss_seq_chunk=args.loss_seq_chunk)
        return gpt_loss(p, tokens, cfg, compute_dtype=compute_dtype,
                        tcfg=_tcfg, layers_fn=layers_fn, rng=rng,
                        fused_ce=args.fused_ce,
                        loss_seq_chunk=args.loss_seq_chunk)

    out = run_workload(params, loss_fn, batches, rc, mesh=mesh,
                       param_specs=specs, use_rng=use_dropout,
                       val_iter_factory=val_batches,
                       eval_loss_fn=lambda p, b: loss_fn(p, b, None, _tcfg=tcfg_eval),
                       args_ns=args, ckpt_transforms=ckpt_transforms)
    r = {"loss": out["loss"], "history": out["history"],
         "last_step": out.get("last_step")}
    if "val_loss" in out:
        r["val_loss"] = out["val_loss"]
    return r


if __name__ == "__main__":
    run(parse_args())
