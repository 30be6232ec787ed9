#!/usr/bin/env python
"""GPT pretraining entry point (the reference's pretrain_gpt.py workload on
a TPU mesh). Data: an indexed token dataset (--data-path, see
megatron_clip_tpu/data/indexed_dataset.py) or synthetic tokens.

Example:
  python pretrain_gpt.py --num-layers 12 --hidden-size 768 --num-heads 12 \\
      --seq-length 1024 --batch-size 32 --train-steps 100 \\
      --tensor-model-parallel-size 2 --fsdp-parallel-size 2
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("megatron_clip_tpu GPT pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--kv-heads", type=int, default=None)
    p.add_argument("--seq-length", type=int, default=1024)
    p.add_argument("--vocab-size", type=int, default=50304)
    p.add_argument("--position-embedding", choices=["learned", "rope"],
                   default="learned")
    p.add_argument("--swiglu", action="store_true")
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
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--weight-decay", type=float, default=0.1)
    p.add_argument("--grad-clip-norm", type=float, default=1.0)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--recompute-granularity",
                   choices=["none", "selective", "full"], default="none")
    p.add_argument("--quantize-matmuls", choices=["none", "int8"],
                   default="none",
                   help="int8 MXU matmuls for the MLP GEMMs w/ STE backward "
                        "(the TPU equivalent of the reference's optional "
                        "TransformerEngine fp8 path)")
    p.add_argument("--tensor-model-parallel-size", type=int, default=1)
    p.add_argument("--fsdp-parallel-size", type=int, default=1)
    p.add_argument("--pipeline-model-parallel-size", type=int, default=1)
    p.add_argument("--num-microbatches", type=int, default=1)
    p.add_argument("--virtual-pipeline-parallel-size", type=int, default=1)
    p.add_argument("--data-path", type=str, default=None,
                   help="indexed dataset prefix (.bin/.idx); synthetic if unset")
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--loss-seq-chunk", type=int, default=0,
                   help="compute lm-head + cross-entropy in sequence chunks "
                        "of this size (recomputed in backward): caps peak "
                        "logits memory at [B,chunk,V]")
    p.add_argument("--attention-dropout", type=float, default=0.0,
                   help="attention-prob dropout (megatron default 0.1)")
    p.add_argument("--hidden-dropout", type=float, default=0.0,
                   help="hidden/embedding dropout (megatron default 0.1)")
    return p.parse_args(argv)


def run(args):
    import optax
    from megatron_clip_tpu.config import ParallelCfg
    from megatron_clip_tpu.models.gpt import (
        GPTCfg, init_gpt, gpt_loss, gpt_param_specs)
    from megatron_clip_tpu.parallel import build_mesh
    from megatron_clip_tpu.parallel.mesh import STAGE
    from megatron_clip_tpu.parallel.sharding import make_sharding_tree
    from megatron_clip_tpu.training.optim import make_optimizer, cosine_lr

    cfg = GPTCfg(
        num_layers=args.num_layers, hidden_size=args.hidden_size,
        num_heads=args.num_heads, kv_heads=args.kv_heads,
        vocab_size=args.vocab_size, seq_length=args.seq_length,
        position_embedding=args.position_embedding, swiglu=args.swiglu,
        normalization=args.normalization,
        use_bias=not args.disable_bias_linear,
        num_experts=args.num_experts,
        tie_embeddings=not args.untie_embeddings_and_output_weights)
    compute_dtype = jnp.bfloat16 if args.precision in ("bf16", "amp_bf16") \
        else jnp.float32
    cp = args.context_parallel_size
    tcfg = cfg.transformer(remat=args.recompute_granularity,
                           sequence_parallel=args.sequence_parallel,
                           context_parallel=cp > 1,
                           quantize=args.quantize_matmuls,
                           attention_dropout=args.attention_dropout,
                           hidden_dropout=args.hidden_dropout)
    use_dropout = args.attention_dropout > 0 or args.hidden_dropout > 0
    if use_dropout and args.pipeline_model_parallel_size > 1:
        raise SystemExit("dropout is not yet threaded through the pipeline "
                         "schedule; use pp=1 with dropout")

    params = init_gpt(jax.random.PRNGKey(args.seed), cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"GPT {n/1e6:.1f}M params, seq {cfg.seq_length}", flush=True)

    devices = jax.devices()
    tp, pp, fsdp = (args.tensor_model_parallel_size,
                    args.pipeline_model_parallel_size, args.fsdp_parallel_size)
    if pp > 1 and args.num_experts:
        raise SystemExit("--pipeline-model-parallel-size > 1 is incompatible "
                         "with --num-experts (MoE aux loss is not threaded "
                         "through the pipeline schedule)")
    if cp > 1 and pp > 1:
        raise SystemExit("--context-parallel-size > 1 is incompatible with "
                         "--pipeline-model-parallel-size > 1 (the ring "
                         "attention axis is not threaded through the "
                         "pipeline schedule)")
    if cp > 1 and args.seq_length % cp != 0:
        raise SystemExit("--seq-length must be divisible by "
                         "--context-parallel-size")
    dp = max(1, len(devices) // (tp * pp * fsdp * cp))
    mesh = None
    layers_fn = None
    if dp * fsdp * tp * pp * cp > 1:
        mesh = build_mesh(ParallelCfg(dp=dp, fsdp=fsdp, tp=tp, pp=pp, cp=cp))
        stage_axis = STAGE if pp > 1 else None
        specs = gpt_param_specs(params, stage_axis=stage_axis)
        params = jax.device_put(params, make_sharding_tree(mesh, specs))
        if pp > 1:
            from megatron_clip_tpu.parallel.pipeline import make_pipelined_layers_fn
            layers_fn = make_pipelined_layers_fn(
                mesh, args.num_microbatches,
                args.virtual_pipeline_parallel_size)

    schedule = cosine_lr(args.lr, args.warmup, args.train_steps)
    tx = make_optimizer(params, schedule, weight_decay=args.weight_decay,
                        grad_clip_norm=args.grad_clip_norm, beta2=0.95,
                        eps=1e-8)
    opt_state = tx.init(params)

    if args.data_path:
        from megatron_clip_tpu.data.gpt_dataset import gpt_batch_iterator
        batches = gpt_batch_iterator(args.data_path, args.batch_size,
                                     args.seq_length, seed=args.seed)
    else:
        def synthetic():
            rng = np.random.RandomState(args.seed)
            while True:
                yield rng.randint(0, cfg.vocab_size,
                                  (args.batch_size, cfg.seq_length + 1)
                                  ).astype(np.int32)
        batches = synthetic()

    base_rng = jax.random.PRNGKey(args.seed + 1)

    def _step(params, opt_state, tokens, step_idx):
        rng = (jax.random.fold_in(base_rng, step_idx) if use_dropout
               else None)
        loss, grads = jax.value_and_grad(
            lambda p: gpt_loss(p, tokens, cfg, compute_dtype=compute_dtype,
                               tcfg=tcfg, layers_fn=layers_fn,
                               rng=rng,
                               loss_seq_chunk=args.loss_seq_chunk))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if mesh is not None:
        # Pin state outputs to their input shardings: otherwise XLA's
        # sharding propagation may pick different output shardings per call
        # (especially with the shard_map ring-attention axis in the graph),
        # retriggering compilation every step with flip-flopping layouts.
        from jax.sharding import NamedSharding
        repl = NamedSharding(mesh, jax.sharding.PartitionSpec())

        def _sh(x):
            s = x.sharding
            return s if isinstance(s, NamedSharding) else repl

        opt_state = jax.device_put(opt_state,
                                   jax.tree.map(_sh, opt_state))
        step = jax.jit(_step, out_shardings=(
            jax.tree.map(_sh, params), jax.tree.map(_sh, opt_state), repl))
    else:
        step = jax.jit(_step)

    import contextlib
    mesh_ctx = jax.sharding.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
    t0 = time.perf_counter()
    loss = None
    with mesh_ctx:
        for i in range(1, args.train_steps + 1):
            tokens = jnp.asarray(next(batches))
            params, opt_state, loss = step(params, opt_state, tokens,
                                           jnp.int32(i))
            if i % args.log_interval == 0 or i == args.train_steps:
                l = float(loss)
                dt = time.perf_counter() - t0
                tps = args.batch_size * args.seq_length * args.log_interval / dt
                print(f"step {i}/{args.train_steps} | lm loss {l:.4f} | "
                      f"ppl {np.exp(min(l, 20)):.1f} | {tps:.0f} tok/s",
                      flush=True)
                t0 = time.perf_counter()
    return {"loss": float(loss)}


if __name__ == "__main__":
    run(parse_args())
