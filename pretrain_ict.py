#!/usr/bin/env python
"""ICT (inverse cloze task) biencoder pretraining.

Reference: pretrain_ict.py + megatron/model/biencoder_model.py — a query
encoder and a context encoder trained with the in-batch retrieval objective
over (sentence, block) pairs produced by build_blocks_mapping
(data/bert_dataset.ICTDataset). Synthetic fallback pairs queries with their
own noisy copies so the objective is learnable without a corpus.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("ICT biencoder pretraining")
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--hidden-size", type=int, default=128)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--seq-length", type=int, default=64)
    p.add_argument("--vocab-size", type=int, default=30592)
    p.add_argument("--projection-dim", type=int, default=128)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-path", type=str, default=None,
                   help="sentence-level indexed corpus prefix")
    p.add_argument("--titles-data-path", type=str, default=None)
    p.add_argument("--query-in-block-prob", type=float, default=0.1,
                   help="probability the query sentence stays in its "
                        "evidence block (megatron --query-in-block-prob)")
    import argparse as _ap
    p.add_argument("--use-one-sent-docs", action=_ap.BooleanOptionalAction,
                   default=True,
                   help="allow single-sentence documents as blocks "
                        "(megatron --use-one-sent-docs)")
    p.add_argument("--split", type=str, default="969,30,1",
                   help="train/valid/test doc-split weights over --data-path "
                        "(megatron --split semantics)")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=1e-4, batch_size=16)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.models.bert import BertCfg
    from megatron_clip_tpu.models.biencoder import (
        BiencoderCfg, init_biencoder, ict_loss)
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload,
        vocab_size_from_tokenizer_args)

    tok_vocab = vocab_size_from_tokenizer_args(args)
    if tok_vocab is not None:
        args.vocab_size = tok_vocab

    cfg = BiencoderCfg(
        bert=BertCfg(num_layers=args.num_layers,
                     hidden_size=args.hidden_size, num_heads=args.num_heads,
                     vocab_size=args.vocab_size, seq_length=args.seq_length,
                     add_binary_head=False),
        projection_dim=args.projection_dim)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_biencoder(jax.random.PRNGKey(args.seed), cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"ICT biencoder {n/1e6:.1f}M params", flush=True)

    rc = runtime_cfg_from_args(args, "ict")
    if rc.pp > 1:
        raise SystemExit("ICT biencoder does not support pipeline "
                         "parallelism (two independent towers); use "
                         "tp/fsdp/dp")
    mesh, _ = build_workload_mesh(rc)
    specs = generic_param_specs(params)

    def _doc_split(index):
        from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
        from megatron_clip_tpu.data.gpt_dataset import train_valid_test_split
        n_docs = len(MMapIndexedDataset(args.data_path).doc_idx) - 1
        lo, hi = train_valid_test_split(args.split, n_docs)[index]
        if hi <= lo:
            raise SystemExit(f"--split {args.split!r} gives an empty range "
                             f"for split {index} ({n_docs} docs)")
        return lo, hi

    def batches(seed=args.seed, split_index=0, start_step=0):
        if args.data_path:
            from megatron_clip_tpu.data.bert_dataset import ICTDataset
            from megatron_clip_tpu.data.samplers import sampled_batches
            ds = ICTDataset(args.data_path,
                            args.titles_data_path or args.data_path,
                            max_seq_length=args.seq_length,
                            num_epochs=1000,
                            use_one_sent_blocks=args.use_one_sent_docs,
                            query_in_block_prob=args.query_in_block_prob,
                            seed=seed,
                            max_num_samples=args.train_steps * args.batch_size)
            # O(1) consumed-samples seek + --dataloader-type laws
            for b in sampled_batches(
                    ds, args.batch_size,
                    dataloader_type=getattr(args, "dataloader_type", None)
                    or "single",
                    consumed_samples=start_step * args.batch_size,
                    data_sharding=getattr(args, "data_sharding", True),
                    seed=seed):
                yield jnp.asarray(b["query"]), jnp.asarray(b["block"])
        else:
            # per-step keyed rng: resume seeks without replaying the stream
            step = start_step
            while True:
                step += 1
                rng = np.random.RandomState(
                    (seed * 2654435761 + step) % (2 ** 31))
                q = rng.randint(4, args.vocab_size,
                                (args.batch_size, args.seq_length))
                blk = q.copy()
                noise = rng.rand(*blk.shape) < 0.1
                blk[noise] = rng.randint(4, args.vocab_size, noise.sum())
                yield jnp.asarray(q, jnp.int32), jnp.asarray(blk, jnp.int32)

    def loss_fn(p, batch, step_rng):
        q, blk = batch
        loss, _acc = ict_loss(p, q, blk, cfg, compute_dtype=compute)
        return loss

    out = run_workload(params, loss_fn,
                       lambda start_step: batches(start_step=start_step),
                       rc, mesh=mesh,
                       param_specs=specs,
                       val_iter_factory=lambda: batches(args.seed + 7919,
                                                        split_index=1), args_ns=args)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
