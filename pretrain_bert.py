#!/usr/bin/env python
"""BERT masked-LM pretraining (reference: pretrain_bert.py via
megatron/training.py:60 pretrain()). Synthetic or indexed-dataset tokens
with on-the-fly 15% masking; runs on the shared mesh runtime
(training/workload.py): dp x fsdp x tp x pp, Orbax save/resume with
consumed-samples, --eval-interval val loss."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("BERT pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", "--num-attention-heads",
                   type=int, default=12)
    p.add_argument("--seq-length", type=int, default=512)
    p.add_argument("--vocab-size", type=int, default=30592)
    p.add_argument("--make-vocab-size-divisible-by", type=int, default=None,
                   help="pad --vocab-size up to a multiple (megatron "
                        "--make-vocab-size-divisible-by, x tp size there)")
    p.add_argument("--bert-no-binary-head", action="store_true",
                   help="train MLM only, no NSP head (megatron "
                        "--bert-no-binary-head)")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--attention-dropout", type=float, default=0.0)
    p.add_argument("--hidden-dropout", type=float, default=0.0)
    p.add_argument("--recompute-granularity",
                   choices=["none", "selective", "mlp", "full"], default="none")
    p.add_argument("--data-path", type=str, default=None,
                   help="sentence-level indexed corpus prefix (.bin/.idx, "
                        "items=sentences, doc boundaries): trains on real "
                        "next-sentence pairs via build_mapping")
    p.add_argument("--short-seq-prob", type=float, default=0.1)
    p.add_argument("--split", type=str, default="969,30,1",
                   help="train/valid/test doc-split weights over --data-path "
                        "(megatron --split semantics)")
    p.add_argument("--masked-lm-prob", "--mask-prob",
                   type=float, default=0.15)
    p.add_argument("--mask-id", type=int, default=3)
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=1e-4, weight_decay=0.01)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.models.bert import (
        BertCfg, init_bert, bert_loss, make_bert_masking)
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.parallel.mesh import STAGE
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload)

    from megatron_clip_tpu.training.workload import \
        vocab_size_from_tokenizer_args
    vocab, real_vocab = vocab_size_from_tokenizer_args(args, with_real=True)
    if vocab is None:
        real_vocab = args.vocab_size
        vocab = args.vocab_size
        if args.make_vocab_size_divisible_by:
            d = args.make_vocab_size_divisible_by
            vocab = -(-vocab // d) * d
    # model embedding = padded size; MLM random replacement / synthetic
    # tokens draw from the REAL vocab only — megatron samples replacements
    # from vocab_id_list (bert_dataset.py), never the padding rows
    args.vocab_size = real_vocab
    cfg = BertCfg(num_layers=args.num_layers, hidden_size=args.hidden_size,
                  num_heads=args.num_heads, vocab_size=vocab,
                  seq_length=args.seq_length,
                  add_binary_head=not args.bert_no_binary_head)
    tcfg = cfg.transformer(remat=args.recompute_granularity,
                           attention_dropout=args.attention_dropout,
                           hidden_dropout=args.hidden_dropout)
    use_rng = args.attention_dropout > 0 or args.hidden_dropout > 0
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_bert(jax.random.PRNGKey(args.seed), cfg)
    print(f"BERT {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M params",
          flush=True)

    rc = runtime_cfg_from_args(args, "bert")
    mesh, layers_fn = build_workload_mesh(rc, vpp_prearranged=True)
    ckpt_transforms = None
    if mesh is not None and rc.pp > 1 and rc.vpp > 1:
        # interleaved pipeline: zero-copy vpp_arrange physical placement
        # (same scheme as pretrain_gpt; checkpoints stay logical)
        from megatron_clip_tpu.parallel.pipeline import vpp_arrange
        from megatron_clip_tpu.training.workload import vpp_ckpt_transforms
        ckpt_transforms = vpp_ckpt_transforms(params, "blocks", rc.pp,
                                              rc.vpp)
        params = dict(params,
                      blocks=vpp_arrange(params["blocks"], rc.pp, rc.vpp))
    specs = generic_param_specs(
        params, stage_axis=STAGE if rc.pp > 1 else None)

    def _doc_split(index):
        from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
        from megatron_clip_tpu.data.gpt_dataset import train_valid_test_split
        n_docs = len(MMapIndexedDataset(args.data_path).doc_idx) - 1
        lo, hi = train_valid_test_split(args.split, n_docs)[index]
        if hi <= lo:
            raise SystemExit(f"--split {args.split!r} gives an empty range "
                             f"for split {index} ({n_docs} docs)")
        return lo, hi

    def masked_batches(seed=args.seed, split_index=0, start_step=0):
        if args.data_path:
            # real sentence-pair pretraining: NSP pairs + 80/10/10 masking
            # from a sentence-level indexed corpus (reference
            # bert_dataset.py via helpers build_mapping); O(1) seek via the
            # sampler laws (data/samplers.py, --dataloader-type honored)
            from megatron_clip_tpu.data.bert_dataset import (
                BertPairDataset, BertSpecialIds)
            from megatron_clip_tpu.data.samplers import sampled_batches
            ids = BertSpecialIds(mask=args.mask_id)
            ds = BertPairDataset(
                args.data_path, max_seq_length=args.seq_length,
                num_epochs=1000, short_seq_prob=args.short_seq_prob,
                masked_lm_prob=args.masked_lm_prob,
                vocab_size=args.vocab_size, seed=seed,
                special_ids=ids, documents=_doc_split(split_index),
                max_num_samples=args.train_steps * args.batch_size)
            for batch in sampled_batches(
                    ds, args.batch_size,
                    dataloader_type=getattr(args, "dataloader_type", None)
                    or "single",
                    consumed_samples=start_step * args.batch_size,
                    data_sharding=getattr(args, "data_sharding", True),
                    seed=seed):
                yield {"tokens": batch["tokens"],
                       "labels": batch["labels"].clip(min=0),
                       "loss_mask": batch["loss_mask"],
                       "is_next": batch["is_next"],
                       "token_types": batch["token_types"],
                       "pad_mask": batch["pad_mask"]}
        else:
            # per-step keyed rng: resume seeks without replaying the stream
            step = start_step
            while True:
                step += 1
                rng = np.random.RandomState(
                    (seed * 2654435761 + step) % (2 ** 31))
                toks = rng.randint(4, args.vocab_size,
                                   (args.batch_size, args.seq_length)
                                   ).astype(np.int32)
                masked, labels, mask = make_bert_masking(
                    rng, toks, args.mask_id, args.vocab_size)
                is_next = rng.randint(0, 2, (toks.shape[0],)).astype(np.int32)
                yield {"tokens": masked, "labels": labels, "loss_mask": mask,
                       "is_next": is_next}

    def loss_fn(p, batch, step_rng):
        return bert_loss(p, batch["tokens"], batch["labels"],
                         batch["loss_mask"], cfg,
                         is_next=batch.get("is_next"),
                         token_types=batch.get("token_types"),
                         pad_mask=batch.get("pad_mask"),
                         compute_dtype=compute, tcfg=tcfg,
                         layers_fn=layers_fn, rng=step_rng)

    out = run_workload(params, loss_fn,
                       lambda start_step: masked_batches(
                           start_step=start_step), rc, mesh=mesh,
                       param_specs=specs, use_rng=use_rng,
                       # real data: the --split valid doc range; synthetic:
                       # a held-out seeded stream
                       val_iter_factory=lambda: masked_batches(
                           args.seed + 7919, split_index=1), args_ns=args,
                       ckpt_transforms=ckpt_transforms)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
