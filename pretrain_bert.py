#!/usr/bin/env python
"""BERT masked-LM pretraining (reference: pretrain_bert.py). Synthetic or
indexed-dataset tokens with on-the-fly 15% masking."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("BERT pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--seq-length", type=int, default=512)
    p.add_argument("--vocab-size", type=int, default=30592)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-path", type=str, default=None,
                   help="sentence-level indexed corpus prefix (.bin/.idx, "
                        "items=sentences, doc boundaries): trains on real "
                        "next-sentence pairs via build_mapping")
    p.add_argument("--short-seq-prob", type=float, default=0.1)
    p.add_argument("--masked-lm-prob", type=float, default=0.15)
    p.add_argument("--mask-id", type=int, default=3)
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.models.bert import (
        BertCfg, init_bert, bert_loss, make_bert_masking)
    from megatron_clip_tpu.training.simple_loop import simple_train

    cfg = BertCfg(num_layers=args.num_layers, hidden_size=args.hidden_size,
                  num_heads=args.num_heads, vocab_size=args.vocab_size,
                  seq_length=args.seq_length)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_bert(jax.random.PRNGKey(args.seed), cfg)
    print(f"BERT {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M params",
          flush=True)

    rng = np.random.RandomState(args.seed)

    def masked_batches():
        if args.data_path:
            # real sentence-pair pretraining: NSP pairs + 80/10/10 masking
            # from a sentence-level indexed corpus (reference
            # bert_dataset.py via helpers build_mapping)
            from megatron_clip_tpu.data.bert_dataset import (
                BertPairDataset, BertSpecialIds)
            ids = BertSpecialIds(mask=args.mask_id)
            ds = BertPairDataset(
                args.data_path, max_seq_length=args.seq_length,
                num_epochs=1000, short_seq_prob=args.short_seq_prob,
                masked_lm_prob=args.masked_lm_prob,
                vocab_size=args.vocab_size, seed=args.seed,
                special_ids=ids,
                max_num_samples=args.train_steps * args.batch_size)
            i = 0
            while True:
                rows = [ds[(i + j) % len(ds)] for j in range(args.batch_size)]
                i += args.batch_size
                batch = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
                yield (jnp.asarray(batch["tokens"]),
                       jnp.asarray(batch["labels"].clip(min=0)),
                       jnp.asarray(batch["loss_mask"]),
                       jnp.asarray(batch["is_next"]),
                       jnp.asarray(batch["token_types"]),
                       jnp.asarray(batch["pad_mask"]))
        else:
            while True:
                toks = rng.randint(4, args.vocab_size,
                                   (args.batch_size, args.seq_length)
                                   ).astype(np.int32)
                masked, labels, mask = make_bert_masking(
                    rng, toks, args.mask_id, args.vocab_size)
                is_next = rng.randint(0, 2, (toks.shape[0],)).astype(np.int32)
                yield (jnp.asarray(masked), jnp.asarray(labels),
                       jnp.asarray(mask), jnp.asarray(is_next), None, None)

    def loss_fn(p, batch):
        masked, labels, mask, is_next, token_types, pad_mask = batch
        return bert_loss(p, masked, labels, mask, cfg, is_next=is_next,
                         token_types=token_types, pad_mask=pad_mask,
                         compute_dtype=compute)

    out = simple_train(params, loss_fn, masked_batches(), args.train_steps,
                       lr=args.lr, warmup=args.warmup,
                       log_interval=args.log_interval, name="bert")
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
