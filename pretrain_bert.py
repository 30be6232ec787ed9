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
    p.add_argument("--data-path", type=str, default=None)
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

    def batches():
        while True:
            if args.data_path:
                from megatron_clip_tpu.data.gpt_dataset import gpt_batch_iterator
                it = gpt_batch_iterator(args.data_path, args.batch_size,
                                        args.seq_length - 1, seed=args.seed)
                for b in it:
                    toks = b[:, :args.seq_length]
                    yield toks
            else:
                yield rng.randint(4, args.vocab_size,
                                  (args.batch_size, args.seq_length)).astype(np.int32)

    def masked_batches():
        for toks in batches():
            masked, labels, mask = make_bert_masking(rng, toks, args.mask_id,
                                                     args.vocab_size)
            is_next = rng.randint(0, 2, (toks.shape[0],)).astype(np.int32)
            yield (jnp.asarray(masked), jnp.asarray(labels), jnp.asarray(mask),
                   jnp.asarray(is_next))

    def loss_fn(p, batch):
        masked, labels, mask, is_next = batch
        return bert_loss(p, masked, labels, mask, cfg, is_next=is_next,
                         compute_dtype=compute)

    out = simple_train(params, loss_fn, masked_batches(), args.train_steps,
                       lr=args.lr, warmup=args.warmup,
                       log_interval=args.log_interval, name="bert")
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
