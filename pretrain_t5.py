#!/usr/bin/env python
"""T5 span-corruption pretraining (reference: pretrain_t5.py)."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("T5 pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-decoder-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--encoder-seq-length", type=int, default=512)
    p.add_argument("--decoder-seq-length", type=int, default=128)
    p.add_argument("--vocab-size", type=int, default=30592)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def span_corrupt(rng, tokens, vocab_size, sentinel_base, noise=0.15,
                 mean_span=3, max_dec=128):
    """T5 span corruption (host numpy): replace spans with sentinels in the
    encoder input; decoder targets are sentinel + original span sequences."""
    b, s = tokens.shape
    enc = np.copy(tokens)
    dec_in = np.zeros((b, max_dec), np.int32)
    labels = np.zeros((b, max_dec), np.int32)
    mask = np.zeros((b, max_dec), np.float32)
    for r in range(b):
        pos, sent, out = 0, 0, []
        while pos < s and sent < 16:
            if rng.rand() < noise / mean_span:
                span = min(rng.randint(1, mean_span * 2), s - pos)
                out.extend([sentinel_base + sent] + list(tokens[r, pos:pos + span]))
                enc[r, pos] = sentinel_base + sent
                enc[r, pos + 1:pos + span] = 0
                pos += span
                sent += 1
            else:
                pos += 1
        out = out[:max_dec - 1]
        dec_in[r, 0] = 1  # BOS
        dec_in[r, 1:len(out) + 1] = out[:max_dec - 1]
        labels[r, :len(out)] = out
        labels[r, len(out)] = 2  # EOS
        mask[r, :len(out) + 1] = 1.0
    return enc, dec_in, labels, mask


def run(args):
    from megatron_clip_tpu.models.t5 import T5Cfg, init_t5, t5_loss
    from megatron_clip_tpu.training.simple_loop import simple_train

    cfg = T5Cfg(num_layers=args.num_layers,
                num_decoder_layers=args.num_decoder_layers,
                hidden_size=args.hidden_size, num_heads=args.num_heads,
                vocab_size=args.vocab_size,
                max_seq_length=args.encoder_seq_length,
                max_decode_length=args.decoder_seq_length)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_t5(jax.random.PRNGKey(args.seed), cfg)
    print(f"T5 {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M params",
          flush=True)
    rng = np.random.RandomState(args.seed)
    sentinel_base = args.vocab_size - 100

    def batches():
        while True:
            toks = rng.randint(4, sentinel_base,
                               (args.batch_size, args.encoder_seq_length)
                               ).astype(np.int32)
            enc, dec_in, labels, mask = span_corrupt(
                rng, toks, args.vocab_size, sentinel_base,
                max_dec=args.decoder_seq_length)
            yield tuple(map(jnp.asarray, (enc, dec_in, labels, mask)))

    def loss_fn(p, batch):
        enc, dec_in, labels, mask = batch
        return t5_loss(p, enc, dec_in, labels, mask, cfg,
                       compute_dtype=compute)

    out = simple_train(params, loss_fn, batches(), args.train_steps,
                       lr=args.lr, warmup=args.warmup,
                       log_interval=args.log_interval, name="t5")
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
