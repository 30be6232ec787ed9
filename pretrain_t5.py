#!/usr/bin/env python
"""T5 span-corruption pretraining (reference: pretrain_t5.py via
megatron/training.py:60 pretrain()). Trains on a real sentence-level
indexed corpus (--data-path, data/t5_dataset.py — the counterpart of
megatron/data/t5_dataset.py:1-257) or synthetic tokens; runs on the shared
mesh runtime (training/workload.py): dp x fsdp x tp, Orbax save/resume,
--eval-interval val loss."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("T5 pretraining")
    p.add_argument("--num-layers", "--encoder-num-layers",
                   type=int, default=12)
    p.add_argument("--num-decoder-layers",
                   "--decoder-num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", "--num-attention-heads",
                   type=int, default=12)
    p.add_argument("--kv-channels", type=int, default=None,
                   help="per-head dim (megatron --kv-channels); the T5 "
                        "decoder fixes it at hidden/heads, so other values "
                        "are rejected")
    p.add_argument("--ffn-hidden-size", type=int, default=None,
                   help="MLP hidden size (megatron --ffn-hidden-size; "
                        "default 4*hidden)")
    p.add_argument("--encoder-seq-length", type=int, default=512)
    p.add_argument("--decoder-seq-length", type=int, default=128)
    p.add_argument("--vocab-size", type=int, default=30592)
    p.add_argument("--vocab-extra-ids", type=int, default=100,
                   help="number of <extra_id_k> span sentinels; they occupy "
                        "the TOP ids of --vocab-size (megatron "
                        "--vocab-extra-ids appends them to the tokenizer "
                        "vocab — pass a --vocab-size that includes them)")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--data-path", type=str, default=None,
                   help="sentence-level indexed corpus prefix (.bin/.idx): "
                        "real span-corruption samples via data/t5_dataset.py")
    p.add_argument("--masked-lm-prob", "--mask-prob",
                   type=float, default=0.15)
    p.add_argument("--short-seq-prob", type=float, default=0.1)
    p.add_argument("--split", type=str, default="969,30,1",
                   help="train/valid/test doc-split weights over --data-path "
                        "(megatron --split semantics)")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=1e-4, weight_decay=0.01)
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
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.models.t5 import T5Cfg, init_t5, t5_loss
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload,
        vocab_size_from_tokenizer_args)

    # --vocab-file given: size the vocab like megatron's T5 tokenizer
    # (wordpiece + <extra_id_k> sentinels, padded)
    tok_vocab, real_vocab = vocab_size_from_tokenizer_args(
        args, extra_ids=args.vocab_extra_ids, with_real=True)
    if tok_vocab is not None:
        args.vocab_size = tok_vocab
    else:
        real_vocab = args.vocab_size

    if args.kv_channels not in (None, args.hidden_size // args.num_heads):
        raise SystemExit(
            f"--kv-channels {args.kv_channels}: the T5 decoder's "
            f"cross-attention blocks fix the head dim at hidden/heads = "
            f"{args.hidden_size // args.num_heads}")
    cfg = T5Cfg(num_layers=args.num_layers,
                num_decoder_layers=args.num_decoder_layers,
                hidden_size=args.hidden_size, num_heads=args.num_heads,
                vocab_size=args.vocab_size,
                mlp_ratio=(args.ffn_hidden_size / args.hidden_size
                           if args.ffn_hidden_size else 4.0),
                kv_channels=args.kv_channels,
                max_seq_length=args.encoder_seq_length,
                max_decode_length=args.decoder_seq_length)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_t5(jax.random.PRNGKey(args.seed), cfg)
    print(f"T5 {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M params",
          flush=True)

    rc = runtime_cfg_from_args(args, "t5")
    if rc.pp > 1:
        raise SystemExit("T5 pipeline parallelism is not supported: the "
                         "decoder's cross-attention needs the full encoder "
                         "output on every decoder stage (the reference uses "
                         "a dedicated encoder/decoder split rank, "
                         "schedules.py). Use tp/fsdp/dp.")
    mesh, _ = build_workload_mesh(rc)
    specs = generic_param_specs(params)

    # sentinels are the <extra_id_k> ids the TOKENIZER appended — the last
    # extra_ids rows of the REAL vocab, before any divisibility padding
    # (megatron tokenizer.py _T5 vocab build; padding rows hold no tokens)
    sentinel_base = real_vocab - args.vocab_extra_ids

    def _doc_split(index):
        from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
        from megatron_clip_tpu.data.gpt_dataset import train_valid_test_split
        n_docs = len(MMapIndexedDataset(args.data_path).doc_idx) - 1
        lo, hi = train_valid_test_split(args.split, n_docs)[index]
        if hi <= lo:
            raise SystemExit(f"--split {args.split!r} gives an empty range "
                             f"for split {index} ({n_docs} docs)")
        return lo, hi

    def batches(start_step=0, seed=args.seed, split_index=0):
        if args.data_path:
            from megatron_clip_tpu.data.t5_dataset import t5_batch_iterator
            yield from t5_batch_iterator(
                args.data_path, args.batch_size, start_step=start_step,
                dataloader_type=getattr(args, "dataloader_type", None)
                or "single",
                data_sharding=getattr(args, "data_sharding", True),
                sampler_seed=seed,
                documents=_doc_split(split_index),
                max_seq_length=args.encoder_seq_length,
                max_seq_length_dec=args.decoder_seq_length,
                masked_lm_prob=args.masked_lm_prob,
                short_seq_prob=args.short_seq_prob,
                vocab_size=real_vocab, num_epochs=1000,
                num_sentinels=args.vocab_extra_ids,
                seed=seed)
        else:
            # per-step keyed rng: resume seeks without replaying the stream
            step = start_step
            while True:
                step += 1
                rng = np.random.RandomState(
                    (seed * 2654435761 + step) % (2 ** 31))
                toks = rng.randint(4, sentinel_base,
                                   (args.batch_size, args.encoder_seq_length)
                                   ).astype(np.int32)
                enc, dec_in, labels, mask = span_corrupt(
                    rng, toks, args.vocab_size, sentinel_base,
                    max_dec=args.decoder_seq_length)
                yield {"enc_tokens": enc, "dec_tokens": dec_in,
                       "labels": labels, "loss_mask": mask}

    def loss_fn(p, batch, step_rng):
        return t5_loss(p, batch["enc_tokens"], batch["dec_tokens"],
                       batch["labels"], batch["loss_mask"], cfg,
                       enc_pad_mask=batch.get("enc_mask"),
                       compute_dtype=compute)

    out = run_workload(params, loss_fn, batches, rc, mesh=mesh,
                       param_specs=specs,
                       # real data: --split valid doc range; synthetic: a
                       # held-out seeded stream
                       val_iter_factory=lambda: batches(
                           seed=args.seed + 7919, split_index=1), args_ns=args)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
