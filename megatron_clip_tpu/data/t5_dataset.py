"""T5 span-corruption dataset over a real indexed corpus.

The reference's T5Dataset (megatron/data/t5_dataset.py:1-257) draws
sentence runs from the indexed corpus via the sample mapping
(dataset_utils.get_samples_mapping -> helpers build_mapping), applies
masked-span prediction with sentinel tokens, and emits padded
encoder/decoder tensors. This is the same contract built on the TPU
stack's native build_mapping (data/native):

  sample = sentences[start:end] truncated to target_seq_length
  spans   ~ geometric(mean 3), masked_lm_prob of tokens covered
  encoder = tokens with each span replaced by ONE sentinel id
  decoder_in  = [BOS] s0 span0... s1 span1... (teacher forcing)
  labels      = s0 span0... s1 span1... [EOS]
  masks: enc pad mask, dec causal+pad handled by the model; loss_mask on
  the real decoder positions.

Everything is deterministic per (seed, idx) — resume-safe.
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np

from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
from megatron_clip_tpu.data.native import build_mapping


@dataclass(frozen=True)
class T5SpecialIds:
    pad: int = 0
    bos: int = 1
    eos: int = 2


class T5Dataset:
    """Span-corruption samples from a sentence-level indexed corpus."""

    def __init__(self, prefix: str, *, max_seq_length: int = 512,
                 max_seq_length_dec: int = 128,
                 masked_lm_prob: float = 0.15, mean_noise_span: float = 3.0,
                 num_epochs: int = 1, max_num_samples: int = 2 ** 62,
                 short_seq_prob: float = 0.1, vocab_size: int = 30592,
                 num_sentinels: int = 100, seed: int = 1,
                 special_ids: Optional[T5SpecialIds] = None,
                 dataset: Optional[MMapIndexedDataset] = None,
                 documents=None):
        self.ds = dataset if dataset is not None else MMapIndexedDataset(prefix)
        doc_idx = self.ds.doc_idx
        if documents is not None:          # (lo, hi) doc-range split
            lo, hi = documents
            doc_idx = doc_idx[lo:hi + 1]
        self.mapping = build_mapping(
            doc_idx, self.ds.sizes, num_epochs=num_epochs,
            max_num_samples=max_num_samples,
            max_seq_length=max_seq_length - 2,
            short_seq_prob=short_seq_prob, seed=seed, min_num_sent=1)
        self.max_seq_length = max_seq_length
        self.max_seq_length_dec = max_seq_length_dec
        self.masked_lm_prob = masked_lm_prob
        self.mean_noise_span = mean_noise_span
        self.vocab_size = vocab_size
        # sentinels occupy the top of the vocab (reference tokenizer
        # additional_special_tokens <extra_id_k>)
        self.sentinel_base = vocab_size - num_sentinels
        self.num_sentinels = num_sentinels
        self.seed = seed
        self.ids = special_ids or T5SpecialIds()

    def __len__(self):
        return len(self.mapping)

    def __getitem__(self, idx: int):
        start, end, target = (int(v) for v in self.mapping[idx])
        rng = np.random.RandomState((self.seed + idx) % (2 ** 31))
        toks = np.concatenate([np.asarray(self.ds[i], np.int64)
                               for i in range(start, end)])
        budget = min(target, self.max_seq_length - 2, len(toks))
        toks = toks[:budget].astype(np.int32)

        # choose non-overlapping spans covering ~masked_lm_prob of tokens,
        # geometric lengths with the configured mean (reference
        # create_masked_lm_predictions ngram sampling, simplified to the
        # published T5 recipe)
        n = len(toks)
        n_mask = max(1, int(round(n * self.masked_lm_prob)))
        spans = []          # (start, length)
        covered = np.zeros(n, bool)
        tries = 0
        total = 0
        while total < n_mask and tries < 10 * n and \
                len(spans) < self.num_sentinels:
            tries += 1
            length = min(
                max(1, int(rng.geometric(1.0 / self.mean_noise_span))),
                n_mask - total, n)
            s0 = rng.randint(0, max(1, n - length + 1))
            if covered[max(0, s0 - 1):s0 + length + 1].any():
                continue    # keep spans non-adjacent so sentinels separate
            covered[s0:s0 + length] = True
            spans.append((s0, length))
            total += length
        spans.sort()

        ids = self.ids
        enc, dec = [], []
        pos = 0
        for k, (s0, length) in enumerate(spans):
            enc.extend(toks[pos:s0])
            sentinel = self.sentinel_base + k
            enc.append(sentinel)
            dec.append(sentinel)
            dec.extend(toks[s0:s0 + length])
            pos = s0 + length
        enc.extend(toks[pos:])

        enc = np.asarray(enc[:self.max_seq_length], np.int32)
        if len(dec) > self.max_seq_length_dec - 1:
            # megatron t5_dataset.py asserts this invariant; silently
            # truncating would cut targets mid-span while the encoder
            # keeps sentinels for them (systematic data corruption)
            raise ValueError(
                f"decoder stream needs {len(dec) + 1} tokens > "
                f"--decoder-seq-length {self.max_seq_length_dec}: raise it "
                f"or lower --masked-lm-prob (~{self.masked_lm_prob} of "
                f"--encoder-seq-length {self.max_seq_length} plus one "
                "sentinel per span must fit)")
        dec_in = np.asarray([ids.bos] + dec, np.int32)
        labels = np.asarray(dec + [ids.eos], np.int32)

        se, sd = self.max_seq_length, self.max_seq_length_dec
        out = {
            "enc_tokens": np.full(se, ids.pad, np.int32),
            "dec_tokens": np.full(sd, ids.pad, np.int32),
            "labels": np.full(sd, ids.pad, np.int32),
            "loss_mask": np.zeros(sd, np.float32),
            "enc_mask": np.zeros(se, np.float32),
        }
        out["enc_tokens"][:len(enc)] = enc
        out["dec_tokens"][:len(dec_in)] = dec_in
        out["labels"][:len(labels)] = labels
        out["loss_mask"][:len(labels)] = 1.0
        out["enc_mask"][:len(enc)] = 1.0
        return out


def t5_batch_iterator(prefix: str, batch_size: int, *, start_step: int = 0,
                      dataloader_type: str = "single",
                      data_sharding: bool = True, sampler_seed: int = 0,
                      **kw):
    """Yield dict batches; `start_step` seeks O(1) (consumed-samples
    resume). `dataloader_type` follows megatron --dataloader-type
    (data/samplers.py laws)."""
    from megatron_clip_tpu.data.samplers import sampled_batches
    ds = T5Dataset(prefix, **kw)
    yield from sampled_batches(
        ds, batch_size, dataloader_type=dataloader_type,
        consumed_samples=start_step * batch_size,
        data_sharding=data_sharding, seed=sampler_seed)
