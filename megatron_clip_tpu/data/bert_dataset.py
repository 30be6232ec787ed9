"""BERT sentence-pair and ICT datasets over sentence-level indexed corpora.

Replaces the reference's BertDataset / ICTDataset pipeline
(megatron/data/bert_dataset.py:183, ict_dataset.py:156,
dataset_utils.py:799 build_training_sample): the corpus is an
MMapIndexedDataset whose items are *sentences* with document boundaries in
`doc_idx`; the native `build_mapping` / `build_blocks_mapping` helpers
(data/native/helpers.cpp) enumerate sentence ranges per sample.

Host-side numpy only — batches feed the device through the normal loader.
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np

from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
from megatron_clip_tpu.data.native import build_mapping, build_blocks_mapping
from megatron_clip_tpu.models.bert import make_bert_masking


@dataclass(frozen=True)
class BertSpecialIds:
    cls: int = 101
    sep: int = 102
    mask: int = 103
    pad: int = 0


class BertPairDataset:
    """Next-sentence-pair masked-LM samples.

    Each sample: [CLS] A [SEP] B [SEP] padded to max_seq_length, where A/B
    are contiguous sentence runs from one document split at a random pivot;
    with p=0.5 the halves are swapped and is_next=0 (megatron
    dataset_utils.py build_training_sample semantics)."""

    def __init__(self, prefix: str, *, max_seq_length: int,
                 num_epochs: int = 1, max_num_samples: int = 2 ** 62,
                 short_seq_prob: float = 0.1, masked_lm_prob: float = 0.15,
                 vocab_size: int = 30522, seed: int = 1,
                 special_ids: Optional[BertSpecialIds] = None,
                 dataset: Optional[MMapIndexedDataset] = None,
                 documents=None):
        """`documents`: optional (lo, hi) doc range — megatron's
        train/valid/test split mechanism (the doc-boundary array is
        sliced, dataset_utils.py get_train_valid_test_split_)."""
        self.ds = dataset if dataset is not None else MMapIndexedDataset(prefix)
        sizes = self.ds.sizes
        docs = self.ds.doc_idx
        if documents is not None:
            lo, hi = documents
            docs = docs[lo:hi + 1]
        self.mapping = build_mapping(
            docs, sizes, num_epochs=num_epochs,
            max_num_samples=max_num_samples, max_seq_length=max_seq_length - 3,
            short_seq_prob=short_seq_prob, seed=seed)
        self.max_seq_length = max_seq_length
        self.masked_lm_prob = masked_lm_prob
        self.vocab_size = vocab_size
        self.seed = seed
        self.ids = special_ids or BertSpecialIds()

    def __len__(self):
        return len(self.mapping)

    def __getitem__(self, idx: int):
        start, end, target = (int(v) for v in self.mapping[idx])
        rng = np.random.RandomState((self.seed + idx) % (2 ** 31))
        sents = [np.asarray(self.ds[i], np.int64)
                 for i in range(start, end)]

        # split point: at least one sentence on each side
        pivot = rng.randint(1, len(sents)) if len(sents) > 1 else 1
        a = list(sents[:pivot])
        b = list(sents[pivot:]) if len(sents) > 1 else [sents[0]]
        is_next = 1
        if len(sents) > 1 and rng.random_sample() < 0.5:
            a, b = b, a
            is_next = 0
        a = np.concatenate(a) if a else np.zeros(0, np.int64)
        b = np.concatenate(b) if b else np.zeros(0, np.int64)

        # truncate to the target length (random front/back pops, megatron
        # dataset_utils.truncate_segments)
        budget = min(target, self.max_seq_length - 3)
        a, b = list(a), list(b)
        while len(a) + len(b) > budget:
            side = a if len(a) > len(b) else b
            if rng.random_sample() < 0.5:
                side.pop(0)
            else:
                side.pop()

        ids = self.ids
        tokens = np.asarray([ids.cls] + a + [ids.sep] + b + [ids.sep],
                            np.int32)
        token_types = np.asarray([0] * (len(a) + 2) + [1] * (len(b) + 1),
                                 np.int32)
        masked, labels, loss_mask = make_bert_masking(
            rng, tokens[None], ids.mask, self.vocab_size,
            self.masked_lm_prob)
        masked, labels, loss_mask = masked[0], labels[0], loss_mask[0]
        # specials (cls/sep) must never be masked
        special = (tokens == ids.cls) | (tokens == ids.sep)
        masked[special] = tokens[special]
        loss_mask[special] = 0.0

        n = self.max_seq_length
        out = {
            "tokens": np.full(n, ids.pad, np.int32),
            "labels": np.full(n, -1, np.int32),
            "loss_mask": np.zeros(n, np.float32),
            "token_types": np.zeros(n, np.int32),
            "pad_mask": np.zeros(n, np.float32),
            "is_next": np.int32(is_next),
        }
        L = len(tokens)
        out["tokens"][:L] = masked
        out["labels"][:L] = labels
        out["loss_mask"][:L] = loss_mask
        out["token_types"][:L] = token_types
        out["pad_mask"][:L] = 1.0
        return out


class ICTDataset:
    """Inverse-cloze-task samples (megatron/data/ict_dataset.py:156): the
    query is one random sentence from a block; the context is the document
    title + the full block (with the query sentence removed with p=0.9)."""

    def __init__(self, prefix: str, titles_prefix: str, *,
                 max_seq_length: int = 256, num_epochs: int = 1,
                 max_num_samples: int = 2 ** 62, seed: int = 1,
                 query_in_block_prob: float = 0.1,
                 use_one_sent_blocks: bool = False,
                 dataset: Optional[MMapIndexedDataset] = None,
                 titles: Optional[MMapIndexedDataset] = None,
                 documents=None):
        self.ds = dataset if dataset is not None else MMapIndexedDataset(prefix)
        self.titles = titles if titles is not None \
            else MMapIndexedDataset(titles_prefix)
        title_sizes = self.titles.sizes
        # (lo, hi) doc-range split: mapping doc ids become slice-relative,
        # so titles are sliced too and __getitem__ re-offsets by _doc_base
        self._doc_base = 0
        doc_idx = self.ds.doc_idx
        if documents is not None:
            lo, hi = documents
            self._doc_base = lo
            doc_idx = doc_idx[lo:hi + 1]
            title_sizes = title_sizes[lo:hi]
        self.mapping = build_blocks_mapping(
            doc_idx, self.ds.sizes, title_sizes,
            num_epochs=num_epochs, max_num_samples=max_num_samples,
            max_seq_length=max_seq_length - 2, seed=seed,
            use_one_sent_blocks=use_one_sent_blocks)
        self.max_seq_length = max_seq_length
        self.seed = seed
        self.query_in_block_prob = query_in_block_prob

    def __len__(self):
        return len(self.mapping)

    def __getitem__(self, idx: int):
        start, end, doc, block_id = (int(v) for v in self.mapping[idx])
        rng = np.random.RandomState((self.seed + idx) % (2 ** 31))
        sents = [np.asarray(self.ds[i], np.int64) for i in range(start, end)]
        q = rng.randint(0, len(sents))
        query = sents[q]
        keep_query = rng.random_sample() < self.query_in_block_prob
        block_sents = sents if keep_query else \
            [s for i, s in enumerate(sents) if i != q] or sents
        title = np.asarray(self.titles[self._doc_base + doc], np.int64)
        block = np.concatenate([title] + block_sents)

        def pad(x):
            x = x[: self.max_seq_length]
            out = np.zeros(self.max_seq_length, np.int32)
            out[: len(x)] = x
            return out

        return {
            "query": pad(query),
            "block": pad(block),
            "doc_idx": np.int32(self._doc_base + doc),
            "block_idx": np.int32(block_id),
        }
