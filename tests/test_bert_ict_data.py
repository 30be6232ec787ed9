"""BERT sentence-pair / ICT dataset tests: native vs numpy builder parity
and sample invariants (reference surface: megatron/data/helpers.cpp
build_mapping/build_blocks_mapping + bert_dataset.py + ict_dataset.py)."""
import numpy as np
import pytest

from megatron_clip_tpu.data.indexed_dataset import (
    MMapIndexedDataset, MMapIndexedDatasetBuilder)
from megatron_clip_tpu.data.native import (
    build_mapping, build_blocks_mapping, _build_mapping_np,
    _build_blocks_mapping_np, native_available)
from megatron_clip_tpu.data.bert_dataset import (
    BertPairDataset, ICTDataset, BertSpecialIds)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("bertdata")
    rng = np.random.RandomState(0)
    prefix = str(d / "sent")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    tprefix = str(d / "titles")
    tb = MMapIndexedDatasetBuilder(tprefix, dtype=np.int32)
    for _doc in range(20):
        for _s in range(rng.randint(1, 7)):
            b.add_item(rng.randint(200, 1000, size=rng.randint(3, 30)
                                   ).astype(np.int32))
        b.end_document()
        tb.add_item(rng.randint(200, 1000, size=rng.randint(2, 6)
                                ).astype(np.int32))
        tb.end_document()
    b.finalize()
    tb.finalize()
    return prefix, tprefix


def test_build_mapping_native_matches_numpy(corpus):
    prefix, _ = corpus
    ds = MMapIndexedDataset(prefix)
    kw = dict(num_epochs=3, max_num_samples=10 ** 6, max_seq_length=64,
              short_seq_prob=0.1, seed=7)
    got = build_mapping(ds.doc_idx, ds.sizes, **kw)
    want = _build_mapping_np(np.asarray(ds.doc_idx, np.int64),
                             np.asarray(ds.sizes, np.int32),
                             kw["num_epochs"], kw["max_num_samples"],
                             kw["max_seq_length"], kw["short_seq_prob"],
                             kw["seed"], 2)
    assert len(got) > 0
    if native_available():
        np.testing.assert_array_equal(got, want)
    # invariants: ranges are valid, >= 2 sentences, targets within bounds
    assert (got[:, 1] > got[:, 0]).all()
    assert (got[:, 1] - got[:, 0] >= 1).all()
    assert (got[:, 2] >= 2).all() and (got[:, 2] <= 64).all()


def test_build_blocks_mapping_native_matches_numpy(corpus):
    prefix, tprefix = corpus
    ds = MMapIndexedDataset(prefix)
    titles = MMapIndexedDataset(tprefix)
    kw = dict(num_epochs=2, max_num_samples=10 ** 6, max_seq_length=64,
              seed=5, use_one_sent_blocks=True)
    got = build_blocks_mapping(ds.doc_idx, ds.sizes, titles.sizes, **kw)
    want = _build_blocks_mapping_np(
        np.asarray(ds.doc_idx, np.int64), np.asarray(ds.sizes, np.int32),
        np.asarray(titles.sizes, np.int32), 2, 10 ** 6, 64, 5, True)
    assert len(got) > 0
    if native_available():
        np.testing.assert_array_equal(got, want)
    n_docs = len(ds.doc_idx) - 1
    assert (got[:, 2] >= 0).all() and (got[:, 2] < n_docs).all()


def test_bert_pair_dataset_samples(corpus):
    prefix, _ = corpus
    ids = BertSpecialIds()
    ds = BertPairDataset(prefix, max_seq_length=64, num_epochs=1,
                         vocab_size=1000, seed=3)
    assert len(ds) > 0
    saw_not_next = saw_next = False
    for i in range(min(len(ds), 40)):
        s = ds[i]
        toks, types, pm = s["tokens"], s["token_types"], s["pad_mask"]
        L = int(pm.sum())
        assert toks.shape == (64,)
        assert toks[0] == ids.cls
        # reconstruct the pre-masking tokens (masked positions carry labels)
        orig = np.where(s["loss_mask"] > 0, s["labels"], toks)
        sep_pos = np.where(orig[:L] == ids.sep)[0]
        assert len(sep_pos) == 2 and sep_pos[1] == L - 1
        # token types: 0 through first SEP, 1 after
        assert (types[:sep_pos[0] + 1] == 0).all()
        assert (types[sep_pos[0] + 1:L] == 1).all()
        # masked positions carry labels; others may be -1
        lm = s["loss_mask"][:L]
        assert ((s["labels"][:L] >= 0) | (lm == 0)).all()
        # specials never masked
        assert lm[0] == 0 and lm[sep_pos[0]] == 0 and lm[sep_pos[1]] == 0
        saw_not_next |= s["is_next"] == 0
        saw_next |= s["is_next"] == 1
    assert saw_next and saw_not_next


def test_ict_dataset_samples(corpus):
    prefix, tprefix = corpus
    ds = ICTDataset(prefix, tprefix, max_seq_length=64, num_epochs=1,
                    use_one_sent_blocks=True, seed=2)
    assert len(ds) > 0
    for i in range(min(len(ds), 20)):
        s = ds[i]
        assert s["query"].shape == (64,) and s["block"].shape == (64,)
        assert s["query"].any() and s["block"].any()
        assert 0 <= s["doc_idx"] < 20


def test_doc_range_split_isolation(tmp_path):
    """documents=(lo, hi) restricts BERT/ICT/T5 samples to the split's
    documents (megatron get_train_valid_test_split_ mechanism): the val
    stream never contains training-range tokens."""
    from megatron_clip_tpu.data.t5_dataset import T5Dataset, T5SpecialIds

    prefix = str(tmp_path / "corp")
    tprefix = str(tmp_path / "titles")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    tb = MMapIndexedDatasetBuilder(tprefix, dtype=np.int32)
    for d in range(10):
        tok = 200 + d  # distinct per-doc value, clear of special ids
        #              (BertSpecialIds cls=101/sep=102)
        for _s in range(4):
            b.add_item(np.full(8, tok, np.int32))
        b.end_document()
        tb.add_item(np.full(3, tok, np.int32))
        tb.end_document()
    b.finalize()
    tb.finalize()

    def content(sample_tokens):
        return {int(t) for t in np.asarray(sample_tokens) if t >= 200}

    train = BertPairDataset(prefix, max_seq_length=32, num_epochs=2,
                            vocab_size=1024, seed=0, documents=(0, 8))
    val = BertPairDataset(prefix, max_seq_length=32, num_epochs=2,
                          vocab_size=1024, seed=0, documents=(8, 10))
    def original(sample):
        # reconstruct pre-masking content: labels hold the true token at
        # every masked position (incl. random replacements, which can be
        # ANY vocab id and must not be read as document content)
        toks, labels = sample["tokens"], sample["labels"]
        return content(np.where(labels > 0, labels, toks))

    tr_tokens = set().union(*(original(train[i])
                              for i in range(len(train))))
    va_tokens = set().union(*(original(val[i]) for i in range(len(val))))
    doc_vals = set(range(200, 210))
    assert tr_tokens & doc_vals <= set(range(200, 208))
    assert va_tokens & doc_vals <= {208, 209}
    assert va_tokens & doc_vals, "val split produced no samples"

    ict = ICTDataset(prefix, tprefix, max_seq_length=32, num_epochs=1,
                     seed=0, use_one_sent_blocks=True, documents=(8, 10))
    for i in range(len(ict)):
        s = ict[i]
        assert content(s["block"]) <= {208, 209}
        assert int(s["doc_idx"]) in (8, 9)   # absolute ids after re-offset

    t5 = T5Dataset(prefix, max_seq_length=32, vocab_size=1024,
                   num_epochs=1, seed=0, documents=(8, 10))
    for i in range(len(t5)):
        enc = t5[i]["enc_tokens"]
        assert content(enc) - {1022, 1023} <= {208, 209} | set(
            range(1024 - 100, 1024))  # content + sentinels
