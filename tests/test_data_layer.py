"""Indexed dataset + native helpers + GPT dataset tests (the reference's
megatron/data/test/test_indexed_dataset.py + preprocess roundtrip)."""
import numpy as np
import pytest

from megatron_clip_tpu.data.indexed_dataset import (
    MMapIndexedDataset, MMapIndexedDatasetBuilder)
from megatron_clip_tpu.data.native import (
    build_sample_idx, _build_sample_idx_np, build_blending_indices,
    native_available)
from megatron_clip_tpu.data.gpt_dataset import (
    GPTDataset, gpt_batch_iterator, BlendableDataset)


def _write_dataset(tmp_path, docs, dtype=np.int32):
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=dtype)
    for doc in docs:
        for sent in doc:
            b.add_item(sent)
        b.end_document()
    b.finalize()
    return prefix


def test_indexed_roundtrip(tmp_path):
    docs = [[[1, 2, 3], [4, 5]], [[6, 7, 8, 9]], [[10]]]
    prefix = _write_dataset(tmp_path, docs)
    ds = MMapIndexedDataset(prefix)
    assert len(ds) == 4
    np.testing.assert_array_equal(ds[0], [1, 2, 3])
    np.testing.assert_array_equal(ds[3], [10])
    np.testing.assert_array_equal(ds.doc_idx, [0, 2, 3, 4])
    np.testing.assert_array_equal(ds.get(1, offset=1), [5])


def test_reference_format_compat():
    """Our reader must open datasets written by the reference's builder
    (byte-format compatibility check against megatron's own writer)."""
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from megatron.data import indexed_dataset as ref_ids  # type: ignore
    except Exception:
        pytest.skip("reference indexed_dataset not importable")
    finally:
        sys.path.pop(0)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        prefix = os.path.join(d, "ref")
        import torch
        b = ref_ids.MMapIndexedDatasetBuilder(prefix + ".bin", dtype=np.int32)
        b.add_item(torch.tensor([11, 12, 13], dtype=torch.int32))
        b.add_item(torch.tensor([14], dtype=torch.int32))
        b.end_document()
        b.finalize(prefix + ".idx")
        ds = MMapIndexedDataset(prefix)
        np.testing.assert_array_equal(ds[0], [11, 12, 13])
        np.testing.assert_array_equal(ds[1], [14])


def test_native_helper_matches_numpy():
    rng = np.random.RandomState(0)
    sizes = rng.randint(5, 50, size=100).astype(np.int32)
    doc_idx = np.concatenate([np.arange(100, dtype=np.int32)] * 3)
    rng.shuffle(doc_idx)
    tokens_per_epoch = int(sizes.sum())
    got = build_sample_idx(sizes, doc_idx, 64, 3, tokens_per_epoch)
    num_samples = (3 * tokens_per_epoch - 1) // 64
    want = _build_sample_idx_np(sizes, doc_idx, 64, num_samples)
    if native_available():
        np.testing.assert_array_equal(got, want)
    assert got.shape == (num_samples + 1, 2)


def test_blending_indices():
    w = np.array([0.7, 0.2, 0.1])
    ds_idx, ds_sample = build_blending_indices(w, 1000)
    counts = np.bincount(ds_idx, minlength=3)
    np.testing.assert_allclose(counts / 1000, w, atol=0.01)
    # per-dataset sample indices are sequential
    for d in range(3):
        np.testing.assert_array_equal(ds_sample[ds_idx == d],
                                      np.arange(counts[d]))


def test_gpt_dataset_packing(tmp_path):
    rng = np.random.RandomState(1)
    docs = [[[int(x) for x in rng.randint(1, 100, size=rng.randint(10, 80))]]
            for _ in range(20)]
    prefix = _write_dataset(tmp_path, docs)
    ds = GPTDataset(prefix, seq_length=32, seed=0)
    assert len(ds) > 0
    for i in range(min(10, len(ds))):
        s = ds[i]
        assert len(s) == 33, len(s)
    it = gpt_batch_iterator(prefix, batch_size=4, seq_length=32)
    b = next(it)
    assert b.shape == (4, 33) and b.dtype == np.int32


def test_gpt_dataset_cache_dir(tmp_path):
    """--data-cache-path: the packing index lands in the cache dir, not
    next to the (possibly read-only) data, and reloads from there."""
    import os
    rng = np.random.RandomState(2)
    docs = [[[int(x) for x in rng.randint(1, 100, size=40)]]
            for _ in range(8)]
    prefix = _write_dataset(tmp_path, docs)
    cache = str(tmp_path / "idxcache")
    ds = GPTDataset(prefix, seq_length=16, seed=0, cache_dir=cache)
    assert any(f.endswith("_idx.npy") for f in os.listdir(cache))
    data_dir_npys = [f for f in os.listdir(tmp_path)
                     if f.endswith(".npy")]
    assert not data_dir_npys, data_dir_npys
    ds2 = GPTDataset(prefix, seq_length=16, seed=0, cache_dir=cache)
    np.testing.assert_array_equal(np.asarray(ds[0]), np.asarray(ds2[0]))


def test_blendable_dataset(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    p1 = _write_dataset(tmp_path / "a", [[[1] * 40]] * 5)
    p2 = _write_dataset(tmp_path / "b", [[[2] * 40]] * 5)
    d1 = GPTDataset(p1, seq_length=16, seed=0)
    d2 = GPTDataset(p2, seq_length=16, seed=0)
    mix = BlendableDataset([d1, d2], [0.5, 0.5], 20)
    vals = {int(mix[i][0]) for i in range(20)}
    assert vals == {1, 2}


def test_gpt_dataset_split_ranges(tmp_path):
    """megatron --split semantics: disjoint doc ranges for train/valid/test;
    each split's samples contain only its own documents' tokens
    (megatron/data/dataset_utils.py get_train_valid_test_split_)."""
    from megatron_clip_tpu.data.gpt_dataset import train_valid_test_split

    assert train_valid_test_split("969,30,1", 1000) == \
        [(0, 969), (969, 999), (999, 1000)]
    assert train_valid_test_split("8,2", 10) == [(0, 8), (8, 10), (10, 10)]

    # give each doc a distinct token value so split leakage is detectable
    docs = [[[d + 1] * 40] for d in range(10)]
    prefix = _write_dataset(tmp_path, docs)
    tr, va, _ = train_valid_test_split("8,2,0", 10)
    ds_train = GPTDataset(prefix, seq_length=16, cache=False,
                          documents=np.arange(*tr, dtype=np.int32),
                          split_tag="train")
    ds_val = GPTDataset(prefix, seq_length=16, cache=False,
                        documents=np.arange(*va, dtype=np.int32),
                        split_tag="valid")
    train_tokens = {int(t) for i in range(len(ds_train))
                    for t in np.asarray(ds_train[i])}
    val_tokens = {int(t) for i in range(len(ds_val))
                  for t in np.asarray(ds_val[i])}
    assert train_tokens <= set(range(1, 9))
    assert val_tokens <= {9, 10}

    it = gpt_batch_iterator(prefix, batch_size=2, seq_length=16,
                            split="8,2,0", split_index=1)
    assert {int(t) for t in next(it).ravel()} <= {9, 10}


def test_merge_datasets_tool(tmp_path):
    """tools/merge_datasets.py concatenates .bin/.idx pairs preserving
    sequences and document boundaries (reference tools/merge_datasets.py)."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    docs_a = [[np.arange(5), np.arange(3)], [np.arange(7)]]
    docs_b = [[np.array([9, 8, 7])]]
    _write_dataset(shard_dir, docs_a)
    (shard_dir / "corpus.bin").rename(shard_dir / "a.bin")
    (shard_dir / "corpus.idx").rename(shard_dir / "a.idx")
    _write_dataset(shard_dir, docs_b)
    (shard_dir / "corpus.bin").rename(shard_dir / "b.bin")
    (shard_dir / "corpus.idx").rename(shard_dir / "b.idx")

    from tools.merge_datasets import main as merge_main
    out = str(tmp_path / "merged")
    merge_main(["--input", str(shard_dir), "--output-prefix", out])

    ds = MMapIndexedDataset(out)
    flat = [s for doc in docs_a + docs_b for s in doc]
    assert len(ds) == len(flat)
    for i, ref in enumerate(flat):
        np.testing.assert_array_equal(ds[i], ref)
    np.testing.assert_array_equal(ds.doc_idx, [0, 2, 3, 4])


def test_preprocess_data_nmt(tmp_path):
    """One line -> one sequence/document, empty lines dropped, no EOD."""
    src = tmp_path / "train.en"
    src.write_text("a photo of a cat\n\na photo of a dog\n")
    from tools.preprocess_data_nmt import main as nmt_main
    out = str(tmp_path / "en")
    nmt_main(["--input", str(src), "--output-prefix", out,
              "--tokenizer", "clip-bpe"])
    ds = MMapIndexedDataset(out)
    assert len(ds) == 2
    from megatron_clip_tpu.tokenizer import SimpleTokenizer
    tok = SimpleTokenizer()
    np.testing.assert_array_equal(ds[0], tok.encode("a photo of a cat"))
    np.testing.assert_array_equal(ds[1], tok.encode("a photo of a dog"))


def test_preprocess_data_megatron_tokenizer(tmp_path):
    """preprocess_data accepts megatron tokenizer types (reference
    tools/preprocess_data.py --tokenizer-type BertWordPieceLowerCase)."""
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "dog"]))
    src = tmp_path / "corpus.jsonl"
    src.write_text('{"text": "a cat"}\n{"text": "a dog"}\n')
    from tools.preprocess_data import main as pp_main
    out = str(tmp_path / "bert_corpus")
    pp_main(["--input", str(src), "--output-prefix", out,
             "--tokenizer", "BertWordPieceLowerCase",
             "--vocab-file", str(vocab)])
    ds = MMapIndexedDataset(out)
    assert len(ds) == 2
    np.testing.assert_array_equal(ds[0], [5, 6])   # "a cat"
    np.testing.assert_array_equal(ds[1], [5, 7])   # "a dog"
