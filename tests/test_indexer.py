"""Indexer/MIPS tests (reference: megatron/indexer.py, realm_index.py,
tools/bert_embedding)."""
import numpy as np

from megatron_clip_tpu.indexer import MIPSIndex, EmbeddingWriter, embed_corpus


def test_mips_exact_topk():
    rng = np.random.RandomState(0)
    emb = rng.randn(500, 32).astype(np.float32)
    q = rng.randn(7, 32).astype(np.float32)
    idx = MIPSIndex(emb, shard_rows=128)   # force multi-shard path
    s, i = idx.search(q, k=5)
    brute = q @ emb.T
    want_i = np.argsort(-brute, axis=1)[:, :5]
    np.testing.assert_array_equal(i, want_i)
    np.testing.assert_allclose(s, np.take_along_axis(brute, want_i, axis=1),
                               rtol=1e-5)


def test_embed_corpus_roundtrip(tmp_path):
    writer_prefix = str(tmp_path / "emb")
    batches = [np.full((4, 8), i, np.float32) for i in range(3)]
    path = embed_corpus(lambda b: b[:, :5], iter(batches), writer_prefix,
                        log_interval=0)
    emb = np.load(path)
    assert emb.shape == (12, 5)
    import json
    meta = json.load(open(writer_prefix + ".json"))
    assert meta["num_embeddings"] == 12 and meta["dim"] == 5


def test_bert_embedding_tool(tmp_path):
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(0)
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _ in range(10):
        b.add_item(rng.randint(4, 400, size=rng.randint(4, 20)).astype(np.int32))
        b.end_document()
    b.finalize()

    import sys
    sys.path.insert(0, "/root/repo/tools")
    from bert_embedding import parse_args, run
    m = run(parse_args([
        "--data-path", prefix, "--out", str(tmp_path / "blocks"),
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--vocab-size", "512", "--seq-length", "32", "--projection-dim",
        "16", "--batch-size", "4", "--precision", "fp32"]))
    assert m == {"num_embeddings": 10, "dim": 16}
    emb = np.load(str(tmp_path / "blocks.npy"))
    assert emb.shape == (10, 16) and np.isfinite(emb).all()
