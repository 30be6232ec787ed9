"""RETRO tests: CCA causality, gradient flow to encoder+CCA, db build tool,
end-to-end training (reference surface: pretrain_retro.py + tools/retro/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.models.gpt import GPTCfg
from megatron_clip_tpu.models.retro import (
    RetroCfg, init_retro, apply_retro, retro_loss)

TINY = RetroCfg(
    gpt=GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=128,
               seq_length=32),
    chunk_length=8, retrieved_length=16, num_neighbors=2,
    encoder_layers=1, encoder_width=32, cca_layers=(1,))


def _batch(b=2, l=4):
    rng = np.random.RandomState(0)
    toks = rng.randint(1, 128, (b, l * TINY.chunk_length)).astype(np.int32)
    nbrs = rng.randint(1, 128, (b, l, TINY.num_neighbors,
                                TINY.retrieved_length)).astype(np.int32)
    return jnp.asarray(toks), jnp.asarray(nbrs)


def test_retro_forward_and_grads():
    params = init_retro(jax.random.PRNGKey(0), TINY)
    toks, nbrs = _batch()
    logits = apply_retro(params, toks, nbrs, TINY, compute_dtype=jnp.float32)
    assert logits.shape == (2, 32, 128)
    g = jax.grad(lambda p: retro_loss(p, toks, nbrs, TINY,
                                      compute_dtype=jnp.float32))(params)
    assert float(sum(jnp.abs(x).sum()
                     for x in jax.tree.leaves(g["retro_encoder"]))) > 0
    assert float(sum(jnp.abs(x).sum()
                     for x in jax.tree.leaves(g["retro_cca"]))) > 0


def test_cca_causal_offset():
    """Chunk u's logits must not depend on neighbors of chunks >= u
    (retrieval is only available for completed chunks); chunk 0 sees no
    retrieval at all."""
    params = init_retro(jax.random.PRNGKey(0), TINY)
    toks, nbrs = _batch()
    base = np.asarray(apply_retro(params, toks, nbrs, TINY,
                                  compute_dtype=jnp.float32))
    m = TINY.chunk_length
    # perturb neighbors of the LAST chunk: nothing may change (no chunk
    # after it consumes them)
    nb2 = nbrs.at[:, -1].set(1)
    out2 = np.asarray(apply_retro(params, toks, nb2, TINY,
                                  compute_dtype=jnp.float32))
    np.testing.assert_allclose(out2, base, atol=1e-5)
    # perturb neighbors of chunk 0: chunks 0 unaffected, chunk 1+ affected
    nb3 = nbrs.at[:, 0].set(1)
    out3 = np.asarray(apply_retro(params, toks, nb3, TINY,
                                  compute_dtype=jnp.float32))
    np.testing.assert_allclose(out3[:, :m], base[:, :m], atol=1e-5)
    assert np.abs(out3[:, m:] - base[:, m:]).max() > 1e-4


def test_retro_learns_retrieval_task():
    """Synthetic task where each chunk's first token is recoverable ONLY
    through the CCA path (it sits in the previous chunk's neighbor
    continuation). Without retrieval the loss floor is ~4*ln(124)/31=0.62;
    beating it proves the retrieval pathway is live and trainable."""
    from pretrain_retro import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--vocab-size", "128", "--seq-length", "32", "--chunk-length", "8",
        "--num-neighbors", "2", "--encoder-layers", "1",
        "--cca-layers", "1", "--batch-size", "8", "--train-steps", "200",
        "--warmup", "10", "--lr", "5e-3", "--precision", "fp32",
        "--log-interval", "100"]))
    assert m["loss"] < 0.6, m


def test_retro_build_tool(tmp_path):
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(0)
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _d in range(6):
        b.add_item(rng.randint(4, 200, size=70).astype(np.int32))
        b.end_document()
    b.finalize()

    import sys
    sys.path.insert(0, "/root/repo/tools")
    from retro_build import parse_args as rb_args, run as rb_run
    out = str(tmp_path / "retro")
    m = rb_run(rb_args([
        "--data-path", prefix, "--out", out, "--chunk-length", "16",
        "--num-neighbors", "2", "--embed-dim", "16", "--encoder-layers",
        "1", "--encoder-width", "32", "--vocab-size", "256",
        "--batch-size", "8"]))
    chunks = np.load(out + "_chunks.npy")
    docs = np.load(out + "_chunk_docs.npy")
    nbrs = np.load(out + "_neighbors.npy")
    assert m["num_chunks"] == len(chunks) == len(docs)
    assert nbrs.shape == (len(chunks), 2, 32)
    # same-document neighbors are filtered: every stored neighbor chunk must
    # exist in a different document (check via token match impossible -> use
    # doc structure: 70 tokens -> 5 chunks/doc; neighbor rows are nonzero)
    assert nbrs.any(axis=(1, 2)).all()


def test_retro_build_staged_ivf(tmp_path):
    """The staged pipeline (chunks -> embed shards -> k-means IVF index ->
    probed query) — the reference's tools/retro db/index/query structure —
    produces valid doc-filtered neighbors, and the IVF-probed results are
    well-formed at small scale."""
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(1)
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _d in range(8):
        b.add_item(rng.randint(4, 200, size=64).astype(np.int32))
        b.end_document()
    b.finalize()

    import sys
    sys.path.insert(0, "/root/repo/tools")
    from retro_build import parse_args as rb_args, run as rb_run
    out = str(tmp_path / "retro")
    common = ["--data-path", prefix, "--out", out, "--chunk-length", "16",
              "--num-neighbors", "2", "--embed-dim", "16",
              "--encoder-layers", "1", "--encoder-width", "32",
              "--vocab-size", "256", "--batch-size", "8",
              "--embed-shard-size", "16", "--num-centroids", "4",
              "--nprobe", "2"]
    for stage in ("chunks", "embed", "index", "query"):
        m = rb_run(rb_args(common + ["--stage", stage]))
    chunks = np.load(out + "_chunks.npy")
    docs = np.load(out + "_chunk_docs.npy")
    nbrs = np.load(out + "_neighbors.npy")
    cents = np.load(out + "_centroids.npy")
    assert m["num_chunks"] == len(chunks)
    assert cents.shape == (4, 16)
    assert nbrs.shape == (len(chunks), 2, 32)
    # embed stage is resumable: shards on disk, consolidated file matches
    emb = np.load(out + "_emb.npy")
    assert emb.shape == (len(chunks), 16)
    # doc filter: no neighbor equals the query chunk itself
    for i in range(0, len(chunks), 7):
        assert not np.array_equal(nbrs[i, 0, :16], chunks[i]) or \
            not chunks[i].any()


def test_retro_cli(tmp_path, capsys):
    """tools/retro_cli.py (reference tools/retro/cli): stats, chunk text,
    stored neighbors, and a free query against the built db."""
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(3)
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _d in range(6):
        b.add_item(rng.randint(4, 200, size=48).astype(np.int32))
        b.end_document()
    b.finalize()

    import sys
    sys.path.insert(0, "/root/repo/tools")
    from retro_build import parse_args as rb_args, run as rb_run
    out = str(tmp_path / "retro")
    rb_run(rb_args([
        "--data-path", prefix, "--out", out, "--chunk-length", "16",
        "--num-neighbors", "2", "--embed-dim", "16", "--encoder-layers",
        "1", "--encoder-width", "32", "--vocab-size", "256",
        "--batch-size", "8"]))

    from retro_cli import RetroDB, main as cli_main
    db = RetroDB(out)
    st = db.stats()
    assert st["num_chunks"] == 18 and st["chunk_length"] == 16
    assert st["num_docs"] == 6 and st["embedded"]
    c = db.chunk_text(0)
    assert c["doc"] == 0 and c["continuation"]      # 3 chunks per doc
    assert len(c["text"].split()) == 16             # raw ids, no tokenizer
    nb = db.neighbor_texts(0)
    assert len(nb) == 2 and all(d["text"] for d in nb)

    # query by ids: the query equal to chunk 0's tokens must rank a
    # different-doc chunk first only if scores say so — just check shape,
    # score ordering, and that results carry text
    ids = [int(t) for t in db.chunks[0]]
    res = db.query(ids, k=3)
    assert len(res) == 3
    assert res[0]["score"] >= res[1]["score"] >= res[2]["score"]

    # CLI surface with the null tokenizer (space-separated int ids)
    cli_main(["--db", out, "--tokenizer-type", "null", "stats"])
    cli_main(["--db", out, "--tokenizer-type", "null", "chunk", "1"])
    cli_main(["--db", out, "--tokenizer-type", "null", "query",
              " ".join(map(str, ids[:8]))])
    out_text = capsys.readouterr().out
    assert '"num_chunks": 18' in out_text
    assert "score" in out_text


def test_retro_embed_mid_build_resume(tmp_path):
    """Interrupting the embed stage mid-build and rerunning only computes
    the missing shards, and the consolidated embeddings are identical to an
    uninterrupted build (the reference's resumable db jobs)."""
    import os
    import sys
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(3)
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _d in range(12):
        b.add_item(rng.randint(4, 200, size=64).astype(np.int32))
        b.end_document()
    b.finalize()

    sys.path.insert(0, "/root/repo/tools")
    from retro_build import parse_args as rb_args, run as rb_run
    out = str(tmp_path / "retro")
    common = ["--data-path", prefix, "--out", out, "--chunk-length", "16",
              "--num-neighbors", "2", "--embed-dim", "16",
              "--encoder-layers", "1", "--encoder-width", "32",
              "--vocab-size", "256", "--batch-size", "8",
              "--embed-shard-size", "16"]
    rb_run(rb_args(common + ["--stage", "chunks"]))
    rb_run(rb_args(common + ["--stage", "embed"]))
    full = np.load(out + "_emb.npy")
    shard_dir = out + "_emb"
    shards = sorted(os.listdir(shard_dir))
    assert len(shards) >= 3
    # simulate a mid-build crash: last shard missing
    victim = os.path.join(shard_dir, shards[-1])
    os.remove(victim)
    os.remove(out + "_emb.npy")
    kept_mtimes = {s: os.path.getmtime(os.path.join(shard_dir, s))
                   for s in shards[:-1]}
    rb_run(rb_args(common + ["--stage", "embed"]))
    resumed = np.load(out + "_emb.npy")
    np.testing.assert_array_equal(resumed, full)
    for s, t in kept_mtimes.items():   # completed shards were not redone
        assert os.path.getmtime(os.path.join(shard_dir, s)) == t


def test_retro_recall_stage(tmp_path):
    """--stage recall reports probed-IVF recall vs exact MIPS; on a corpus
    with clear cluster structure the default nprobe recovers the exact
    neighbors (the >=0.95 criterion measured at 100k-chunk scale in the
    README is this same code path)."""
    import sys
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(5)
    prefix = str(tmp_path / "corpus")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    # 4 token-band topics -> separable embedding clusters
    for d in range(32):
        lo = 4 + (d % 4) * 60
        b.add_item(rng.randint(lo, lo + 50, size=128).astype(np.int32))
        b.end_document()
    b.finalize()

    sys.path.insert(0, "/root/repo/tools")
    from retro_build import parse_args as rb_args, run as rb_run
    out = str(tmp_path / "retro")
    common = ["--data-path", prefix, "--out", out, "--chunk-length", "16",
              "--num-neighbors", "2", "--embed-dim", "16",
              "--encoder-layers", "1", "--encoder-width", "32",
              "--vocab-size", "256", "--batch-size", "8",
              "--num-centroids", "8", "--nprobe", "4",
              "--measure-recall", "64"]
    m = rb_run(rb_args(common + ["--stage", "all"]))
    assert 0.0 <= m["recall_at_k"] <= 1.0
    assert m["num_queries"] == 64
    assert m["recall_at_k"] >= 0.9, m   # nprobe=half the lists, clustered
