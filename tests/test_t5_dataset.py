"""Real-corpus T5 span-corruption dataset (data/t5_dataset.py — the
counterpart of megatron/data/t5_dataset.py:1-257): sample invariants,
mask-fraction statistics, determinism, and an end-to-end training smoke on
a generated corpus."""
import numpy as np
import pytest

from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
from megatron_clip_tpu.data.t5_dataset import T5Dataset, t5_batch_iterator

VOCAB = 512
SENTINEL_BASE = VOCAB - 100


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("t5data")
    rng = np.random.RandomState(0)
    prefix = str(d / "sent")
    b = MMapIndexedDatasetBuilder(prefix, dtype=np.int32)
    for _doc in range(30):
        for _s in range(rng.randint(1, 6)):
            b.add_item(rng.randint(10, SENTINEL_BASE,
                                   size=rng.randint(8, 40)).astype(np.int32))
        b.end_document()
    b.finalize()
    return prefix


def _make(corpus, **kw):
    args = dict(max_seq_length=64, max_seq_length_dec=32, num_epochs=3,
                vocab_size=VOCAB, seed=7)
    args.update(kw)
    return T5Dataset(corpus, **args)


def test_sample_shapes_and_sentinel_structure(corpus):
    ds = _make(corpus)
    assert len(ds) > 0
    for i in range(min(20, len(ds))):
        s = ds[i]
        assert s["enc_tokens"].shape == (64,)
        assert s["dec_tokens"].shape == (32,)
        assert s["labels"].shape == (32,)
        # decoder input starts with BOS; labels end the real span with EOS
        assert s["dec_tokens"][0] == 1
        n_real = int(s["loss_mask"].sum())
        assert n_real >= 2
        assert s["labels"][n_real - 1] == 2
        # every sentinel in the encoder reappears in the decoder targets
        enc_sent = set(t for t in s["enc_tokens"] if t >= SENTINEL_BASE)
        dec_sent = set(t for t in s["labels"] if t >= SENTINEL_BASE)
        assert enc_sent == dec_sent
        assert len(enc_sent) >= 1
        # teacher forcing: dec input is labels shifted right behind BOS
        np.testing.assert_array_equal(s["dec_tokens"][1:n_real],
                                      s["labels"][:n_real - 1])


def test_mask_fraction_statistics(corpus):
    """~masked_lm_prob of the input tokens end up in spans (reference
    masked_lm_prob semantics); measured across the dataset."""
    ds = _make(corpus, masked_lm_prob=0.15)
    masked, total = 0, 0
    for i in range(min(50, len(ds))):
        s = ds[i]
        n_enc = int(s["enc_mask"].sum())
        n_sent = sum(1 for t in s["enc_tokens"] if t >= SENTINEL_BASE)
        n_dec = int(s["loss_mask"].sum())
        # decoder real tokens = masked originals + one sentinel per span
        # + EOS; original length = enc real - sentinels + masked
        n_masked = n_dec - 1 - n_sent
        masked += n_masked
        total += n_enc - n_sent + n_masked
    frac = masked / max(total, 1)
    assert 0.08 < frac < 0.25, frac


def test_determinism_and_seed_sensitivity(corpus):
    a1 = _make(corpus, seed=7)[3]
    a2 = _make(corpus, seed=7)[3]
    b = _make(corpus, seed=8)[3]
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])
    assert any(not np.array_equal(a1[k], b[k]) for k in a1)


def test_batch_iterator_seek_matches_replay(corpus):
    """start_step seeks to the same stream position as replaying (the
    consumed-samples resume contract of the workload runtime)."""
    it0 = t5_batch_iterator(corpus, 4, max_seq_length=64,
                            max_seq_length_dec=32, num_epochs=3,
                            vocab_size=VOCAB, seed=7)
    for _ in range(2):
        next(it0)
    want = next(it0)
    it1 = t5_batch_iterator(corpus, 4, start_step=2, max_seq_length=64,
                            max_seq_length_dec=32, num_epochs=3,
                            vocab_size=VOCAB, seed=7)
    got = next(it1)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])


def test_t5_e2e_on_generated_corpus(corpus, devices8):
    """pretrain_t5 --data-path: two sharded steps on the real-corpus span
    corruption samples (tp2) produce a finite falling-ish loss."""
    from pretrain_t5 import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--num-decoder-layers", "2",
        "--hidden-size", "64", "--num-heads", "4",
        "--encoder-seq-length", "64", "--decoder-seq-length", "32",
        "--vocab-size", str(VOCAB), "--batch-size", "8",
        "--train-steps", "3", "--log-interval", "1", "--precision", "fp32",
        "--tensor-model-parallel-size", "2",
        "--data-path", corpus]))
    assert np.isfinite(m["loss"])
