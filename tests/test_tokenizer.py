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
