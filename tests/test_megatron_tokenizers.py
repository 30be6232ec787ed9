"""Megatron tokenizer-family tests (reference: megatron/tokenizer/
tokenizer.py types + bert_tokenization wordpiece algorithm)."""
import pytest

from megatron_clip_tpu.tokenizer.megatron_tokenizers import (
    BertWordPieceTokenizer, NullTokenizer, build_tokenizer,
    vocab_size_with_padding)


@pytest.fixture
def vocab_file(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "quick", "brown", "fox", "jump", "##ed", "##s",
             "over", "lazy", "dog", ",", ".", "un", "##expect",
             "##ed", "##ly"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab))
    return str(p)


def test_wordpiece_greedy_longest_match(vocab_file):
    tok = BertWordPieceTokenizer(vocab_file)
    ids = tok.tokenize("The quick fox jumped unexpectedly.")
    assert tok.detokenize(ids) == "the quick fox jumped unexpectedly ."
    # 'jumped' -> jump + ##ed; 'unexpectedly' -> un ##expect ##ed ##ly
    toks = [tok.decoder[i] for i in ids]
    assert "jump" in toks and "##ed" in toks and "##expect" in toks


def test_wordpiece_unk_and_pair(vocab_file):
    tok = BertWordPieceTokenizer(vocab_file)
    assert tok.tokenize("zzz") == [tok.unk]
    ids, types = tok.tokenize_pair("the fox", "lazy dog")
    assert ids[0] == tok.cls and ids.count(tok.sep) == 2
    assert types[:len(tok.tokenize('the fox')) + 2] == [0] * (2 + 2)
    assert types[-1] == 1


def test_null_tokenizer_roundtrip():
    tok = NullTokenizer(100)
    assert tok.tokenize("5 17 99") == [5, 17, 99]
    assert tok.detokenize([5, 17, 99]) == "5 17 99"
    assert tok.eod == 100


def test_build_tokenizer_dispatch(vocab_file):
    assert isinstance(build_tokenizer("BertWordPieceLowerCase",
                                      vocab_file=vocab_file),
                      BertWordPieceTokenizer)
    clip = build_tokenizer("CLIPTokenizer")
    assert clip.vocab_size == 49408
    # sentencepiece now has a native .model reader (sentencepiece_py):
    # a missing model file is a file error, not a missing-package gate
    with pytest.raises(FileNotFoundError):
        build_tokenizer("SentencePieceTokenizer", tokenizer_model="x.model")
    with pytest.raises(ValueError):
        build_tokenizer("bogus")


def test_vocab_padding():
    assert vocab_size_with_padding(30522, 128, 1) == 30592
    assert vocab_size_with_padding(50257, 128, 8) == 51200
