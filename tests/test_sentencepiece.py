"""Native sentencepiece .model reader/encoder (tokenizer/sentencepiece_py.py).

The `sentencepiece` package is not installed in this image, so models are
built directly in protobuf wire format via build_model_bytes() and the
parser + unigram/BPE encoders are validated against hand-computed
segmentations (the reference wraps the C++ package:
/root/reference/megatron/tokenizer/tokenizer.py SentencePieceTokenizer).
"""
import pytest

from megatron_clip_tpu.tokenizer.sentencepiece_py import (
    BPE, BYTE, CONTROL, NORMAL, UNIGRAM, UNKNOWN, SentencePieceModel,
    build_model_bytes)


def _specials():
    return [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL)]


def _unigram_model(extra, **kw):
    return SentencePieceModel(
        data=build_model_bytes(_specials() + extra, model_type=UNIGRAM, **kw))


def test_unigram_viterbi_prefers_whole_words():
    chars = [(c, -8.0, NORMAL) for c in "▁helowrd"]
    m = _unigram_model([("▁hello", -1.0, NORMAL), ("▁world", -2.0, NORMAL)]
                       + chars)
    ids = m.encode("hello world")
    assert [m.id_to_piece(i) for i in ids] == ["▁hello", "▁world"]
    assert m.decode(ids) == "hello world"


def test_unigram_falls_back_to_chars_and_unk():
    chars = [(c, -3.0, NORMAL) for c in "▁abc"]
    m = _unigram_model(chars)
    ids = m.encode("abc zq")
    pieces = [m.id_to_piece(i) for i in ids]
    assert pieces[:4] == ["▁", "a", "b", "c"]
    # z, q have no pieces and no byte fallback -> unk id
    assert ids.count(m.unk_id) == 2
    assert m.types[m.unk_id] == UNKNOWN


def test_unigram_score_tiebreak_picks_higher_score():
    # "ab" can be [a,b] (score -1-1=-2) or [ab] (score -4): chars win.
    m = _unigram_model([("▁", -1.0, NORMAL), ("a", -1.0, NORMAL),
                        ("b", -1.0, NORMAL), ("ab", -4.0, NORMAL)])
    ids = m.encode("ab")
    assert [m.id_to_piece(i) for i in ids] == ["▁", "a", "b"]
    # flip the scores and the merged piece wins
    m2 = _unigram_model([("▁", -1.0, NORMAL), ("a", -3.0, NORMAL),
                         ("b", -3.0, NORMAL), ("ab", -4.0, NORMAL)])
    ids2 = m2.encode("ab")
    assert [m2.id_to_piece(i) for i in ids2] == ["▁", "ab"]


def test_byte_fallback_roundtrip():
    byte_pieces = [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    chars = [(c, -3.0, NORMAL) for c in "▁hi"]
    m = _unigram_model(chars + byte_pieces, byte_fallback=True)
    text = "hi 🙂"
    ids = m.encode(text)
    assert m.decode(ids) == text
    # the emoji encodes to its 4 utf-8 bytes
    emoji_bytes = "🙂".encode("utf-8")
    tail = [m.id_to_piece(i) for i in ids[-len(emoji_bytes):]]
    assert tail == [f"<0x{b:02X}>" for b in emoji_bytes]


def test_literal_byte_piece_text_is_not_surface_matched():
    """sentencepiece only reaches BYTE pieces through byte fallback: the
    literal string "<0x41>" must tokenize as its characters, never as the
    byte piece (logit parity with SentencePieceProcessor)."""
    byte_pieces = [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    chars = [(c, -3.0, NORMAL) for c in "▁<0x41>"]
    m = _unigram_model(chars + byte_pieces, byte_fallback=True)
    ids = m.encode("<0x41>")
    pieces = [m.id_to_piece(i) for i in ids]
    assert "<0x41>" not in pieces, pieces
    assert m.decode(ids) == "<0x41>"


def test_decode_keeps_leading_space_without_dummy_prefix():
    """Without add_dummy_prefix a leading escaped space is genuine text:
    decode must not strip it (SentencePieceProcessor semantics)."""
    chars = [(c, -3.0, NORMAL) for c in "▁a"]
    m = _unigram_model(chars, add_dummy_prefix=False)
    # encode(" a") trims the space (remove_extra_whitespaces) — drive the
    # id sequence directly, as a generation step would
    ids = [m.piece_to_id("▁"), m.piece_to_id("a")]
    assert m.decode(ids) == " a"
    # and WITH the prefix the dummy space is stripped as before
    m2 = _unigram_model(chars)
    assert m2.decode(m2.encode("a")) == "a"


def test_bpe_best_scoring_merge_order():
    m = SentencePieceModel(data=build_model_bytes(
        _specials() + [("▁", -1.0, NORMAL), ("a", -2.0, NORMAL),
                       ("b", -2.0, NORMAL), ("ab", -1.0, NORMAL),
                       ("▁ab", -0.5, NORMAL)],
        model_type=BPE))
    ids = m.encode("ab")
    assert [m.id_to_piece(i) for i in ids] == ["▁ab"]
    assert m.decode(ids) == "ab"


def test_bpe_unmergeable_chars_stay_single():
    m = SentencePieceModel(data=build_model_bytes(
        _specials() + [("▁", -1.0, NORMAL), ("x", -2.0, NORMAL),
                       ("y", -2.0, NORMAL)],
        model_type=BPE))
    ids = m.encode("xy")
    assert [m.id_to_piece(i) for i in ids] == ["▁", "x", "y"]


def test_nfkc_normalization_and_whitespace():
    chars = [(c, -3.0, NORMAL) for c in "▁fi"]
    m = _unigram_model(chars)
    # U+FB01 LATIN SMALL LIGATURE FI -> "fi" under NFKC
    ids = m.encode("ﬁ")
    assert [m.id_to_piece(i) for i in ids] == ["▁", "f", "i"]
    # extra whitespace collapses
    assert m.encode("  fi   fi ") == m.encode("fi fi")


def test_control_pieces_never_encoded_and_skipped_in_decode():
    chars = [(c, -3.0, NORMAL) for c in "▁s</>"]
    m = _unigram_model(chars)
    ids = m.encode("<s>")
    assert m.piece_to_id("<s>") not in ids
    assert m.decode([m.bos_id] + m.encode("s") + [m.eos_id]) == "s"


def test_build_tokenizer_dispatch(tmp_path):
    from megatron_clip_tpu.tokenizer.megatron_tokenizers import build_tokenizer
    chars = [(c, -3.0, NORMAL) for c in "▁lama"]
    data = build_model_bytes(_specials() + [("▁llama", -1.0, NORMAL)] + chars)
    f = tmp_path / "tok.model"
    f.write_bytes(data)
    tok = build_tokenizer("Llama2Tokenizer", tokenizer_model=str(f))
    ids = tok.tokenize("llama")
    assert tok.detokenize(ids) == "llama"
    assert tok.vocab_size == len(_specials()) + 1 + len(chars)
    assert tok.eod == 2  # </s>


def test_unknown_fields_are_skipped():
    # append an unknown varint field (200) and an unknown length-delimited
    # field (201) at top level: parser must skip them
    from megatron_clip_tpu.tokenizer.sentencepiece_py import _ld, _vi
    data = build_model_bytes(_specials() + [("▁ok", -1.0, NORMAL)])
    data += _vi(200, 12345) + _ld(201, b"future-proto-field")
    m = SentencePieceModel(data=data)
    assert [m.id_to_piece(i) for i in m.encode("ok")] == ["▁ok"]


def test_bpe_heap_matches_naive_rescan():
    """The heap/linked-list BPE agenda must reproduce the naive
    best-scoring-pair rescan on random inputs (unique scores)."""
    import random

    rng = random.Random(0)
    alphabet = "abcd"
    pieces = [(c, -5.0 - i, NORMAL) for i, c in enumerate("▁" + alphabet)]
    merged, seen = [], set()
    for _ in range(40):
        a = rng.choice(alphabet + "▁")
        b = rng.choice(alphabet)
        w = a + b
        if w not in seen:
            seen.add(w)
            merged.append((w, -float(len(merged)) - 0.5, NORMAL))
    m = SentencePieceModel(data=build_model_bytes(
        _specials() + pieces + merged, model_type=BPE))

    def naive(s):
        syms = list(s)
        while True:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                pid = m.index.get(syms[i] + syms[i + 1], -1)
                if pid < 0 or m.types[pid] == UNKNOWN:
                    continue
                if best is None or m.scores[pid] > best:
                    best, bi = m.scores[pid], i
            if bi < 0:
                return syms
            syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]

    for _ in range(25):
        text = "".join(rng.choice(alphabet + " ") for _ in range(rng.randint(1, 60)))
        got = [m.id_to_piece(i) for i in m.encode(text)]
        want = naive(m.normalize(text))
        assert got == want, (text, got, want)
