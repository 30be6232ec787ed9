"""Megatron tokenizer family.

Covers the reference's tokenizer surface (megatron/tokenizer/tokenizer.py:
BertWordPieceLowerCase/UpperCase, GPT2BPETokenizer, SentencePieceTokenizer,
NullTokenizer, plus the fork's CLIPTokenizer type) behind the same
`build_tokenizer(args)` entry point, with megatron's API contract:
`tokenize`, `detokenize`, `vocab_size`, and the special-id properties
(cls/sep/mask/pad/eod) each type defines. Vocab padding to a multiple of
`make-vocab-size-divisible-by` * tensor-parallel size matches
tokenizer.py `_vocab_size_with_padding`.

The wordpiece algorithm is implemented here (greedy longest-match-first
with '##' continuation pieces over a vocab.txt); GPT-2 BPE and
sentencepiece wrap the locally-installed `tokenizers`/`sentencepiece`
packages when vocab files are supplied, with clear errors otherwise (no
downloads — this framework is offline-first).
"""
import re
from typing import List, Optional

import numpy as np


def vocab_size_with_padding(orig_size: int, divisible_by: int = 128,
                            tp_size: int = 1) -> int:
    """Pad to a GEMM-friendly multiple (tokenizer.py _vocab_size_with_padding)."""
    mult = divisible_by * tp_size
    return ((orig_size + mult - 1) // mult) * mult


class NullTokenizer:
    """Ids are the text (space-separated ints) — megatron NullTokenizer."""

    def __init__(self, vocab_size: int):
        self._vocab_size = vocab_size + 1   # +1: eod

    @property
    def vocab_size(self):
        return self._vocab_size

    def tokenize(self, text: str) -> List[int]:
        return [int(t) for t in text.split()]

    def detokenize(self, ids) -> str:
        return " ".join(str(int(i)) for i in ids)

    @property
    def eod(self):
        return self._vocab_size - 1


class BertWordPieceTokenizer:
    """WordPiece over a BERT vocab.txt (one piece per line, '##' prefixes
    continuation pieces). Greedy longest-match-first, [UNK] on failure —
    the standard BERT algorithm the reference gets from its vendored
    FullTokenizer (megatron/tokenizer/bert_tokenization.py)."""

    def __init__(self, vocab_file: str, lower_case: bool = True):
        self.lower_case = lower_case
        with open(vocab_file, encoding="utf-8") as f:
            self.vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        self.encoder = {tok: i for i, tok in enumerate(self.vocab)}
        self.decoder = {i: t for t, i in self.encoder.items()}
        for sp in ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"):
            if sp not in self.encoder:
                raise ValueError(f"{vocab_file} missing special token {sp}")

    @property
    def vocab_size(self):
        return len(self.vocab)

    # --- megatron special-id properties ------------------------------------
    @property
    def cls(self):
        return self.encoder["[CLS]"]

    @property
    def sep(self):
        return self.encoder["[SEP]"]

    @property
    def mask(self):
        return self.encoder["[MASK]"]

    @property
    def pad(self):
        return self.encoder["[PAD]"]

    @property
    def unk(self):
        return self.encoder["[UNK]"]

    def _basic_split(self, text: str) -> List[str]:
        if self.lower_case:
            text = text.lower()
        # split on whitespace, isolate punctuation (BasicTokenizer behavior)
        return re.findall(r"\w+|[^\w\s]", text, re.UNICODE)

    def _wordpiece(self, word: str) -> List[str]:
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                cand = word[start:end]
                if start > 0:
                    cand = "##" + cand
                if cand in self.encoder:
                    piece = cand
                    break
                end -= 1
            if piece is None:
                return ["[UNK]"]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[int]:
        ids = []
        for word in self._basic_split(text):
            ids.extend(self.encoder[p] for p in self._wordpiece(word))
        return ids

    def detokenize(self, ids) -> str:
        toks = [self.decoder.get(int(i), "[UNK]") for i in ids]
        out = ""
        for t in toks:
            if t.startswith("##"):
                out += t[2:]
            else:
                out += (" " if out else "") + t
        return out

    def tokenize_pair(self, a: str, b: str):
        """[CLS] a [SEP] b [SEP] with token-type ids (BERT input builder)."""
        ia, ib = self.tokenize(a), self.tokenize(b)
        ids = [self.cls] + ia + [self.sep] + ib + [self.sep]
        types = [0] * (len(ia) + 2) + [1] * (len(ib) + 1)
        return ids, types


class GPT2BPETokenizer:
    """GPT-2 byte-level BPE from local vocab.json + merges.txt via the
    `tokenizers` package (reference: megatron/tokenizer/gpt2_tokenization.py,
    vocab files supplied by --vocab-file/--merge-file)."""

    def __init__(self, vocab_file: str, merge_file: str):
        try:
            from tokenizers import ByteLevelBPETokenizer
        except ImportError as e:  # pragma: no cover
            raise ImportError("GPT2BPETokenizer needs the `tokenizers` "
                              "package") from e
        self._tok = ByteLevelBPETokenizer(vocab_file, merge_file)
        self._eod = self._tok.token_to_id("<|endoftext|>")
        if self._eod is None:
            self._eod = self._tok.get_vocab_size() - 1

    @property
    def vocab_size(self):
        return self._tok.get_vocab_size()

    def tokenize(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def detokenize(self, ids) -> str:
        return self._tok.decode([int(i) for i in ids])

    @property
    def eod(self):
        return self._eod


class SentencePieceTokenizer:
    """SentencePiece model wrapper (megatron SentencePieceTokenizer /
    Llama2Tokenizer). Uses the `sentencepiece` package when installed;
    otherwise falls back to the dependency-free native reader/encoder
    (`sentencepiece_py.SentencePieceModel`: protobuf wire-format parse +
    unigram Viterbi / BPE best-merge encoding + byte fallback)."""

    def __init__(self, model_file: str):
        try:
            import sentencepiece as spm
            self._sp = spm.SentencePieceProcessor(model_file=model_file)
            self._eos = self._sp.eos_id()
        except ImportError:
            from megatron_clip_tpu.tokenizer.sentencepiece_py import \
                SentencePieceModel
            self._sp = SentencePieceModel(model_file)
            self._eos = self._sp.eos_id

    @property
    def vocab_size(self):
        return self._sp.get_piece_size()

    def tokenize(self, text: str) -> List[int]:
        return list(self._sp.encode(text))

    def detokenize(self, ids) -> str:
        return self._sp.decode([int(i) for i in ids])

    @property
    def eod(self):
        return self._eos


def build_tokenizer(tokenizer_type: str, *, vocab_file: Optional[str] = None,
                    merge_file: Optional[str] = None,
                    tokenizer_model: Optional[str] = None,
                    vocab_extra_ids: int = 0,
                    null_vocab_size: int = 0):
    """megatron tokenizer.py build_tokenizer: dispatch by type name."""
    t = tokenizer_type.lower().replace("_", "-")
    if t in ("bertwordpiecelowercase", "bert-wordpiece-lower-case",
             "bert-wordpiece"):
        return BertWordPieceTokenizer(vocab_file, lower_case=True)
    if t in ("bertwordpieceuppercase", "bert-wordpiece-upper-case"):
        return BertWordPieceTokenizer(vocab_file, lower_case=False)
    if t in ("gpt2bpetokenizer", "gpt2-bpe"):
        return GPT2BPETokenizer(vocab_file, merge_file)
    if t in ("sentencepiecetokenizer", "sentencepiece", "llama2tokenizer"):
        return SentencePieceTokenizer(tokenizer_model)
    if t in ("cliptokenizer", "clip"):
        from megatron_clip_tpu.tokenizer.clip_bpe import SimpleTokenizer
        return SimpleTokenizer()
    if t in ("nulltokenizer", "null"):
        return NullTokenizer(null_vocab_size)
    raise ValueError(f"unknown tokenizer type {tokenizer_type!r}")
