"""Dependency-free SentencePiece `.model` reader + encoder/decoder.

The reference wraps the `sentencepiece` C++ package for its
SentencePieceTokenizer / Llama2Tokenizer types
(/root/reference/megatron/tokenizer/tokenizer.py SentencePieceTokenizer).
That package is not installed in this image, so this module implements the
subset needed to *load and run* a trained `.model` file natively:

  - a protobuf wire-format parser for `ModelProto` (pieces + trainer_spec +
    normalizer_spec) — no `protobuf` runtime needed, just the wire format
    (varint / 64-bit / length-delimited / 32-bit field skipping for unknown
    fields, so files from any sentencepiece version parse);
  - the **unigram** encoder: Viterbi best-segmentation over the piece vocab
    with log-prob scores (the algorithm of Kudo 2018, and what
    `SentencePieceProcessor.encode` does for UNIGRAM models);
  - the **BPE** encoder: iterated best-scoring adjacent merge (SP's BPE
    model stores merged pieces with scores = -merge_rank; encoding greedily
    applies the highest-score mergeable pair — `bpe_model.cc` semantics);
  - normalization: NFKC (or identity for "identity"-normalizer models),
    whitespace escaping to U+2581, `add_dummy_prefix`,
    `remove_extra_whitespaces` (the standard flags; the precompiled_charsmap
    custom rules beyond NFKC are not replicated);
  - `byte_fallback`: unknown characters encode to the `<0xNN>` byte pieces
    when the model was trained with them (Llama-style), else to `unk_id`;
  - decode: pieces -> text with U+2581 -> space, byte-piece reassembly, and
    dummy-prefix stripping.

Control pieces (BOS/EOS/PAD/UNK and user-defined specials) are never
produced by encode() from raw text, matching sentencepiece.
"""
import struct
import unicodedata
from typing import Dict, List, Tuple

_WS = "▁"  # ▁ — sentencepiece's escaped space

# piece types (sentencepiece_model.proto SentencePiece.Type)
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6

UNIGRAM, BPE, WORD, CHAR = 1, 2, 3, 4  # TrainerSpec.ModelType


# --------------------------------------------------------------------------
# protobuf wire format
# --------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _skip_field(buf: bytes, i: int, wire: int) -> int:
    if wire == 0:
        _, i = _read_varint(buf, i)
    elif wire == 1:
        i += 8
    elif wire == 2:
        n, i = _read_varint(buf, i)
        i += n
    elif wire == 5:
        i += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return i


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's fields.
    Values: int for varint, bytes for length-delimited, raw 4/8 bytes for
    fixed32/64."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            n, i = _read_varint(buf, i)
            v, i = buf[i:i + n], i + n
        elif wire == 5:
            v, i = buf[i:i + 4], i + 4
        elif wire == 1:
            v, i = buf[i:i + 8], i + 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


class SentencePieceModel:
    """Parsed `.model` file: pieces, scores, types, and the spec flags the
    encoder needs."""

    def __init__(self, model_file: str = None, *, data: bytes = None):
        data = data if data is not None else open(model_file, "rb").read()
        self.pieces: List[str] = []
        self.scores: List[float] = []
        self.types: List[int] = []
        # defaults per sentencepiece_model.proto
        self.model_type = UNIGRAM
        self.unk_id, self.bos_id, self.eos_id, self.pad_id = 0, 1, 2, -1
        self.byte_fallback = False
        self.add_dummy_prefix = True
        self.remove_extra_whitespaces = True
        self.escape_whitespaces = True
        self.normalizer_name = "nmt_nfkc"

        for field, wire, v in _fields(data):
            if field == 1 and wire == 2:          # repeated SentencePiece
                piece, score, ptype = "", 0.0, NORMAL
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        piece = v2.decode("utf-8")
                    elif f2 == 2 and w2 == 5:
                        score = struct.unpack("<f", v2)[0]
                    elif f2 == 3 and w2 == 0:
                        ptype = v2
                self.pieces.append(piece)
                self.scores.append(score)
                self.types.append(ptype)
            elif field == 2 and wire == 2:        # TrainerSpec
                for f2, w2, v2 in _fields(v):
                    if w2 != 0:
                        continue
                    if f2 == 3:
                        self.model_type = v2
                    elif f2 == 35:
                        self.byte_fallback = bool(v2)
                    elif f2 == 40:
                        self.unk_id = _signed(v2)
                    elif f2 == 41:
                        self.bos_id = _signed(v2)
                    elif f2 == 42:
                        self.eos_id = _signed(v2)
                    elif f2 == 43:
                        self.pad_id = _signed(v2)
            elif field == 3 and wire == 2:        # NormalizerSpec
                for f2, w2, v2 in _fields(v):
                    if f2 == 1 and w2 == 2:
                        self.normalizer_name = v2.decode("utf-8")
                    elif f2 == 3 and w2 == 0:
                        self.add_dummy_prefix = bool(v2)
                    elif f2 == 4 and w2 == 0:
                        self.remove_extra_whitespaces = bool(v2)
                    elif f2 == 5 and w2 == 0:
                        self.escape_whitespaces = bool(v2)

        self.index: Dict[str, int] = {}
        for i, p in enumerate(self.pieces):
            self.index.setdefault(p, i)
        self._byte_ids = None
        if self.byte_fallback or BYTE in self.types:
            self._byte_ids = {}
            for i, (p, t) in enumerate(zip(self.pieces, self.types)):
                if t == BYTE and len(p) == 6 and p.startswith("<0x"):
                    self._byte_ids[int(p[3:5], 16)] = i
        # pieces encode() may surface-match from text. BYTE pieces are NOT
        # matchable: sentencepiece only reaches them through byte fallback,
        # so literal text like "<0x41>" must tokenize as normal characters
        self._encodable = [t in (NORMAL, USER_DEFINED, UNKNOWN)
                           for t in self.types]
        self._max_piece_len = max((len(p) for p in self.pieces), default=1)

    # -- normalization ------------------------------------------------------

    def normalize(self, text: str) -> str:
        if "identity" not in self.normalizer_name:
            text = unicodedata.normalize("NFKC", text)
        if self.remove_extra_whitespaces:
            text = " ".join(text.split())
        if self.add_dummy_prefix and text:
            text = " " + text
        if self.escape_whitespaces:
            text = text.replace(" ", _WS)
        return text

    # -- encoding -----------------------------------------------------------

    def encode(self, text: str) -> List[int]:
        s = self.normalize(text)
        if not s:
            return []
        if self.model_type == BPE:
            return self._encode_bpe(s)
        if self.model_type == CHAR:
            return [self._char_id(c) for c in s]
        if self.model_type == WORD:
            out = []
            for w in s.split(_WS):
                if not w:
                    continue
                out.append(self.index.get(_WS + w, self.unk_id))
            return out
        return self._encode_unigram(s)

    def _char_id(self, c: str) -> int:
        i = self.index.get(c, -1)
        if i >= 0 and self._encodable[i]:
            return i
        return self.unk_id

    def _fallback(self, c: str, out: List[int]):
        """Append byte-fallback pieces (or unk) for one unmatchable char."""
        if self._byte_ids:
            for byt in c.encode("utf-8"):
                out.append(self._byte_ids.get(byt, self.unk_id))
        else:
            out.append(self.unk_id)

    def _encode_unigram(self, s: str) -> List[int]:
        """Viterbi best segmentation: dp[j] = best score of s[:j]."""
        n = len(s)
        NEG = -1e18
        # unk chars get a strong penalty so known pieces are preferred
        unk_score = min(self.scores, default=0.0) - 10.0
        dp = [NEG] * (n + 1)
        back: List[Tuple[int, int]] = [(-1, -1)] * (n + 1)  # (start, piece_id)
        dp[0] = 0.0
        maxlen = self._max_piece_len
        for j in range(1, n + 1):
            lo = max(0, j - maxlen)
            for i in range(lo, j):
                if dp[i] <= NEG / 2:
                    continue
                pid = self.index.get(s[i:j], -1)
                if pid >= 0 and self._encodable[pid] \
                        and self.types[pid] != UNKNOWN:
                    sc = dp[i] + self.scores[pid]
                    if sc > dp[j]:
                        dp[j], back[j] = sc, (i, pid)
            # single-char unk transition keeps the lattice connected
            if dp[j - 1] > NEG / 2 and dp[j - 1] + unk_score > dp[j]:
                dp[j], back[j] = dp[j - 1] + unk_score, (j - 1, -1)
        # backtrace
        rev: List[Tuple[int, int]] = []
        j = n
        while j > 0:
            i, pid = back[j]
            rev.append((i, pid) if pid >= 0 else (i, -1))
            j = i
        out: List[int] = []
        for i, pid in reversed(rev):
            if pid >= 0:
                out.append(pid)
            else:
                self._fallback(s[i], out)
        return out

    def _encode_bpe(self, s: str) -> List[int]:
        """Iterated best-scoring adjacent merge (bpe_model.cc): symbols start
        as single characters; repeatedly merge the adjacent pair whose
        concatenation is a vocab piece with the highest score. Heap + linked
        list over the symbol sequence (the C++ implementation's agenda), so
        long inputs stay O(n log n) rather than rescanning every pair."""
        import heapq
        n = len(s)
        if n == 0:
            return []
        syms = list(s)
        nxt = list(range(1, n)) + [-1]
        prv = [-1] + list(range(0, n - 1))
        alive = [True] * n
        heap: List[tuple] = []

        def push(i):
            j = nxt[i]
            if i < 0 or j < 0:
                return
            pid = self.index.get(syms[i] + syms[j], -1)
            if pid >= 0 and self._encodable[pid] \
                    and self.types[pid] != UNKNOWN:
                # (-score, i) orders by best score, leftmost on ties —
                # matching the linear scan's first-max choice
                heapq.heappush(heap, (-self.scores[pid], i,
                                      syms[i], syms[j]))

        for i in range(n - 1):
            push(i)
        while heap:
            _, i, a, b = heapq.heappop(heap)
            if not alive[i] or syms[i] != a:
                continue
            j = nxt[i]
            if j < 0 or not alive[j] or syms[j] != b:
                continue
            syms[i] = a + b
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[j] >= 0:
                prv[nxt[j]] = i
            if prv[i] >= 0:
                push(prv[i])
            push(i)
        syms = [syms[i] for i in range(n) if alive[i]]
        out: List[int] = []
        for sym in syms:
            pid = self.index.get(sym, -1)
            if pid >= 0 and self._encodable[pid] and self.types[pid] != UNKNOWN:
                out.append(pid)
            else:
                for c in sym:
                    cid = self.index.get(c, -1)
                    if cid >= 0 and self._encodable[cid] \
                            and self.types[cid] != UNKNOWN:
                        out.append(cid)
                    else:
                        self._fallback(c, out)
        return out

    # -- decoding -----------------------------------------------------------

    def decode(self, ids) -> str:
        out: List[str] = []
        byte_buf = bytearray()

        def flush():
            if byte_buf:
                out.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            i = int(i)
            if not 0 <= i < len(self.pieces):
                continue
            t = self.types[i]
            if t == BYTE:
                byte_buf.append(int(self.pieces[i][3:5], 16))
                continue
            flush()
            if t in (CONTROL, UNUSED):
                continue
            if t == UNKNOWN:
                out.append(" ⁇ ")   # sentencepiece's unk surface
                continue
            out.append(self.pieces[i])
        flush()
        text = "".join(out).replace(_WS, " ")
        # only the dummy prefix's own space is stripped; without
        # add_dummy_prefix a leading space is genuine text
        if self.add_dummy_prefix and text.startswith(" "):
            text = text[1:]
        return text

    # -- introspection ------------------------------------------------------

    def piece_to_id(self, piece: str) -> int:
        return self.index.get(piece, self.unk_id)

    def id_to_piece(self, i: int) -> str:
        return self.pieces[int(i)]

    def get_piece_size(self) -> int:
        return len(self.pieces)


def _signed(v: int) -> int:
    """protobuf int32 varints are sign-extended to 64 bits."""
    return v - (1 << 64) if v >= (1 << 63) else v


# --------------------------------------------------------------------------
# test-support: serialize a tiny ModelProto (wire format) so unit tests can
# build models without the sentencepiece trainer.
# --------------------------------------------------------------------------

def _varint(x: int) -> bytes:
    out = bytearray()
    x &= (1 << 64) - 1
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def build_model_bytes(pieces, *, model_type: int = UNIGRAM,
                      byte_fallback: bool = False,
                      add_dummy_prefix: bool = True,
                      unk_id: int = 0, bos_id: int = 1, eos_id: int = 2,
                      normalizer: str = "nmt_nfkc") -> bytes:
    """pieces: list of (piece, score, type). Returns ModelProto bytes."""
    buf = bytearray()
    for piece, score, ptype in pieces:
        sp = _ld(1, piece.encode("utf-8"))
        sp += _varint((2 << 3) | 5) + struct.pack("<f", score)
        sp += _vi(3, ptype)
        buf += _ld(1, sp)
    ts = _vi(3, model_type) + _vi(35, int(byte_fallback)) + \
        _vi(40, unk_id & ((1 << 64) - 1)) + _vi(41, bos_id) + _vi(42, eos_id)
    buf += _ld(2, ts)
    ns = _ld(1, normalizer.encode()) + _vi(3, int(add_dummy_prefix)) + \
        _vi(4, 1) + _vi(5, 1)
    buf += _ld(3, ns)
    return bytes(buf)
