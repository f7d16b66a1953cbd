"""Native SentencePiece unigram tokenizer (no `sentencepiece` package needed).

The reference tokenizes SigLIP text through open_clip's SigLipTokenizer
(reference embedders.py:640-652 tokenizer selection), which wraps a
SentencePiece unigram model. This module implements the three pieces natively:

* a minimal protobuf wire-format parser for the serialized ``ModelProto``
  (.model file) — pieces with scores/types plus the special-token ids,
* unigram Viterbi segmentation with unknown-token and byte-fallback handling,
* a :class:`SentencePieceTokenizer` adapter to the framework's TextTokenizer
  interface (SigLIP canonicalization: lowercase, strip punctuation, collapse
  whitespace — matching open_clip's ``canonicalize_text``).

Caveat: mechanics follow the sentencepiece unigram spec; exact parity against
the released SigLIP .model asset is validated in round 2 when assets are
available (tests cover synthetic models built with :func:`build_model_proto`).
"""

from __future__ import annotations

import re
import struct
import unicodedata
from dataclasses import dataclass, field
from typing import Iterable, Optional

import numpy as np

from novic_tpu.text.tokenizer import TextTokenizer

WS = "▁"  # ▁ sentencepiece whitespace escape

# SentencePiece.Type enum values (sentencepiece_model.proto)
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6

_UNK_PENALTY = 10.0  # sentencepiece's kUnkPenalty


# ---------------------------------------------------------------------------
# Protobuf wire-format (de)serialization for ModelProto
# ---------------------------------------------------------------------------


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift > 63:
            raise ValueError("Malformed varint in sentencepiece model")


def _scan_fields(data: bytes) -> Iterable[tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a protobuf message body."""
    i, n = 0, len(data)
    while i < n:
        tag, i = _read_varint(data, i)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:      # varint
            val, i = _read_varint(data, i)
        elif wtype == 1:    # 64-bit
            val = data[i:i + 8]
            i += 8
        elif wtype == 2:    # length-delimited
            ln, i = _read_varint(data, i)
            val = data[i:i + ln]
            i += ln
        elif wtype == 5:    # 32-bit
            val = data[i:i + 4]
            i += 4
        else:
            raise ValueError(f"Unsupported protobuf wire type {wtype}")
        yield fnum, wtype, val


@dataclass
class SentencePieceModel:
    pieces: list[str]
    scores: np.ndarray                    # float32 per piece
    types: np.ndarray                     # int per piece (NORMAL/UNKNOWN/...)
    unk_id: int = 0
    bos_id: int = -1
    eos_id: int = 1
    pad_id: int = -1
    add_dummy_prefix: bool = True
    remove_extra_whitespaces: bool = True
    escape_whitespaces: bool = True
    piece_to_id: dict = field(default_factory=dict)
    max_piece_len: int = 1
    byte_fallback: bool = False

    def __post_init__(self):
        self.piece_to_id = {p: i for i, p in enumerate(self.pieces)}
        self.max_piece_len = max((len(p) for p in self.pieces), default=1)
        self.byte_fallback = bool((self.types == BYTE).any())
        # UNKNOWN piece overrides unk_id if present
        unk = np.nonzero(self.types == UNKNOWN)[0]
        if unk.size:
            self.unk_id = int(unk[0])


def parse_model_proto(data: bytes) -> SentencePieceModel:
    """Parse a serialized sentencepiece ModelProto (.model file contents)."""
    pieces: list[str] = []
    scores: list[float] = []
    types: list[int] = []
    kw: dict = {}
    for fnum, wtype, val in _scan_fields(data):
        if fnum == 1 and wtype == 2:  # repeated SentencePiece
            piece, score, ptype = "", 0.0, NORMAL
            for f2, w2, v2 in _scan_fields(val):
                if f2 == 1 and w2 == 2:
                    piece = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            pieces.append(piece)
            scores.append(score)
            types.append(ptype)
        elif fnum == 2 and wtype == 2:  # TrainerSpec
            for f2, w2, v2 in _scan_fields(val):
                if w2 != 0:
                    continue
                if f2 == 40:
                    kw["unk_id"] = _zigzag_signed(v2)
                elif f2 == 41:
                    kw["bos_id"] = _zigzag_signed(v2)
                elif f2 == 42:
                    kw["eos_id"] = _zigzag_signed(v2)
                elif f2 == 43:
                    kw["pad_id"] = _zigzag_signed(v2)
        elif fnum == 3 and wtype == 2:  # NormalizerSpec
            for f2, w2, v2 in _scan_fields(val):
                if w2 != 0:
                    continue
                if f2 == 3:
                    kw["add_dummy_prefix"] = bool(v2)
                elif f2 == 4:
                    kw["remove_extra_whitespaces"] = bool(v2)
                elif f2 == 5:
                    kw["escape_whitespaces"] = bool(v2)
    return SentencePieceModel(pieces=pieces, scores=np.asarray(scores, np.float32),
                              types=np.asarray(types, np.int64), **kw)


def _zigzag_signed(v: int) -> int:
    """TrainerSpec ids are plain int32 varints; map 2^64-complement to signed."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _emit_varint(v: int) -> bytes:
    out = bytearray()
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def build_model_proto(pieces: list[tuple[str, float, int]], *, unk_id: int = 0,
                      bos_id: int = -1, eos_id: int = 1, pad_id: int = -1,
                      add_dummy_prefix: bool = True) -> bytes:
    """Serialize a minimal ModelProto — for tests and asset-free setups."""
    out = bytearray()
    for piece, score, ptype in pieces:
        body = bytearray()
        pb = piece.encode("utf-8")
        body += _emit_varint((1 << 3) | 2) + _emit_varint(len(pb)) + pb
        body += _emit_varint((2 << 3) | 5) + struct.pack("<f", score)
        body += _emit_varint((3 << 3) | 0) + _emit_varint(ptype)
        out += _emit_varint((1 << 3) | 2) + _emit_varint(len(body)) + bytes(body)
    ts = bytearray()
    for fnum, v in ((40, unk_id), (41, bos_id), (42, eos_id), (43, pad_id)):
        ts += _emit_varint((fnum << 3) | 0) + _emit_varint(v)
    out += _emit_varint((2 << 3) | 2) + _emit_varint(len(ts)) + bytes(ts)
    ns = bytearray()
    ns += _emit_varint((3 << 3) | 0) + _emit_varint(int(add_dummy_prefix))
    out += _emit_varint((3 << 3) | 2) + _emit_varint(len(ns)) + bytes(ns)
    return bytes(out)


# ---------------------------------------------------------------------------
# Unigram Viterbi segmentation
# ---------------------------------------------------------------------------


class SentencePieceProcessor:
    """Unigram encode/decode against a parsed model."""

    def __init__(self, model: SentencePieceModel):
        self.m = model
        finite = model.scores[np.isfinite(model.scores)]
        min_score = float(finite.min()) if finite.size else 0.0
        self.unk_score = min_score - _UNK_PENALTY
        # Pieces not eligible for segmentation: control/unused
        self._segmentable = {
            p: (i, float(model.scores[i])) for i, p in enumerate(model.pieces)
            if model.types[i] in (NORMAL, USER_DEFINED, BYTE)
        }

    # -- normalization ------------------------------------------------------

    def normalize(self, text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        if self.m.remove_extra_whitespaces:
            text = re.sub(r"\s+", " ", text).strip()
        if self.m.add_dummy_prefix:
            text = " " + text
        if self.m.escape_whitespaces:
            text = text.replace(" ", WS)
        return text

    # -- encoding -----------------------------------------------------------

    def encode(self, text: str, out_pieces: bool = False):
        """Viterbi-optimal unigram segmentation → ids (or piece strings)."""
        s = self.normalize(text)
        n = len(s)
        if n == 0:
            return []
        best = np.full(n + 1, -np.inf)
        best[0] = 0.0
        back: list[Optional[tuple[int, int]]] = [None] * (n + 1)  # (start, piece_id)
        maxlen = self.m.max_piece_len
        seg = self._segmentable
        for i in range(n):
            if not np.isfinite(best[i]):
                continue
            for ln in range(1, min(maxlen, n - i) + 1):
                sub = s[i:i + ln]
                hit = seg.get(sub)
                if hit is not None and best[i] + hit[1] > best[i + ln]:
                    best[i + ln] = best[i] + hit[1]
                    back[i + ln] = (i, hit[0])
            # Unknown: one char (or its UTF-8 bytes under byte-fallback);
            # competes in the lattice like any piece, at min_score - penalty
            j = i + 1
            unk_cost = best[i] + self.unk_score
            if unk_cost > best[j]:
                best[j] = unk_cost
                back[j] = (i, -1)
        ids: list[int] = []
        pos = n
        rev: list[int] = []
        while pos > 0:
            prev, pid = back[pos]
            rev.append(pid if pid >= 0 else self._unk_or_bytes(s[prev:pos]))
            pos = prev
        for pid in reversed(rev):
            if isinstance(pid, list):
                ids.extend(pid)
            else:
                ids.append(pid)
        if out_pieces:
            return [self.m.pieces[i] for i in ids]
        return ids

    def _unk_or_bytes(self, ch: str):
        if self.m.byte_fallback:
            byte_ids = []
            ok = True
            for b in ch.encode("utf-8"):
                pid = self.m.piece_to_id.get(f"<0x{b:02X}>")
                if pid is None:
                    ok = False
                    break
                byte_ids.append(pid)
            if ok:
                return byte_ids
        return self.m.unk_id

    # -- decoding -----------------------------------------------------------

    def decode(self, ids: Iterable[int]) -> str:
        out = []
        pending_bytes = bytearray()

        def flush():
            if pending_bytes:
                out.append(pending_bytes.decode("utf-8", errors="replace"))
                pending_bytes.clear()

        for i in ids:
            if i < 0 or i >= len(self.m.pieces):
                continue
            t = self.m.types[i]
            p = self.m.pieces[i]
            if t == BYTE:
                pending_bytes.append(int(p[1:-1], 16))
                continue
            flush()
            if t in (CONTROL, UNUSED):
                continue
            out.append("⁇" if t == UNKNOWN else p)
        flush()
        return "".join(out).replace(WS, " ").strip()


# ---------------------------------------------------------------------------
# TextTokenizer adapter (SigLIP-style)
# ---------------------------------------------------------------------------

_PUNCT_RE = re.compile(r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]")


def canonicalize_text(text: str, keep_punctuation_exact_string: Optional[str] = None) -> str:
    """SigLIP text canonicalization: strip punctuation, lowercase, collapse
    whitespace (mirrors open_clip tokenizer canonicalize_text semantics)."""
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            _PUNCT_RE.sub("", part) for part in text.split(keep_punctuation_exact_string))
    else:
        text = _PUNCT_RE.sub("", text)
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


class SentencePieceTokenizer(TextTokenizer):
    """SigLIP-style tokenizer: canonicalize → unigram encode; the base class
    appends the end token and pads with pad_id (ref embedders.py:320-329 batch
    tokenization contract)."""

    def __init__(self, model_path_or_bytes, context_length: int = 64,
                 canonicalize: bool = True, prefer_native: bool = False):
        data = (model_path_or_bytes if isinstance(model_path_or_bytes, bytes)
                else open(model_path_or_bytes, "rb").read())
        self.model = parse_model_proto(data)
        self.sp = SentencePieceProcessor(self.model)
        # The native processor normalizes with NFKC + whitespace collapsing,
        # not the model's precompiled nmt_nfkc charsmap; when the official
        # sentencepiece package is importable, use it for encoding so real
        # SigLIP .model assets tokenize exactly (exotic normalization cases).
        self._pkg_sp = None
        if not prefer_native:
            try:
                import sentencepiece as _spm

                pkg = _spm.SentencePieceProcessor()
                pkg.LoadFromSerializedProto(data)
                self._pkg_sp = pkg
            except Exception:
                self._pkg_sp = None
        self.canonicalize = canonicalize
        eos = self.model.eos_id if self.model.eos_id >= 0 else self.model.unk_id
        pad = self.model.pad_id if self.model.pad_id >= 0 else eos
        bos = self.model.bos_id if self.model.bos_id >= 0 else None
        super().__init__(context_length=context_length, vocab_size=len(self.model.pieces),
                         cased=not canonicalize, start_token_id=bos,
                         end_token_id=eos, pad_token_id=pad)

    def encode(self, text: str) -> list[int]:
        if self.canonicalize:
            text = canonicalize_text(text)
        if self._pkg_sp is not None:
            return list(self._pkg_sp.EncodeAsIds(text))
        return self.sp.encode(text)

    def decode(self, token_ids) -> str:
        return self.sp.decode(token_ids)
