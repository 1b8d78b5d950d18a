"""Pure-Python reader for SentencePiece ``.model`` files (ModelProto).

The reference tokenizes with a production SentencePiece model loaded by
the ``sentencepiece`` package
(`/root/reference/precondition/datamix_gemma/tokenizers/gemma_tokenizer.py`).
That package is not installed here, but the ``.model`` format itself is
just a protobuf (``sentencepiece_model.proto``, public schema from
google/sentencepiece) whose load-bearing content is the piece table:
``repeated SentencePiece pieces = 1`` with ``piece=1 (string)``,
``score=2 (float)``, ``type=3 (enum)``.  This module decodes that wire
format directly — varints, fixed32s and length-delimited fields — so a
real production model file (Gemma, T5, ...) loads without the package,
and `tokenizers.SentencePieceTokenizer` can fall back to native unigram
Viterbi inference over the decoded pieces.

Only the fields the tokenizer needs are materialized; unknown fields are
skipped by wire type, exactly as protobuf semantics require, so models
serialized by any sentencepiece version parse.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, Iterator, List, Optional, Tuple

# SentencePiece.Type enum (sentencepiece_model.proto).
NORMAL = 1
UNKNOWN = 2
CONTROL = 3
USER_DEFINED = 4
UNUSED = 5
BYTE = 6

_WIRE_VARINT = 0
_WIRE_FIXED64 = 1
_WIRE_LEN = 2
_WIRE_FIXED32 = 5


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
  result = 0
  shift = 0
  while True:
    if pos >= len(buf):
      raise ValueError("truncated varint")
    b = buf[pos]
    pos += 1
    result |= (b & 0x7F) << shift
    if not b & 0x80:
      return result, pos
    shift += 7
    if shift > 63:
      raise ValueError("varint too long")


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
  """Yields (field_number, wire_type, value) over one message's bytes."""
  pos = 0
  n = len(buf)
  while pos < n:
    key, pos = _read_varint(buf, pos)
    field, wire = key >> 3, key & 7
    if wire == _WIRE_VARINT:
      val, pos = _read_varint(buf, pos)
    elif wire == _WIRE_FIXED64:
      val = buf[pos:pos + 8]
      pos += 8
    elif wire == _WIRE_LEN:
      ln, pos = _read_varint(buf, pos)
      val = buf[pos:pos + ln]
      if len(val) != ln:
        raise ValueError("truncated length-delimited field")
      pos += ln
    elif wire == _WIRE_FIXED32:
      val = buf[pos:pos + 4]
      pos += 4
    else:
      raise ValueError(f"unsupported wire type {wire}")
    yield field, wire, val


@dataclasses.dataclass
class SpmModel:
  """Decoded piece table of a SentencePiece model.

  ``pieces[i]`` is ``(piece, score, type)`` for token id ``i`` — ids ARE
  positions in the repeated field, the same contract the real package
  exposes via ``id_to_piece``.
  """

  pieces: List[Tuple[str, float, int]]
  # From trainer_spec when present (fields 40-43); standard defaults else.
  unk_id: int = 0
  bos_id: int = 1
  eos_id: int = 2
  pad_id: int = -1

  def __post_init__(self):
    self.piece_to_id: Dict[str, int] = {
        p: i for i, (p, _, _) in enumerate(self.pieces)}
    self.byte_ids: Dict[int, int] = {}
    for i, (p, _, t) in enumerate(self.pieces):
      if t == BYTE and len(p) == 6 and p.startswith("<0x"):
        self.byte_ids[int(p[3:5], 16)] = i
    # The UNKNOWN-typed piece overrides trainer_spec's unk_id if present.
    for i, (_, _, t) in enumerate(self.pieces):
      if t == UNKNOWN:
        self.unk_id = i
        break

  @property
  def vocab_size(self) -> int:
    return len(self.pieces)


def _parse_sentencepiece(buf: bytes) -> Tuple[str, float, int]:
  piece, score, ptype = "", 0.0, NORMAL
  for field, wire, val in _iter_fields(buf):
    if field == 1 and wire == _WIRE_LEN:
      piece = val.decode("utf-8")
    elif field == 2 and wire == _WIRE_FIXED32:
      score = struct.unpack("<f", val)[0]
    elif field == 3 and wire == _WIRE_VARINT:
      ptype = int(val)
  return piece, score, ptype


def _parse_trainer_spec(buf: bytes) -> Dict[str, int]:
  out: Dict[str, int] = {}
  names = {40: "unk_id", 41: "bos_id", 42: "eos_id", 43: "pad_id"}
  for field, wire, val in _iter_fields(buf):
    if field in names and wire == _WIRE_VARINT:
      # ids are int32; -1 (pad disabled) arrives as a 64-bit two's
      # complement varint.
      v = int(val)
      if v >= 1 << 63:
        v -= 1 << 64
      out[names[field]] = v
  return out


def parse_model_proto(data: bytes) -> SpmModel:
  """Decode a serialized ModelProto's piece table + special ids."""
  pieces: List[Tuple[str, float, int]] = []
  spec: Dict[str, int] = {}
  for field, wire, val in _iter_fields(data):
    if field == 1 and wire == _WIRE_LEN:  # repeated SentencePiece pieces
      pieces.append(_parse_sentencepiece(val))
    elif field == 2 and wire == _WIRE_LEN:  # TrainerSpec trainer_spec
      spec = _parse_trainer_spec(val)
  if not pieces:
    raise ValueError("no pieces found: not a SentencePiece model file?")
  return SpmModel(pieces=pieces, **spec)


def load_model(path: str) -> SpmModel:
  with open(path, "rb") as f:
    return parse_model_proto(f.read())


# --------------------------------------------------------------- encoder --
_SPM_WS = "▁"  # the ▁ word marker


class NativeUnigramEncoder:
  """Unigram-LM Viterbi inference over a decoded `SpmModel`.

  Mirrors SentencePiece's unigram segmenter on its default text
  normalization: ``add_dummy_prefix`` (a leading space) and
  ``escape_whitespaces`` (space -> ▁), then one Viterbi pass over the
  whole sequence (pieces may span word boundaries, as in SPM).  Byte
  fallback covers characters outside the vocabulary when the model has
  ``<0xXX>`` pieces; otherwise they map to ``unk_id``.
  """

  def __init__(self, model: SpmModel):
    self.model = model
    self._scores = {
        p: s for p, s, t in model.pieces
        if t in (NORMAL, USER_DEFINED)}
    self._max_len = max((len(p) for p in self._scores), default=1)
    floor = min(self._scores.values(), default=0.0)
    # SPM scores byte pieces far below real pieces; mirror that so byte
    # fallback only fires for genuinely uncovered characters.
    self._byte_score = floor - 10.0
    self._unk_score = floor - 20.0

  def encode(self, text: str, add_bos: bool = False,
             add_eos: bool = False) -> List[int]:
    m = self.model
    s = _SPM_WS + text.replace(" ", _SPM_WS)
    n = len(s)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: List[Optional[Tuple[int, Optional[str]]]] = [None] * (n + 1)
    best[0] = 0.0
    for end in range(1, n + 1):
      for start in range(max(0, end - self._max_len), end):
        if best[start] == NEG:
          continue
        sc = self._scores.get(s[start:end])
        if sc is not None and best[start] + sc > best[end]:
          best[end] = best[start] + sc
          back[end] = (start, s[start:end])
      start = end - 1  # single-char byte/unk fallback
      if best[start] != NEG:
        ch = s[start:end]
        nb = len(ch.encode("utf-8"))
        fb = best[start] + (
            self._byte_score * nb if m.byte_ids else self._unk_score)
        if fb > best[end]:
          best[end] = fb
          back[end] = (start, None)
    ids: List[int] = []
    pos = n
    while pos > 0:
      start, piece = back[pos]
      if piece is not None:
        ids.insert(0, m.piece_to_id[piece])
      elif m.byte_ids:
        ids[:0] = [m.byte_ids.get(b, m.unk_id)
                   for b in s[start:pos].encode("utf-8")]
      else:
        ids.insert(0, m.unk_id)
      pos = start
    if add_bos:
      ids.insert(0, m.bos_id)
    if add_eos:
      ids.append(m.eos_id)
    return ids

  def decode(self, ids) -> str:
    m = self.model
    special = {m.bos_id, m.eos_id, m.pad_id, m.unk_id}
    out: List[bytes] = []
    for i in ids:
      if i in special or not 0 <= i < len(m.pieces):
        continue
      piece, _, ptype = m.pieces[i]
      if ptype == BYTE:
        out.append(bytes([int(piece[3:5], 16)]))
      elif ptype in (NORMAL, USER_DEFINED):
        out.append(piece.encode("utf-8"))
    text = b"".join(out).decode("utf-8", errors="replace")
    return text.replace(_SPM_WS, " ").lstrip(" ")
