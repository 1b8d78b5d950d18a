"""Byte-pair-encoding utilities for prompt cropping.

Equivalent of the reference's `datamix_gemma/evals/crop.py`, which wraps
the GPT-2 BPE encoder (downloaded from OpenAI's bucket at import time)
solely to crop few-shot prompts to a token budget.  This version is
self-contained for zero-egress environments: the same byte-level BPE
machinery, but with merges *trained* on any in-repo corpus (or loaded
from a JSON manifest) instead of fetched over the network.  Round-trips
are lossless (`decode(encode(s)) == s`) for arbitrary UTF-8 text, which
is the property `crop_prompt` relies on.

Reference behavior matched: `crop.py:208-220` (`crop_prompt` encodes,
truncates to the budget, decodes); `crop.py:166-180` (byte-level
encode/decode).
"""

from __future__ import annotations

import collections
import json
from typing import Dict, Iterable, List, Optional, Sequence, Tuple


class BPEEncoder:
  """Byte-level BPE: ids 0..255 are raw bytes, 256+ are learned merges.

  Unlike the GPT-2 table (which needs a 50k-entry download), the vocab is
  fully determined by an ordered list of merge pairs, so an encoder is
  serializable as a small JSON list and trainable offline.
  """

  def __init__(self, merges: Sequence[Tuple[int, int]] = ()):
    self.merges: List[Tuple[int, int]] = [tuple(m) for m in merges]
    # Merge ranks: earlier merges bind tighter (classic BPE priority).
    self._rank: Dict[Tuple[int, int], int] = {
        pair: i for i, pair in enumerate(self.merges)}
    # Token id -> byte string.
    self._bytes: List[bytes] = [bytes([b]) for b in range(256)]
    for a, b in self.merges:
      self._bytes.append(self._bytes[a] + self._bytes[b])

  @property
  def vocab_size(self) -> int:
    return len(self._bytes)

  def encode(self, text: str) -> List[int]:
    ids = list(text.encode("utf-8"))
    if not self._rank:
      return ids
    while len(ids) > 1:
      # Lowest-rank (earliest-learned) adjacent pair merges first.
      best, best_rank = None, None
      for pair in zip(ids, ids[1:]):
        r = self._rank.get(pair)
        if r is not None and (best_rank is None or r < best_rank):
          best, best_rank = pair, r
      if best is None:
        break
      merged_id = 256 + best_rank
      out, i = [], 0
      while i < len(ids):
        if i + 1 < len(ids) and (ids[i], ids[i + 1]) == best:
          out.append(merged_id)
          i += 2
        else:
          out.append(ids[i])
          i += 1
      ids = out
    return ids

  def decode(self, ids: Iterable[int]) -> str:
    return b"".join(self._bytes[i] for i in ids).decode(
        "utf-8", errors="replace")

  def to_json(self) -> str:
    return json.dumps(self.merges)

  @classmethod
  def from_json(cls, s: str) -> "BPEEncoder":
    return cls([tuple(m) for m in json.loads(s)])


def train_bpe(corpus: Iterable[str], num_merges: int = 256) -> BPEEncoder:
  """Learn a merge table from text: repeatedly fuse the most frequent
  adjacent token pair (the standard BPE training loop)."""
  seqs = [list(doc.encode("utf-8")) for doc in corpus]
  merges: List[Tuple[int, int]] = []
  for _ in range(num_merges):
    counts = collections.Counter()
    for seq in seqs:
      counts.update(zip(seq, seq[1:]))
    if not counts:
      break
    pair, freq = counts.most_common(1)[0]
    if freq < 2:
      break
    new_id = 256 + len(merges)
    merges.append(pair)
    for k, seq in enumerate(seqs):
      out, i = [], 0
      while i < len(seq):
        if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
          out.append(new_id)
          i += 2
        else:
          out.append(seq[i])
          i += 1
      seqs[k] = out
  return BPEEncoder(merges)


def crop_prompt(prompt: str, max_tokens: int = 2048,
                enc: Optional[BPEEncoder] = None) -> str:
  """Crop a prompt to at most ``max_tokens`` BPE tokens (keeping the
  head, as the reference does — few-shot prompts end with the live
  question, so callers should prefer `few_shot.assemble`'s
  drop-exemplars loop; this is the raw primitive)."""
  enc = enc or BPEEncoder()
  return enc.decode(enc.encode(prompt)[:max_tokens])


def crop(s: str, max_tokens: int = 2048,
         enc: Optional[BPEEncoder] = None) -> str:
  """Alias matching the reference's public name (`crop.py:218-220`)."""
  return crop_prompt(s, max_tokens, enc)
