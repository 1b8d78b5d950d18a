"""Subword tokenizers for the datamix stack.

The reference tokenizes with a production SentencePiece Gemma model
(`/root/reference/precondition/datamix_gemma/tokenizers/gemma_tokenizer.py`
wrapping `spm.SentencePieceProcessor`).  That exact model file cannot be
fetched in a zero-egress environment, so this module provides:

* `UnigramTokenizer` — a self-contained SentencePiece-style **unigram
  language model** tokenizer: SPM's whitespace marker (``▁``), Viterbi
  segmentation, byte fallback for uncovered characters, and offline
  Viterbi-EM training with vocabulary pruning.  Same algorithm family as
  Gemma's production tokenizer (unigram LM), same id conventions
  (0=pad, 1=eos, 2=bos, 3=unk, then 256 byte-fallback pieces), trainable
  on the committed fixture corpora so datamix evals exercise
  subword-faithful token streams instead of the byte-level stand-in.
* `SentencePieceTokenizer` — a thin adapter over the real
  ``sentencepiece`` package when it is installed (gated import), exposing
  the same ``encode``/``decode``/``__call__`` surface so a production
  ``.model`` file drops in without touching builder code.
* `make_tokenizer` — string-spec factory used by corpus configs:
  ``"char"``, ``"unigram:<path>"``, ``"spm:<path>"``.

All tokenizers are plain callables ``str -> List[int]`` (the builder
contract in `dataset_builder.DatasetBuilder`).
"""

from __future__ import annotations

import collections
import json
import math
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

_WS = "▁"  # SPM's U+2581 LOWER ONE EIGHTH BLOCK word marker.

PAD_ID = 0
EOS_ID = 1
BOS_ID = 2
UNK_ID = 3
_BYTE_OFFSET = 4          # ids 4..259 are the <0xXX> byte-fallback pieces
_FIRST_PIECE = _BYTE_OFFSET + 256


def _pretokenize(text: str) -> List[str]:
  """Whitespace split with the SPM word marker prepended to each word."""
  return [_WS + w for w in text.split()]


class UnigramTokenizer:
  """SentencePiece-style unigram LM tokenizer (Viterbi segmentation).

  ``pieces`` maps piece string -> log probability.  Characters not covered
  by any piece fall back to raw UTF-8 byte ids, exactly like SPM's
  ``byte_fallback`` mode, so round-trips are lossless on arbitrary text.
  """

  def __init__(self, pieces: Dict[str, float]):
    assert pieces, "empty vocabulary"
    self._pieces = dict(pieces)
    self._ids = {s: _FIRST_PIECE + i for i, s in enumerate(sorted(pieces))}
    self._strs = {i: s for s, i in self._ids.items()}
    self._max_len = max(len(s) for s in pieces)
    # Byte fallback must cost more than any real piece so Viterbi only
    # chooses it for genuinely uncovered characters.
    self._byte_logp = min(pieces.values()) - 10.0

  # ------------------------------------------------------------- encode --
  @property
  def vocab_size(self) -> int:
    return _FIRST_PIECE + len(self._pieces)

  def piece_to_id(self, piece: str) -> int:
    return self._ids.get(piece, UNK_ID)

  def id_to_piece(self, i: int) -> str:
    return self._strs.get(i, "<unk>")

  def _viterbi(self, word: str) -> List[int]:
    """Best segmentation of one pretoken under the unigram LM."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back: List[Optional[Tuple[int, Optional[str]]]] = [None] * (n + 1)
    best[0] = 0.0
    for end in range(1, n + 1):
      for start in range(max(0, end - self._max_len), end):
        if best[start] == -math.inf:
          continue
        piece = word[start:end]
        logp = self._pieces.get(piece)
        if logp is not None and best[start] + logp > best[end]:
          best[end] = best[start] + logp
          back[end] = (start, piece)
      # Byte fallback for the single character ending here.
      start = end - 1
      nbytes = len(word[start:end].encode("utf-8"))
      fallback = best[start] + self._byte_logp * nbytes
      if fallback > best[end]:
        best[end] = fallback
        back[end] = (start, None)
    ids: List[int] = []
    pos = n
    while pos > 0:
      start, piece = back[pos]
      if piece is None:
        ids[:0] = [_BYTE_OFFSET + b
                   for b in word[start:pos].encode("utf-8")]
      else:
        ids.insert(0, self._ids[piece])
      pos = start
    return ids

  def encode(self, text: str, add_bos: bool = False,
             add_eos: bool = False) -> List[int]:
    ids: List[int] = [BOS_ID] if add_bos else []
    for word in _pretokenize(text):
      ids.extend(self._viterbi(word))
    if add_eos:
      ids.append(EOS_ID)
    return ids

  __call__ = encode

  def decode(self, ids: Sequence[int]) -> str:
    out: List[bytes] = []
    for i in ids:
      if i in (PAD_ID, BOS_ID, EOS_ID, UNK_ID):
        continue
      if _BYTE_OFFSET <= i < _FIRST_PIECE:
        out.append(bytes([i - _BYTE_OFFSET]))
      else:
        out.append(self._strs.get(i, "").encode("utf-8"))
    text = b"".join(out).decode("utf-8", errors="replace")
    return text.replace(_WS, " ").lstrip(" ")

  # -------------------------------------------------------- persistence --
  def save(self, path: str) -> None:
    with open(path, "w") as f:
      json.dump({"pieces": self._pieces}, f)

  @classmethod
  def load(cls, path: str) -> "UnigramTokenizer":
    with open(path) as f:
      return cls(json.load(f)["pieces"])

  # ----------------------------------------------------------- training --
  @classmethod
  def train(cls, corpus: Iterable[str], vocab_size: int = 512,
            max_piece_len: int = 8, em_rounds: int = 3,
            seed_factor: int = 8) -> "UnigramTokenizer":
    """Offline unigram-LM training: seed, Viterbi-EM, prune.

    The classic SPM recipe compressed to its load-bearing parts: a large
    seed vocabulary of frequent substrings, alternating (E) Viterbi
    segmentation counts under current piece probabilities with (M)
    re-normalized probabilities, pruning the least-used pieces between
    rounds until ``vocab_size`` learned pieces remain.  Single characters
    are never pruned (coverage), mirroring SPM's required-char handling.
    """
    words = collections.Counter()
    for line in corpus:
      for w in _pretokenize(line):
        words[w] += 1
    assert words, "empty training corpus"

    # Seed: all substrings up to max_piece_len, scored by count * len.
    substr = collections.Counter()
    for w, c in words.items():
      for i in range(len(w)):
        for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
          substr[w[i:j]] += c
    chars = {s for s in substr if len(s) == 1}
    target_learned = max(vocab_size, len(chars) + 1)
    seed_size = max(target_learned * seed_factor, len(chars))
    seed = dict(substr.most_common(seed_size))
    for ch in chars:  # guarantee coverage
      seed.setdefault(ch, substr[ch])

    total = sum(seed.values())
    pieces = {s: math.log(c / total) for s, c in seed.items()}

    for _ in range(em_rounds):
      tok = cls(pieces)
      counts = collections.Counter()
      for w, c in words.items():
        for i in tok._viterbi(w):
          if i >= _FIRST_PIECE:
            counts[tok._strs[i]] += c
      # M-step with add-epsilon smoothing so unused-but-kept chars survive.
      tot = sum(counts.values()) + len(pieces)
      new_pieces = {s: math.log((counts[s] + 1e-3) / tot) for s in pieces}
      # Prune: drop the least-used multi-char pieces, never single chars.
      keep = sorted(
          new_pieces,
          key=lambda s: (len(s) == 1, counts[s]), reverse=True)
      learned = set(keep[:target_learned]) | chars
      pieces = {s: new_pieces[s] for s in learned}
    return cls(pieces)


class SentencePieceTokenizer:
  """Loads a production SentencePiece ``.model`` file.

  Uses the real ``sentencepiece`` package when installed; otherwise falls
  back to the pure-Python ModelProto reader + native unigram Viterbi
  inference in `spm_model` — so a production ``.model`` (e.g. Gemma's
  tokenizer, reference:
  `datamix_gemma/tokenizers/gemma_tokenizer.py`) drops into the same
  builder contract with no extra dependency.  Set ``native=True`` to
  force the fallback (tests pin both paths to the same ids where both
  are available).
  """

  def __init__(self, model_path: str, native: bool = False):
    self._sp = None
    if not native:
      try:
        import sentencepiece as spm  # pytype: disable=import-error

        self._sp = spm.SentencePieceProcessor(model_file=model_path)
      except ImportError:
        pass
    if self._sp is None:
      from precondition_tpu.datamix import spm_model

      self._native = spm_model.NativeUnigramEncoder(
          spm_model.load_model(model_path))

  @property
  def vocab_size(self) -> int:
    if self._sp is not None:
      return self._sp.vocab_size()
    return self._native.model.vocab_size

  def encode(self, text: str, add_bos: bool = False,
             add_eos: bool = False) -> List[int]:
    if self._sp is not None:
      return self._sp.encode(text, add_bos=add_bos, add_eos=add_eos)
    return self._native.encode(text, add_bos=add_bos, add_eos=add_eos)

  __call__ = encode

  def decode(self, ids: Sequence[int]) -> str:
    if self._sp is not None:
      return self._sp.decode(list(ids))
    return self._native.decode(list(ids))


def train_from_manifests(manifest_dir: str, names: Sequence[str],
                         vocab_size: int = 512,
                         **train_kw) -> UnigramTokenizer:
  """Train a `UnigramTokenizer` on offline JSONL corpus manifests.

  Every string value of every record contributes to the training text —
  the offline analogue of training a SentencePiece model on the corpus
  mix before finetuning.
  """
  import os

  corpus: List[str] = []
  for name in names:
    with open(os.path.join(manifest_dir, name + ".jsonl")) as f:
      for line in f:
        line = line.strip()
        if not line:
          continue
        for v in json.loads(line).values():
          if isinstance(v, str):
            corpus.append(v)
          elif isinstance(v, list):
            corpus.extend(x for x in v if isinstance(x, str))
  return UnigramTokenizer.train(corpus, vocab_size=vocab_size, **train_kw)


def make_tokenizer(spec: str, vocab_size: int = 128):
  """Factory for corpus configs: ``char`` | ``unigram:<path>`` |
  ``spm:<path>``."""
  if spec == "char":
    from precondition_tpu.datamix import dataset_builder

    return dataset_builder.char_tokenizer(vocab_size)
  kind, _, path = spec.partition(":")
  if kind == "unigram":
    return UnigramTokenizer.load(path)
  if kind == "spm":
    return SentencePieceTokenizer(path)
  raise ValueError(f"unknown tokenizer spec: {spec!r}")
