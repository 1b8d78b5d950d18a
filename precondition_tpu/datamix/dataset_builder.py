"""Dataset builders: tokenized, padded example streams per data source.

Equivalent of the reference's builder family
(`/root/reference/precondition/datamix_gemma/dataset_builders/`), without
the TensorFlow dependency: builders yield numpy `Example`s directly.  The
reference ships 16 builders over TFDS/HF corpora (GSM8K, OpenOrca,
OrcaMath, SciQ, CodeAlpaca, MetaMath, Dolly, MBPP, MTNT, Wikipedia);
here the same contract is provided with:

* `TextDatasetBuilder` — wraps any (prompt, answer) text iterator + a
  tokenizer callable; covers all the reference's instruction-tuning
  builders given their corpora.
* `HuggingFaceDatasetBuilder` — loads any HF dataset by name/field mapping
  when `datasets` is installed (gated; zero-egress environments fall back).
* `SyntheticTaskBuilder` — deterministic arithmetic-language tasks used by
  the in-repo bandit demos and tests (no downloads required).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, List, NamedTuple, Optional, Sequence

import numpy as np


class Example(NamedTuple):
  input_tokens: np.ndarray  # [seq_len] int32
  target_mask: np.ndarray   # [seq_len] bool — positions contributing loss


class DatasetBuilder:
  """Base: tokenize, concatenate prompt+answer, pad to max_seq_len."""

  def __init__(self, tokenizer: Callable[[str], List[int]],
               max_seq_len: int, pad_id: int = 0):
    self.tokenizer = tokenizer
    self.max_seq_len = max_seq_len
    self.pad_id = pad_id

  def pad_up_to_max_len(self, tokens: np.ndarray) -> np.ndarray:
    if len(tokens) >= self.max_seq_len:
      return tokens[: self.max_seq_len]
    return np.pad(tokens, (0, self.max_seq_len - len(tokens)),
                  constant_values=self.pad_id)

  def to_example(self, prompt: str, answer: str) -> Example:
    prompt_ids = self.tokenizer(prompt)
    answer_ids = self.tokenizer(answer)
    tokens = np.asarray(prompt_ids + answer_ids, np.int32)
    mask = np.asarray(
        [False] * len(prompt_ids) + [True] * len(answer_ids), bool)
    tokens = self.pad_up_to_max_len(tokens)
    mask = self.pad_up_to_max_len(mask.astype(np.int32)).astype(bool)
    return Example(tokens, mask)

  def get_train_dataset(self, batch_size: int = 1,
                        num_epochs: int = 1) -> Iterator[Example]:
    raise NotImplementedError

  def num_examples(self) -> int:
    raise NotImplementedError


class TextDatasetBuilder(DatasetBuilder):
  """Builder over an in-memory list of (prompt, answer) pairs."""

  def __init__(self, pairs: Sequence, tokenizer, max_seq_len: int,
               pad_id: int = 0, vocab_size: Optional[int] = None):
    super().__init__(tokenizer, max_seq_len, pad_id)
    self.pairs = list(pairs)
    self.vocab_size = vocab_size  # enables the native batch path

  def get_train_dataset(self, batch_size: int = 1, num_epochs: int = 1):
    for _ in range(num_epochs):
      for prompt, answer in self.pairs:
        yield self.to_example(prompt, answer)

  def to_examples_batch(self, pairs: Sequence) -> List[Example]:
    """Batch tokenise+pad+mask; C++ fast path when vocab_size is set
    (byte-level tokenisation) and `native.batchio` is available."""
    if self.vocab_size is not None:
      from precondition_tpu.datamix import native

      if native.available():
        tokens, masks = native.build_examples(
            list(pairs), self.max_seq_len, self.vocab_size, self.pad_id)
        return [Example(tokens[i], masks[i]) for i in range(len(pairs))]
    return [self.to_example(p, a) for p, a in pairs]

  def num_examples(self) -> int:
    return len(self.pairs)


class HuggingFaceDatasetBuilder(TextDatasetBuilder):
  """Builder over a HuggingFace dataset (gated on `datasets` availability)."""

  def __init__(self, dataset_name: str, prompt_field: str, answer_field: str,
               tokenizer, max_seq_len: int, split: str = "train",
               pad_id: int = 0, limit: Optional[int] = None):
    try:
      import datasets  # pytype: disable=import-error
    except ImportError as e:
      raise ImportError(
          "HuggingFaceDatasetBuilder requires the `datasets` package; use "
          "TextDatasetBuilder or SyntheticTaskBuilder instead") from e
    ds = datasets.load_dataset(dataset_name, split=split)
    pairs = []
    for i, row in enumerate(ds):
      if limit is not None and i >= limit:
        break
      pairs.append((str(row[prompt_field]), str(row[answer_field])))
    super().__init__(pairs, tokenizer, max_seq_len, pad_id)


def char_tokenizer(vocab_size: int = 128) -> Callable[[str], List[int]]:
  """Byte-level fallback tokenizer (ids 2..vocab-1; 0=pad, 1=eos)."""
  def tok(text: str) -> List[int]:
    return [2 + (b % (vocab_size - 2)) for b in text.encode("utf-8")]

  return tok


@dataclasses.dataclass
class SyntheticTaskBuilder(DatasetBuilder):
  """Deterministic skill-specific tasks for bandit-loop demos and tests.

  Each builder emulates one "dataset" whose examples exercise a single
  skill (modular addition with a given modulus); mixing weights over
  several of these have a measurable effect on per-skill eval accuracy,
  which is exactly what the bandit loop needs to see.
  """

  def __init__(self, skill: int, vocab_size: int, max_seq_len: int,
               n: int = 512, seed: int = 0):
    super().__init__(char_tokenizer(vocab_size), max_seq_len)
    self.skill = skill
    self.n = n
    rng = np.random.RandomState(seed + skill)
    lo = 2
    hi = vocab_size
    self._examples = []
    for _ in range(n):
      a = rng.randint(lo, hi)
      b = rng.randint(1, 5)
      prompt = [a, self.skill % (hi - lo) + lo]
      answer = [(a + b * (self.skill + 1)) % (hi - lo) + lo, 1]
      tokens = np.asarray(prompt + answer, np.int32)
      mask = np.asarray([False] * len(prompt) + [True] * len(answer))
      self._examples.append(Example(
          self.pad_up_to_max_len(tokens),
          self.pad_up_to_max_len(mask.astype(np.int32)).astype(bool)))

  def get_train_dataset(self, batch_size: int = 1, num_epochs: int = 1):
    for _ in range(num_epochs):
      yield from self._examples

  def num_examples(self) -> int:
    return self.n
