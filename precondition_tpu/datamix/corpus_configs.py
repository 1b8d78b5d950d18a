"""Materialized per-corpus builder configs.

The reference ships one builder class per corpus
(`datamix_gemma/dataset_builders/*_dataset_builder.py`, 14 files), each
hard-coding a TFDS/HF identifier, record field names, and prompt
framing, plus "preprocessed" twins that read pre-tokenized TFRecords
from local paths.  Here that knowledge is data, not classes: a
`CorpusConfig` registry covering every corpus the reference trains on,
consumed by one generic loader that yields `TextDatasetBuilder`s from

* a HuggingFace dataset (when `datasets` is importable — the reference's
  `tfds.load('huggingface:...')` path), or
* a local JSONL manifest (the zero-egress equivalent of the reference's
  preprocessed TFRecords: one JSON object per line with the corpus's raw
  field names).

Reference field mappings reproduced (file:line into `/root/reference/
precondition/datamix_gemma/dataset_builders/`):
gsm8k_dataset_builder.py:68-71,86-90 · open_orca_dataset_builder.py:
56,129-131 · orca_math_dataset_builder.py:38-41,54-55,115-116 ·
mtnt_dataset_builder.py:52-53,104-105 · mbpp_dataset_builder.py:48-66 ·
and the preprocessed twins (pre-tokenized; same corpora).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from precondition_tpu.datamix import dataset_builder

Pair = Tuple[str, str]


def _qa(prompt_prefix: str, prompt_suffix: str, answer_prefix: str,
        answer_suffix: str, q_field: str, a_field: str
        ) -> Callable[[dict], Pair]:
  def convert(rec: dict) -> Pair:
    return (prompt_prefix + str(rec[q_field]) + prompt_suffix,
            answer_prefix + str(rec[a_field]) + answer_suffix)
  return convert


def _open_orca(rec: dict) -> Pair:
  sys_prompt = str(rec.get("system_prompt", ""))
  prompt = (sys_prompt + "\n" if sys_prompt else "") + str(rec["question"])
  return prompt + "\n", str(rec["response"])


def _mbpp(rec: dict) -> Pair:
  tests = rec.get("test_list", ())
  tests_str = "\n".join(str(t) for t in tests)
  prompt = "{}\nYour code should pass these tests:\n{}\n".format(
      rec["text"], tests_str)
  return prompt, str(rec["code"])


def _sciq(rec: dict) -> Pair:
  support = str(rec.get("support", ""))
  prompt = (support + "\n" if support else "") + str(rec["question"]) + "\n"
  return prompt, str(rec["correct_answer"])


def _dolly(rec: dict) -> Pair:
  context = str(rec.get("context", ""))
  prompt = str(rec["instruction"]) + ("\n" + context if context else "") + "\n"
  return prompt, str(rec["response"])


def _codealpaca(rec: dict) -> Pair:
  inp = str(rec.get("input", ""))
  prompt = str(rec["instruction"]) + ("\n" + inp if inp else "") + "\n"
  return prompt, str(rec["output"])


def _wikipedia(rec: dict) -> Pair:
  # Pure language modelling: empty prompt, loss over the whole text.
  return "", str(rec["text"])


@dataclasses.dataclass(frozen=True)
class CorpusConfig:
  """Everything needed to build one corpus's dataset builder."""

  name: str
  hf_name: str                      # HuggingFace dataset identifier
  record_to_pair: Callable[[dict], Pair]
  split: str = "train"
  hf_config: Optional[str] = None   # e.g. 'main' for gsm8k
  eval_preamble: str = ""           # few-shot preamble used by the evals


REGISTRY: Dict[str, CorpusConfig] = {
    cfg.name: cfg for cfg in [
        CorpusConfig(
            name="gsm8k", hf_name="gsm8k", hf_config="main",
            record_to_pair=_qa("Q: ", "\n", "A: ", "\n",
                               "question", "answer"),
            eval_preamble=("As an expert problem solver solve step by step "
                           "the following mathematical questions.")),
        CorpusConfig(
            name="open_orca", hf_name="Open-Orca/OpenOrca",
            record_to_pair=_open_orca),
        CorpusConfig(
            name="orca_math",
            hf_name="microsoft/orca-math-word-problems-200k",
            record_to_pair=_qa("Question: \n", "\n", "", "",
                               "question", "answer")),
        CorpusConfig(
            name="mtnt", hf_name="mtnt", hf_config="en-fr",
            record_to_pair=_qa("", "\n", "", "", "src", "dst")),
        CorpusConfig(
            name="mbpp", hf_name="mbpp", hf_config="full",
            record_to_pair=_mbpp),
        CorpusConfig(name="sciq", hf_name="allenai/sciq",
                     record_to_pair=_sciq),
        CorpusConfig(name="dolly",
                     hf_name="databricks/databricks-dolly-15k",
                     record_to_pair=_dolly),
        CorpusConfig(name="codealpaca",
                     hf_name="sahil2801/CodeAlpaca-20k",
                     record_to_pair=_codealpaca),
        CorpusConfig(name="metamath", hf_name="meta-math/MetaMathQA",
                     record_to_pair=_qa("", "\n", "", "",
                                        "query", "response")),
        CorpusConfig(name="wikipedia", hf_name="wikipedia",
                     hf_config="20220301.en", record_to_pair=_wikipedia),
    ]
}


def load_jsonl(path: str) -> List[dict]:
  records = []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if line:
        records.append(json.loads(line))
  return records


def build_from_records(
    name: str, records: Sequence[dict], tokenizer, max_seq_len: int,
    pad_id: int = 0, vocab_size: Optional[int] = None,
) -> dataset_builder.TextDatasetBuilder:
  """A corpus's `TextDatasetBuilder` from already-loaded raw records.

  ``tokenizer`` is either a callable ``str -> List[int]`` or a string
  spec resolved through `tokenizers.make_tokenizer` (``"char"``,
  ``"unigram:<path>"``, ``"spm:<path>"`` — the latter two give the
  subword paths mirroring the reference's SentencePiece Gemma tokenizer,
  `datamix_gemma/tokenizers/gemma_tokenizer.py`).
  """
  if isinstance(tokenizer, str):
    from precondition_tpu.datamix import tokenizers

    tokenizer = tokenizers.make_tokenizer(tokenizer, vocab_size or 128)
    if vocab_size is None and hasattr(tokenizer, "vocab_size"):
      vocab_size = tokenizer.vocab_size
  cfg = REGISTRY[name]
  pairs = [cfg.record_to_pair(r) for r in records]
  return dataset_builder.TextDatasetBuilder(
      pairs, tokenizer, max_seq_len, pad_id=pad_id, vocab_size=vocab_size)


def build_offline(
    name: str, manifest_dir: str, tokenizer, max_seq_len: int,
    pad_id: int = 0, vocab_size: Optional[int] = None,
) -> dataset_builder.TextDatasetBuilder:
  """The preprocessed-twin path: `<manifest_dir>/<name>.jsonl` of raw
  records in the corpus's native schema (the zero-egress stand-in for
  the reference's `*_train.tfrecord` files)."""
  return build_from_records(
      name, load_jsonl(os.path.join(manifest_dir, name + ".jsonl")),
      tokenizer, max_seq_len, pad_id=pad_id, vocab_size=vocab_size)


def build_online(
    name: str, tokenizer, max_seq_len: int, pad_id: int = 0,
    limit: Optional[int] = None,
) -> dataset_builder.TextDatasetBuilder:
  """The `tfds.load('huggingface:...')` path, via `datasets` (gated)."""
  try:
    import datasets  # pytype: disable=import-error
  except ImportError as e:
    raise ImportError(
        "build_online requires the `datasets` package; in offline "
        "environments use build_offline with a JSONL manifest") from e
  cfg = REGISTRY[name]
  ds = datasets.load_dataset(cfg.hf_name, cfg.hf_config, split=cfg.split)
  records = []
  for i, row in enumerate(ds):
    if limit is not None and i >= limit:
      break
    records.append(dict(row))
  return build_from_records(name, records, tokenizer, max_seq_len, pad_id)
