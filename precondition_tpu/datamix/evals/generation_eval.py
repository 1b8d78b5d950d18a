"""Generation + answer-extraction eval (GSM8K-style).

Parity with the reference's `gsm8k_eval.py` workflow: greedy-sample a
continuation for each prompt, extract the final answer with a regex, and
score exact match.  Generic over datasets: pass prompts, gold answers, an
extraction regex (default: last number in the generation, the GSM8K
convention), and a detokenizer.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence

from precondition_tpu.datamix.evals.eval import Eval
from precondition_tpu.datamix import sampler as sampler_lib

# GSM8K-style: the last integer/decimal in the text is the answer.
LAST_NUMBER_RE = re.compile(r"-?\d+(?:[.,]\d+)?")


def extract_last_number(text: str) -> Optional[str]:
  found = LAST_NUMBER_RE.findall(text)
  return found[-1].replace(",", "") if found else None


class GenerationEval(Eval):
  """Exact-match accuracy of extracted answers from greedy generations."""

  def __init__(
      self,
      make_sampler: Callable[[dict], sampler_lib.Sampler],
      prompts: Sequence[List[int]],
      answers: Sequence[str],
      detokenize: Callable[[List[int]], str],
      extract: Callable[[str], Optional[str]] = extract_last_number,
      max_new_tokens: int = 64,
      batch_size: int = 16,
  ):
    assert len(prompts) == len(answers)
    self.make_sampler = make_sampler
    self.prompts = list(prompts)
    self.answers = [str(a).strip() for a in answers]
    self.detokenize = detokenize
    self.extract = extract
    self.max_new_tokens = max_new_tokens
    self.batch_size = batch_size

  def evaluate(self, params) -> float:
    sampler = self.make_sampler(params)
    correct = 0
    for start in range(0, len(self.prompts), self.batch_size):
      batch = self.prompts[start:start + self.batch_size]
      gold = self.answers[start:start + self.batch_size]
      generations = sampler.sample(batch, self.max_new_tokens)
      for tokens, answer in zip(generations, gold):
        got = self.extract(self.detokenize(tokens))
        if got is not None and got.strip() == answer:
          correct += 1
    return correct / max(len(self.prompts), 1)
