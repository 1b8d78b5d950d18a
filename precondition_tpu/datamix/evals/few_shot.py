"""Few-shot multiple-choice prompt assembly (MMLU-style).

Equivalent of the reference's prompt construction in
`datamix_gemma/evals/mmlu_eval.py:34-80` (format_subject / format_example /
gen_prompt), operating on plain records instead of pandas frames, plus the
crop-to-context loop the reference sketches (drop few-shot exemplars until
the tokenized prompt fits — `mmlu_eval.py:74-78`).

A record is ``{"question": str, "choices": [str, ...], "answer": int}``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

_LETTERS = "ABCDEFGH"


@dataclasses.dataclass(frozen=True)
class MultipleChoiceRecord:
  question: str
  choices: Sequence[str]
  answer: int  # gold index into choices
  subject: str = ""

  @classmethod
  def from_dict(cls, d) -> "MultipleChoiceRecord":
    return cls(question=d["question"], choices=list(d["choices"]),
               answer=int(d["answer"]), subject=d.get("subject", ""))


def format_subject(subject: str) -> str:
  """'abstract_algebra' -> ' abstract algebra' (reference spacing kept)."""
  out = ""
  for part in subject.split("_"):
    out += " " + part
  return out


def format_example(record: MultipleChoiceRecord,
                   include_answer: bool = True) -> str:
  """One 'Q \\n A. .. \\n Answer: X' block."""
  prompt = record.question
  for j, choice in enumerate(record.choices):
    prompt += "\n{}. {}".format(_LETTERS[j], choice)
  prompt += "\nAnswer:"
  if include_answer:
    prompt += " {}\n\n".format(_LETTERS[record.answer])
  return prompt


def gen_prompt(dev_records: Sequence[MultipleChoiceRecord], subject: str,
               k: int = -1) -> str:
  """The k-shot preamble for one subject."""
  prompt = ("The following are multiple choice questions (with answers) "
            "about{}.\n\n".format(format_subject(subject)))
  if k == -1:
    k = len(dev_records)
  for record in dev_records[:k]:
    prompt += format_example(record)
  return prompt


def assemble(
    dev_records: Sequence[MultipleChoiceRecord],
    test_record: MultipleChoiceRecord,
    ntrain: int = 5,
    max_tokens: Optional[int] = None,
    tokenizer: Optional[Callable[[str], List[int]]] = None,
) -> str:
  """Build the few-shot prompt for one test question.

  With ``max_tokens`` and ``tokenizer`` given, exemplars are dropped one
  at a time (k -= 1) until the *tokenized* prompt fits the model context —
  the loop the reference's eval sketches with its BPE `crop`.
  """
  question_part = format_example(test_record, include_answer=False)
  k = min(ntrain, len(dev_records))
  prompt = gen_prompt(dev_records, test_record.subject, k) + question_part
  if max_tokens is not None and tokenizer is not None:
    while k > 0 and len(tokenizer(prompt)) > max_tokens:
      k -= 1
      prompt = gen_prompt(dev_records, test_record.subject, k) + question_part
  return prompt


def build_eval_inputs(
    dev_records: Sequence[MultipleChoiceRecord],
    test_records: Sequence[MultipleChoiceRecord],
    tokenizer: Callable[[str], List[int]],
    ntrain: int = 5,
    max_tokens: Optional[int] = None,
):
  """Tokenized (questions, choices, gold) for `MultipleChoiceEval`.

  Each choice continuation is tokenized as ' X' (the letter the prompt's
  'Answer:' slot expects), so the eval scores exactly the decision the
  few-shot exemplars demonstrate.
  """
  by_subject = {}
  for r in dev_records:
    by_subject.setdefault(r.subject, []).append(r)
  questions, choice_sets, gold = [], [], []
  for r in test_records:
    prompt = assemble(by_subject.get(r.subject, []), r, ntrain=ntrain,
                      max_tokens=max_tokens, tokenizer=tokenizer)
    questions.append(tokenizer(prompt))
    choice_sets.append(
        [tokenizer(" " + _LETTERS[j]) for j in range(len(r.choices))])
    gold.append(r.answer)
  return questions, choice_sets, gold
