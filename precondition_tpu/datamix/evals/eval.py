"""Eval base class (parity:
`/root/reference/precondition/datamix_gemma/evals/eval.py`)."""

from __future__ import annotations


class Eval:
  """Scores a set of model parameters; higher is better."""

  def evaluate(self, params) -> float:
    raise NotImplementedError
