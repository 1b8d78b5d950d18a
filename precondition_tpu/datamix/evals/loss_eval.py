"""Validation-loss eval: score = -mean masked loss.

The reference's GSM8K eval has a validation-loss mode
(`gsm8k_eval.py`, `use_validation_loss`); this is that mode as its own
evaluator, usable with any dataset builder.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from precondition_tpu.datamix.evals.eval import Eval


class LossEval(Eval):
  """Negative masked next-token loss over a fixed batch set."""

  def __init__(self, training_loop, builders: Sequence, batch_size: int = 8,
               max_batches: int = 4):
    self.training_loop = training_loop
    self.batches = []
    for builder in builders:
      it = builder.get_train_dataset(batch_size=batch_size, num_epochs=1)
      examples = []
      for example in it:
        examples.append(example)
        if len(examples) == batch_size:
          tokens = np.stack([e.input_tokens for e in examples])
          masks = np.stack([e.target_mask for e in examples])
          self.batches.append(
              (np.ones(batch_size, np.float32), tokens, masks))
          examples = []
          if len(self.batches) >= max_batches * len(builders):
            break

  def evaluate(self, params) -> float:
    return -self.training_loop.validation_loss(params, self.batches)
