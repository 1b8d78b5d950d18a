"""Mixture-weighted training-batch generators.

Map bandit mixture weights onto per-dataset sampling.  Three families
(semantics parity with
`/root/reference/precondition/datamix_gemma/training_batch_generators/`):

* **Vanilla** — each candidate mixture gets its own multinomially-sampled
  batches (most faithful, most compute: one training run per candidate).
* **Importance weighting** — all candidates train on batches drawn from the
  *average* mixture; per-example loss ``factors`` reweight by the ratio
  candidate/average, so the candidates' runs share data.
* **Dartboard deterministic** — deterministic proportional allocation of
  the batch across datasets (largest-remainder rounding) instead of
  multinomial sampling; lowest variance.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from precondition_tpu.datamix.dataset_builder import DatasetBuilder, Example


class TrainingBatchGenerator:
  """Base contract: prepare_for_training(candidates) then get_next_batch."""

  def __init__(self, train_ds_builders: Sequence[DatasetBuilder],
               batch_size: int, num_weights: int = 2,
               num_iterations: int = 100, seed: int = 0):
    self.train_ds_builders = list(train_ds_builders)
    self.batch_size = batch_size
    self.num_weights = num_weights
    self.num_iterations = num_iterations
    self.rng = np.random.default_rng(seed)
    self._iters = [self._fresh_iter(i)
                   for i in range(len(self.train_ds_builders))]

  def _fresh_iter(self, i):
    return iter(self.train_ds_builders[i].get_train_dataset(
        batch_size=self.batch_size, num_epochs=1))

  def _next_example(self, i) -> Example:
    try:
      return next(self._iters[i])
    except StopIteration:
      self._iters[i] = self._fresh_iter(i)
      return next(self._iters[i])

  def prepare_for_training(self, weights_list, new_unnormalized_weights):
    """Called once per bandit iteration; returns the gradient discount."""
    raise NotImplementedError

  def get_next_batch(self, index: int):
    """Returns (factors [b], input_tokens [b, t], target_mask [b, t])."""
    raise NotImplementedError

  @staticmethod
  def _stack(examples: List[Example], factors):
    tokens = np.stack([e.input_tokens for e in examples])
    masks = np.stack([e.target_mask for e in examples])
    return np.asarray(factors, np.float32), tokens, masks


class VanillaTrainingBatchGenerator(TrainingBatchGenerator):
  """Sample each candidate's batches from its own mixture."""

  def prepare_for_training(self, weights_list, new_unnormalized_weights):
    self.weights_list = [np.asarray(w, np.float64) / np.sum(w)
                         for w in weights_list]
    return 1

  def get_next_batch(self, index: int):
    weights = self.weights_list[index]
    choices = self.rng.choice(
        len(self.train_ds_builders), size=self.batch_size, p=weights)
    examples = [self._next_example(c) for c in choices]
    return self._stack(examples, np.ones(self.batch_size))


class ImportanceWeightingTrainingBatchGenerator(TrainingBatchGenerator):
  """Share batches from the average mixture; reweight per candidate."""

  def prepare_for_training(self, weights_list, new_unnormalized_weights):
    self.weights_list = [np.asarray(w, np.float64) / np.sum(w)
                         for w in weights_list]
    self.avg_weights = np.mean(self.weights_list, axis=0)
    # One shared choice sequence for all candidates (that's the point).
    self.sample_choices = self.rng.choice(
        len(self.avg_weights), size=self.batch_size, p=self.avg_weights)
    self._shared = [self._next_example(c) for c in self.sample_choices]
    return 1

  def get_next_batch(self, index: int):
    w = self.weights_list[index]
    factors = np.asarray(
        [w[c] / self.avg_weights[c] for c in self.sample_choices])
    factors *= len(factors) / np.sum(factors)
    return self._stack(self._shared, factors)


class DartboardDeterministicTrainingBatchGenerator(TrainingBatchGenerator):
  """Deterministic proportional batch allocation (largest remainder)."""

  def prepare_for_training(self, weights_list, new_unnormalized_weights):
    self.weights_list = [np.asarray(w, np.float64) / np.sum(w)
                         for w in weights_list]
    return 1

  def _allocate(self, weights) -> np.ndarray:
    from precondition_tpu.datamix import native

    if native.available():
      return native.allocate_proportional(weights, self.batch_size)
    raw = weights * self.batch_size
    counts = np.floor(raw).astype(int)
    remainder = self.batch_size - counts.sum()
    order = np.argsort(-(raw - counts))
    counts[order[:remainder]] += 1
    return counts

  def get_next_batch(self, index: int):
    counts = self._allocate(self.weights_list[index])
    examples = []
    for ds_index, count in enumerate(counts):
      examples.extend(self._next_example(ds_index) for _ in range(count))
    return self._stack(examples, np.ones(self.batch_size))
