"""Baselines and analysis utilities for the bandit loop.

Equivalents of the reference's auxiliary research scripts
(`random_baseline.py`, `snr_calculation.py`, `confusion_matrix_calc.py`,
`deterministic_strategy_bandit_loop.py` under
`/root/reference/precondition/datamix_gemma/`), expressed over the same
Eval/TrainingLoop/BatchGenerator contracts:

* `random_baseline` — evaluate uniformly-random simplex mixtures; the
  bar any bandit strategy must beat.
* `gradient_snr` — signal-to-noise of the two-point gradient estimator at
  fixed weights: repeat the probe, report mean / std / per-coordinate SNR.
  This is what decides usable (step_size, delta) ranges.
* `mixture_confusion_matrix` — train on each dataset alone, evaluate on
  every eval: the cross-task transfer matrix.
* `run_deterministic_strategy_bandit_loop` — the bandit with the
  deterministic dartboard generator (lowest-variance probes).
"""

from __future__ import annotations

import copy
import functools
from typing import Callable, List, Optional, Sequence

from absl import logging
import numpy as np

from precondition_tpu.datamix import bandit_loop
from precondition_tpu.datamix import batch_generators


def random_simplex(n: int, rng: np.random.Generator) -> np.ndarray:
  """Uniform sample from the n-simplex (normalised exponentials)."""
  k = rng.exponential(scale=1.0, size=n)
  return k / np.sum(k)


def random_baseline(
    eval_fn: Callable,
    train_obj,
    training_batch_generator_obj,
    init_params,
    num_iterations: int = 100,
    seed: int = 0,
    history: Optional[list] = None,
):
  """Score uniformly-random mixtures; returns (best_weights, best_score)."""
  n = len(training_batch_generator_obj.train_ds_builders)
  rng = np.random.default_rng(seed)
  best, best_score = None, -np.inf
  for it in range(num_iterations):
    weights = random_simplex(n, rng)
    training_batch_generator_obj.prepare_for_training([weights], weights)
    params = copy.deepcopy(init_params)
    trained = train_obj.train_loop(
        params={"params": params},
        get_next_batch_fn=functools.partial(
            training_batch_generator_obj.get_next_batch, index=0))
    score = eval_fn(trained["params"])
    logging.info("random baseline it %d score %s weights %s", it, score,
                 weights)
    if history is not None:
      history.append((weights, score))
    if score > best_score:
      best, best_score = weights, score
  return best, best_score


def gradient_snr(
    eval_fn: Callable,
    train_obj,
    training_batch_generator_obj,
    init_params,
    weights: np.ndarray,
    delta: float = 0.05,
    num_trials: int = 8,
    seed: int = 0,
    candidate_generator_fn=bandit_loop.generate_gaussian_candidates,
):
  """Estimate the SNR of the two-point gradient at fixed ``weights``.

  Returns a dict with the mean gradient, its std across trials, and the
  per-coordinate |mean|/std — the quantity that bounds usable step sizes.
  """
  rng = np.random.default_rng(seed)
  grads = []
  for _ in range(num_trials):
    cands = candidate_generator_fn(weights.copy(), rng, delta=delta)
    training_batch_generator_obj.prepare_for_training(cands, weights)
    scores = []
    for i in range(2):
      params = copy.deepcopy(init_params)
      trained = train_obj.train_loop(
          params={"params": params},
          get_next_batch_fn=functools.partial(
              training_batch_generator_obj.get_next_batch, index=i))
      scores.append(eval_fn(trained["params"]))
    grads.append(bandit_loop.compute_gradient(cands, scores))
  grads = np.stack(grads)
  mean = grads.mean(axis=0)
  std = grads.std(axis=0)
  return {
      "mean": mean,
      "std": std,
      "snr": np.abs(mean) / np.maximum(std, 1e-12),
  }


def mixture_confusion_matrix(
    eval_fns: Sequence[Callable],
    train_obj,
    builders,
    init_params,
    batch_size: int = 8,
) -> np.ndarray:
  """``M[i, j]`` = score of eval ``j`` after training only on dataset ``i``.

  The reference computes this for its Gemma evals
  (`confusion_matrix_calc.py`); it reveals which datasets transfer to
  which skills and seeds good initial mixtures.
  """
  n = len(builders)
  out = np.zeros((n, len(eval_fns)))
  for i in range(n):
    gen = batch_generators.VanillaTrainingBatchGenerator(
        [builders[i]], batch_size=batch_size)
    one = np.ones(1)
    gen.prepare_for_training([one], one)
    params = copy.deepcopy(init_params)
    trained = train_obj.train_loop(
        params={"params": params},
        get_next_batch_fn=functools.partial(gen.get_next_batch, index=0))
    for j, eval_fn in enumerate(eval_fns):
      out[i, j] = eval_fn(trained["params"])
  return out


def run_deterministic_strategy_bandit_loop(
    eval_fn: Callable,
    train_obj,
    training_batch_generator_obj,
    **kwargs,
):
  """Bandit loop over the deterministic dartboard generator.

  The dartboard's proportional allocation removes multinomial sampling
  noise from the probes, so smaller deltas stay informative (parity:
  `deterministic_strategy_bandit_loop.py`).
  """
  assert isinstance(
      training_batch_generator_obj,
      batch_generators.DartboardDeterministicTrainingBatchGenerator), (
          "use the dartboard generator with the deterministic strategy")
  return bandit_loop.run_bandit_loop(
      eval_fn=eval_fn,
      train_obj=train_obj,
      training_batch_generator_obj=training_batch_generator_obj,
      **kwargs)
