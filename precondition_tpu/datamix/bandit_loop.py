"""Zero-order bandit over data-mixture weights.

Semantics parity with
`/root/reference/precondition/datamix_gemma/bandit_loop.py`: two-point
gradient estimation of eval-score with respect to mixture weights
(perturb the mixture by +-delta*u, finetune from the same initial params
under each candidate, evaluate, difference the scores), followed by an
exponentiated-gradient mirror-descent step on the simplex, with optional
momentum / AdaGrad / Adam / averaged-AdaGrad variants, step-size decay, and
gradient clipping.
"""

from __future__ import annotations

import copy
import functools
from typing import Callable, Optional, Sequence

from absl import logging
import numpy as np

_STEP_SIZE = 0.1


def compute_gradient(cands, scores) -> np.ndarray:
  """Two-point estimate: d * (f(x+du) - f(x-du)) * u / (2d|u|) form."""
  diff = cands[0] - cands[1]
  norm2 = np.linalg.norm(diff) ** 2
  return diff.shape[0] * diff * (scores[0] - scores[1]) / norm2


def generate_candidates_random_sign(weights, rng, delta=0.1):
  """Perturb by a random +-1 sign vector (balanced halves)."""
  u = np.zeros(weights.shape)
  half = rng.choice(weights.shape[0], size=weights.shape[0] // 2,
                    replace=False)
  other = [i for i in range(weights.shape[0]) if i not in half]
  u[half] = 1.0
  u[other] = -1.0
  if weights.shape[0] % 2 != 0:
    u[other[0]] = 0.0
  u = u / np.sqrt(u.shape[0])

  # Shrink into the capped simplex so +-delta stays feasible.
  weights = weights * (1 - delta * weights.shape[0]) + delta
  a = weights + delta * u
  b = weights - delta * u
  return [a / np.linalg.norm(a, 1), b / np.linalg.norm(b, 1)]


def generate_gaussian_candidates(weights, rng, delta):
  """Perturb by a random unit Gaussian direction."""
  w = weights * (1 - delta * weights.shape[0]) + delta
  u = rng.normal(size=weights.shape)
  u = u / np.linalg.norm(u)
  a = w + delta * u
  b = w - delta * u
  return [a / np.linalg.norm(a, 1), b / np.linalg.norm(b, 1)]


def exponentiated_gradient(x, grad, step_size=_STEP_SIZE) -> np.ndarray:
  """Unnormalised mirror-descent step ``x * exp(step * (grad - max))``."""
  g = copy.deepcopy(grad)
  g -= np.max(g)
  return x * np.exp(step_size * g)


def run_bandit_loop(
    eval_fn: Callable,
    train_obj,
    training_batch_generator_obj,
    init_weights: Optional[np.ndarray] = None,
    num_iterations: int = 100,
    step_size: float = 0.001,
    delta: float = 0.001,
    warm_start: bool = False,
    init_params=None,
    static_weights: bool = False,
    step_size_decay: bool = False,
    step_size_decay_rate: float = 0.95,
    momentum: bool = False,
    momentum_beta: float = 0.1,
    use_adagrad: bool = False,
    adagrad_beta: float = 1.0,
    use_adagrad_avg: bool = False,
    use_adam: bool = False,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.99,
    gradient_clipping: bool = False,
    gradient_clipping_norm: float = 30000,
    candidate_generator_fn=generate_gaussian_candidates,
    num_grad_evals: int = 2,
    seed: int = 0,
    history: Optional[list] = None,
) -> np.ndarray:
  """Run the bandit; returns the final mixture weights.

  Args:
    eval_fn: ``params -> score`` (higher is better).
    train_obj: a `TrainingLoop`-like object with
      ``train_loop(params=..., get_next_batch_fn=...)``.
    training_batch_generator_obj: a `TrainingBatchGenerator`.
    history: optional list; per-iteration (weights, scores) are appended.

  Other args mirror the reference's knobs 1:1.
  """
  n = len(training_batch_generator_obj.train_ds_builders)
  assert not (use_adagrad and use_adam)
  adam_matrix = np.ones(n) if use_adam else None
  adam_first_moment = np.zeros(n) if use_adam else None
  adagrad_matrix = np.ones(n) if (use_adagrad or use_adagrad_avg) else None

  if init_weights is None:
    init_weights = np.ones(n) / n
  weights = np.asarray(init_weights, np.float64)
  momentum_vec = np.zeros(n)
  rng = np.random.default_rng(seed=seed)
  next_params = init_params
  unnormalized_weights = copy.deepcopy(weights)

  for it in range(num_iterations):
    if static_weights:
      weights = init_weights
    logging.info("[WEIGHTS]: %s", weights)

    cands = []
    for _ in range(num_grad_evals):
      pair = candidate_generator_fn(weights, rng, delta=delta)
      cands.extend(pair)

    discount = training_batch_generator_obj.prepare_for_training(
        cands, unnormalized_weights)

    scores = []
    trained_params = None
    for cand_it in range(len(cands)):
      cur = copy.deepcopy(next_params if warm_start else init_params)
      trained_params = train_obj.train_loop(
          params={"params": cur},
          get_next_batch_fn=functools.partial(
              training_batch_generator_obj.get_next_batch, index=cand_it))
      scores.append(eval_fn(trained_params["params"]))
    if warm_start and trained_params is not None:
      next_params = trained_params["params"]

    logging.info("iteration %d [SCORES]: %s", it, scores)
    if history is not None:
      history.append((weights.copy(), list(scores)))

    per = num_grad_evals // 2
    grad1 = np.zeros(weights.shape)
    grad2 = np.zeros(weights.shape)
    for i in range(per):
      grad1 += compute_gradient(
          cands[2 * i:2 * i + 2], scores[2 * i:2 * i + 2]) * discount
      j = i + per
      grad2 += compute_gradient(
          cands[2 * j:2 * j + 2], scores[2 * j:2 * j + 2]) * discount
    grad1 /= per
    grad2 /= per
    for g in (grad1, grad2):
      if gradient_clipping and np.linalg.norm(g) > gradient_clipping_norm:
        g *= gradient_clipping_norm / np.linalg.norm(g)
    grad = (grad1 + grad2) / 2
    logging.info("[GRAD]: %s", grad)

    if momentum:
      momentum_vec = momentum_beta * momentum_vec + grad
      unnormalized_weights = exponentiated_gradient(
          weights, momentum_vec, step_size)
    elif use_adagrad:
      # Adversarially-robust variant: product of the two independent
      # estimates rather than a square (debiases the variance term).
      adagrad_matrix += grad1 * grad2 * adagrad_beta
      denom = np.sqrt(np.maximum(adagrad_matrix, 1e-3))
      unnormalized_weights = exponentiated_gradient(
          weights, grad / denom, step_size)
    elif use_adam:
      adam_first_moment = (adam_beta1 * adam_first_moment
                           + (1 - adam_beta1) * grad)
      m_hat = adam_first_moment / (1 - adam_beta1 ** (it + 1))
      adam_matrix = (1 - adam_beta2) * grad1 * grad2 + adam_beta2 * adam_matrix
      v_hat = adam_matrix / (1 - adam_beta2 ** (it + 1))
      denom = np.sqrt(np.maximum(v_hat, 1e-8))
      unnormalized_weights = exponentiated_gradient(
          weights, m_hat / denom, step_size)
    elif use_adagrad_avg:
      adagrad_matrix += np.square(grad)
      denom = np.mean(np.sqrt(adagrad_matrix + 1e-8))
      unnormalized_weights = exponentiated_gradient(
          weights, grad / denom, step_size)
    else:
      unnormalized_weights = exponentiated_gradient(weights, grad, step_size)
    weights = unnormalized_weights / np.linalg.norm(unnormalized_weights, 1)

    if step_size_decay:
      step_size *= step_size_decay_rate

  return weights
