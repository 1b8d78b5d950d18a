"""Functionally-expressed OCO algorithms.

Six online learners sharing one interface (behavioural parity with
`/root/reference/precondition/oco/algorithms.py`): OGD, diagonal AdaGrad,
and four sketched-Newton variants.  The sketched family is expressed here
as one frequent-directions engine (`_insert_and_deflate` + two
preconditioner-application forms) specialised by a declarative
`_SketchRecipe` per algorithm:

  * RFD-SON  (Luo et al., arXiv:1705.05067): gradient enters the sketch
    scaled by ``1/sqrt(t * lr)``, half the escaped mass accumulates into
    the diagonal ``alpha``, spectral inversion is the reciprocal, and the
    step applies no extra learning rate.
  * FD-SON   (Luo et al., arXiv:1602.02202): sketch scale
    ``1/sqrt(sqrt(t) * lr)`` (eta_t itself decays), ``alpha`` is frozen at
    ``delta``, reciprocal inversion, no extra learning rate.
  * Ada-FD   (Wan & Zhang, IJCAI'18): unscaled sketch, frozen ``alpha``,
    and — uniquely — the regulariser is added to the *rooted* eigenvalues,
    which calls for the dedicated rooted application form.
  * S-Adagrad (Feinberg et al., arXiv:2302.03764): unscaled sketch, full
    escaped mass into ``alpha``, inverse-square-root inversion, learning
    rate applied to the step.

All state is float64 (the harness runs with ``jax_enable_x64``; OCO regret
experiments are CPU-bound and precision-sensitive).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class Algorithm(enum.Enum):
  OGD = enum.auto()
  ADA = enum.auto()
  RFD_SON = enum.auto()
  FD_SON = enum.auto()
  ADA_FD = enum.auto()
  S_ADA = enum.auto()


RuntimeScalar = Union[float, jax.Array]


@dataclasses.dataclass
class HParams:
  """Union of all hyperparameters across the algorithms."""

  delta: RuntimeScalar  # initial diagonal regularisation
  lr: RuntimeScalar
  sketch_size: int      # 0 for non-sketched algorithms
  algorithm: Algorithm


State = Dict[str, jax.Array]
NpState = Dict[str, np.ndarray]
InitFn = Callable[[], State]
UpdateFn = Callable[[State, jax.Array, jax.Array], State]


def as_np(state: State) -> NpState:
  return {k: np.asarray(v, dtype=v.dtype) for k, v in state.items()}


def generate_init_update(w_shape, hparams: HParams) -> Tuple[InitFn, UpdateFn]:
  """Bind hyperparameters to the algorithm's init/update pair."""
  if hparams.algorithm == Algorithm.OGD:
    assert hparams.sketch_size == 0, hparams.sketch_size
    init, update = _ogd_init, _ogd_update
  elif hparams.algorithm == Algorithm.ADA:
    assert hparams.sketch_size == 0, hparams.sketch_size
    init, update = _ada_init, _ada_update
  else:
    assert hparams.sketch_size > 1, hparams.sketch_size
    init, update = _fd_init, _fd_update
  return (lambda: init(w_shape, hparams),
          lambda state, loss, grad: update(state, loss, grad, hparams))


# ------------------------------------------------------------------ OGD --
def _ogd_init(w_shape, hparams: HParams) -> State:
  del hparams
  return {
      "w": jnp.zeros(w_shape, jnp.float64),
      "t": jnp.array(0.0, jnp.float64),
  }


def _ogd_update(state, loss, grad, hparams: HParams) -> State:
  del loss
  state["t"] += 1.0
  state["w"] -= hparams.lr * grad * jax.lax.rsqrt(state["t"] + hparams.delta)
  return state


# ------------------------------------------------------- diagonal AdaGrad --
def _ada_init(w_shape, hparams: HParams) -> State:
  return {
      "w": jnp.zeros(w_shape, jnp.float64),
      "diag_h": jnp.full(w_shape, hparams.delta, jnp.float64),
  }


def _ada_update(state, loss, grad, hparams: HParams) -> State:
  del loss
  state["diag_h"] = state["diag_h"] + grad**2
  rsqrt = jax.lax.rsqrt(jnp.where(state["diag_h"] == 0, 1, state["diag_h"]))
  state["w"] -= rsqrt * grad * hparams.lr
  return state


# --------------------------------------------------- FD-sketched methods --
@dataclasses.dataclass(frozen=True)
class _SketchRecipe:
  """What distinguishes one sketched-Newton method from another.

  ``invert=None`` selects the rooted application form (Ada-FD's
  regularise-after-sqrt convention); every other method regularises the
  squared sketch spectrum and inverts it with ``invert``.
  """

  # Multiplier on the gradient row entering the sketch, from (t, lr).
  sketch_gain: Callable[[jax.Array, RuntimeScalar], RuntimeScalar]
  # Fraction of the escaped mass rho^2 folded into the diagonal alpha.
  mass_gain: float
  # Whether hparams.lr additionally scales the parameter step.
  lr_scales_step: bool
  invert: Optional[Callable[[jax.Array], jax.Array]]


_RECIPES = {
    Algorithm.RFD_SON: _SketchRecipe(
        sketch_gain=lambda t, lr: jax.lax.rsqrt(t * lr),
        mass_gain=0.5, lr_scales_step=False, invert=jnp.reciprocal),
    Algorithm.FD_SON: _SketchRecipe(
        sketch_gain=lambda t, lr: jax.lax.rsqrt(jnp.sqrt(t) * lr),
        mass_gain=0.0, lr_scales_step=False, invert=jnp.reciprocal),
    Algorithm.ADA_FD: _SketchRecipe(
        sketch_gain=lambda t, lr: 1.0,
        mass_gain=0.0, lr_scales_step=True, invert=None),
    Algorithm.S_ADA: _SketchRecipe(
        sketch_gain=lambda t, lr: 1.0,
        mass_gain=1.0, lr_scales_step=True, invert=jax.lax.rsqrt),
}


def _fd_init(w_shape, hparams: HParams) -> State:
  size = int(np.prod(w_shape))
  k = hparams.sketch_size
  assert size >= k >= 2, (size, k)
  return {
      "w": jnp.zeros(w_shape, jnp.float64),
      "t": jnp.array(0.0, jnp.float64),
      "alpha": jnp.array(hparams.delta, jnp.float64),
      "P": jnp.zeros((k, size), jnp.float64),  # sketch eigenvectors
      "e": jnp.zeros((k,), jnp.float64),       # sketch (root) eigenvalues
  }


def _insert_and_deflate(eigvecs, root_eigs, row):
  """One frequent-directions round on the factored sketch.

  Rebuilds the sketch from its (eigvecs, root-eigs) factorisation,
  overwrites the last (smallest) row with the incoming gradient row, and
  deflates the refreshed spectrum by its smallest singular value so the
  sketch keeps one free slot.

  Returns the new eigvecs, the deflated *squared* spectrum, its root, and
  the escaped mass ``rho**2``.
  """
  refreshed = (eigvecs * root_eigs[:, None]).at[-1].set(row)
  _, sv, eigvecs = jnp.linalg.svd(refreshed, full_matrices=False)
  smallest = sv[-1]
  squared = (sv - smallest) * (sv + smallest)
  return eigvecs, squared, jnp.sqrt(squared), smallest**2


def _dot(a, b):
  return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def _guarded(invert, x):
  """``invert(x)`` with non-positive inputs mapped to exactly zero."""
  return jnp.where(x <= 0.0, 0.0, invert(x))


def _apply_spectral(g, eigvecs, squared, alpha, invert):
  """Precondition ``g`` with ``(P^T diag(e^2) P + alpha I)^{-q}``.

  ``invert`` carries the exponent choice (reciprocal for the SON family,
  rsqrt for S-Adagrad), applied to the alpha-shifted squared spectrum
  inside the sketch and to alpha alone on its orthogonal complement.
  """
  in_sketch = _dot(eigvecs, g)
  spectrum = _guarded(invert, alpha + squared)
  complement = g - _dot(eigvecs.T, in_sketch)
  return (_dot(eigvecs.T, spectrum * in_sketch)
          + _guarded(invert, alpha) * complement)


def _apply_rooted(g, eigvecs, root_eigs, alpha):
  """Ada-FD's form: regularise the *rooted* spectrum, ``H = B + alpha I``
  with ``B = P^T diag(e) P``, applied via the Woodbury-style rewrite
  ``H^{-1} g = (g - P^T [e/(alpha+e)] P g) / alpha``."""
  in_sketch = _dot(eigvecs, g)
  shrink = root_eigs / (alpha + root_eigs)
  update = g - _dot(eigvecs.T, shrink * in_sketch)
  return update * _guarded(jnp.reciprocal, alpha)


def _fd_update(state, loss, grad, hparams: HParams) -> State:
  """Shared FD-sketched Newton update, specialised by `_RECIPES`."""
  del loss
  recipe = _RECIPES[hparams.algorithm]
  state["t"] += 1.0

  row = grad.ravel() * recipe.sketch_gain(state["t"], hparams.lr)
  eigvecs, squared, root_eigs, escaped = _insert_and_deflate(
      state["P"], state["e"], row)
  state["P"] = eigvecs
  state["e"] = root_eigs
  state["alpha"] += recipe.mass_gain * escaped

  g = grad.ravel()
  if recipe.invert is None:
    step = _apply_rooted(g, eigvecs, root_eigs, state["alpha"])
  else:
    step = _apply_spectral(g, eigvecs, squared, state["alpha"], recipe.invert)
  if recipe.lr_scales_step:
    step = hparams.lr * step
  state["w"] -= step.reshape(state["w"].shape)
  return state
