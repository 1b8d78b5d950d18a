"""Functionally-expressed OCO algorithms.

Six online learners sharing one interface (parity with
`/root/reference/precondition/oco/algorithms.py`): OGD, diagonal AdaGrad,
and four sketched-Newton variants that differ only in how the frequent-
directions sketch is scaled, how the escaped-mass regulariser ``alpha``
accumulates, and how eigenvalues are inverted:

  * RFD-SON  (Luo et al., arXiv:1705.05067): sketch scaled by
    ``1/sqrt(t * lr)``, alpha += rho/2, reciprocal inversion.
  * FD-SON   (Luo et al., arXiv:1602.02202): sketch scaled by
    ``1/sqrt(sqrt(t) * lr)``, alpha fixed, reciprocal inversion.
  * Ada-FD   (Wan & Zhang, IJCAI'18): unscaled sketch, alpha fixed, adds
    delta to the *rooted* eigenvalues (special-cased inversion).
  * S-Adagrad (Feinberg et al., arXiv:2302.03764): unscaled sketch,
    alpha += rho, rsqrt inversion.

All state is float64 (the harness runs with ``jax_enable_x64``; OCO regret
experiments are CPU-bound and precision-sensitive).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, Tuple, Union

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


_ADA_FD_SENTINEL = "ada-fd-inversion"


def _method_factors(state: State, hparams: HParams):
  """(sketch scale, alpha accumulation factor, lr, eig inversion)."""
  if hparams.algorithm == Algorithm.RFD_SON:
    return (jax.lax.rsqrt(state["t"] * hparams.lr), 0.5, 1.0, jnp.reciprocal)
  if hparams.algorithm == Algorithm.FD_SON:
    return (jax.lax.rsqrt(jnp.sqrt(state["t"]) * hparams.lr), 0.0, 1.0,
            jnp.reciprocal)
  if hparams.algorithm == Algorithm.ADA_FD:
    return (1.0, 0.0, hparams.lr, _ADA_FD_SENTINEL)
  if hparams.algorithm == Algorithm.S_ADA:
    return (1.0, 1.0, hparams.lr, jax.lax.rsqrt)
  raise ValueError(hparams.algorithm)


def _fd_update(state, loss, grad, hparams: HParams) -> State:
  """Shared FD-sketched Newton update (see module docstring)."""
  del loss
  state["t"] += 1.0
  sketch_scale, alpha_factor, lr, inversion = _method_factors(state, hparams)

  # FD step: overwrite the last sketch row with the (scaled) gradient, SVD,
  # deflate by the smallest singular value.
  sketch = state["P"] * state["e"].reshape(-1, 1)
  sketch = sketch.at[-1].set(grad.ravel() * sketch_scale)
  _, s, vt = jnp.linalg.svd(sketch, full_matrices=False)
  rho = s[-1]
  deflated = (s - rho) * (s + rho)
  state["P"] = vt
  state["e"] = jnp.sqrt(deflated)
  state["alpha"] += alpha_factor * rho**2

  mm = lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
  g = grad.ravel()
  alpha = state["alpha"]
  P = state["P"]  # pylint: disable=invalid-name

  def safe_invert(x, inv):
    return jnp.where(x <= 0.0, 0.0, inv(x))

  if inversion is _ADA_FD_SENTINEL:
    # Ada-FD regularises the rooted eigenvalues: H = P^T diag(e) P + alpha I.
    e = state["e"]
    d = e / (alpha + e)
    update = g - mm(P.T, d * mm(P, g))
    update *= safe_invert(alpha, jnp.reciprocal)
  else:
    shifted = alpha + deflated
    inv_s = safe_invert(shifted, inversion)
    inv_alpha = safe_invert(alpha, inversion)
    outside = g - mm(P.T, mm(P, g))
    update = mm(P.T, inv_s * mm(P, g)) + inv_alpha * outside

  state["w"] -= lr * update.reshape(state["w"].shape)
  return state
