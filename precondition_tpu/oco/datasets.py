"""OCO benchmark datasets: libsvm loaders + a synthetic fallback.

Parity with `/root/reference/precondition/oco/datasets.py` (a9a / cifar10 /
gisette_scale libsvm files with joblib caching), plus a deterministic
synthetic logistic-regression dataset so the harness and its tests run in
environments without the libsvm downloads.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

SUPPORTED_DATASETS = [
    "a9a", "a9a.t",
    "cifar10", "cifar10.t",
    "gisette_scale", "gisette_scale.t",
    "synthetic", "synthetic.t",
]

Loss = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]

# Directory containing libsvm-format files; settable programmatically or via
# the PRECOND_OCO_DATA_DIR environment variable (the reference uses an absl
# flag; we avoid global flag state in library code).
DATA_DIR: Optional[str] = os.environ.get("PRECOND_OCO_DATA_DIR")


def logistic_loss(w: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
  """Binary logistic loss with y in {0, 1}."""
  pred = jnp.dot(w, x, precision=jax.lax.Precision.HIGHEST)
  lse = lambda v: jax.nn.logsumexp(jnp.array(v))
  return y * lse([0, -pred]) + (1 - y) * lse([0, pred])


def incorrect(w: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
  """Binary 0-1 loss."""
  pred = jnp.dot(w, x, precision=jax.lax.Precision.HIGHEST)
  return (pred > 0) != (y > 0)


@dataclasses.dataclass
class SimpleDataset:
  """Dense supervised dataset for linear learners."""

  x: np.ndarray
  y: np.ndarray
  loss: Loss
  w_shape: tuple


def _synthetic(test: bool) -> SimpleDataset:
  """Deterministic separable-ish logistic regression problem."""
  rng = np.random.RandomState(1 if test else 0)
  n, d = 2000, 40
  w_true = rng.randn(d)
  x = rng.randn(n, d)
  logits = x @ w_true + rng.randn(n) * 0.5
  y = logits > 0
  x = np.concatenate([x, np.ones((n, 1))], axis=1)
  return SimpleDataset(x, y, logistic_loss, (d + 1,))


def _load_uncached(name: str) -> SimpleDataset:
  assert name in SUPPORTED_DATASETS, name
  if name.startswith("synthetic"):
    return _synthetic(name.endswith(".t"))
  if not DATA_DIR:
    raise ValueError(
        "set precondition_tpu.oco.datasets.DATA_DIR (or "
        "PRECOND_OCO_DATA_DIR) to the directory holding libsvm files from "
        "https://www.csie.ntu.edu.tw/~cjlin/libsvmtools/datasets/")
  import sklearn.datasets

  with open(os.path.join(DATA_DIR, name), "rb") as f:
    x, y = sklearn.datasets.load_svmlight_file(f)
  x = np.asarray(x.todense())
  x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
  y = y > 0
  return SimpleDataset(x, y, logistic_loss, (x.shape[1],))


def load_dataset(name: str, cache: str = "/tmp/cache") -> SimpleDataset:
  """Load (with joblib disk caching when available)."""
  try:
    import joblib

    memory = joblib.Memory(cache, verbose=0)
    return memory.cache(_load_uncached)(name)
  except ImportError:
    return _load_uncached(name)
