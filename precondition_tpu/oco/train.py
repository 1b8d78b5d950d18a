"""Run an OCO algorithm over a dataset, snapshotting state at checkpoints.

One jit'd `lax.scan` over observation chunks with a `lax.fori_loop` per row
(parity with `/root/reference/precondition/oco/train.py`); the returned
history stacks the state at each of ``num_obs`` evenly-spaced row counts.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from precondition_tpu.oco import algorithms
from precondition_tpu.oco import datasets

LossAndGrad = Callable[[jax.Array, jax.Array, jax.Array], tuple]


@functools.partial(
    jax.jit, static_argnames=["loss_and_grad", "update_fn", "extra_loss"])
def _compiled_run(x, y, state, obs_ixs, loss_and_grad, update_fn, extra_loss):
  """Scan over observation chunks, fori_loop per example."""

  def process_row(_, state):
    ix = state["n"]
    row = x[ix]
    f, g = loss_and_grad(state["w"], row, y[ix])
    if extra_loss is not None:
      state["extra_loss"] += extra_loss(state["w"], row, y[ix])
    state = update_fn(state, f, g)
    state["loss"] += f
    state["n"] += 1
    return state

  chunks = jnp.diff(obs_ixs, prepend=0)

  def scan_chunk(state, chunk):
    state = jax.lax.fori_loop(0, chunk, process_row, state)
    return state, state

  _, history = jax.lax.scan(scan_chunk, state, chunks)
  return history


def run_dataset(
    dataset_name: str,
    num_obs: int,
    hparams: algorithms.HParams,
    extra_loss: Optional[datasets.Loss] = None,
    dataset_cache: str = "/tmp/cache",
) -> algorithms.State:
  """Run and return the stacked state history at ``num_obs`` checkpoints."""
  assert num_obs >= 2
  dataset = datasets.load_dataset(dataset_name, dataset_cache)
  init_fn, update_fn = algorithms.generate_init_update(
      dataset.w_shape, hparams)

  obs_ixs = np.round(
      np.linspace(0, dataset.x.shape[0], num=num_obs, endpoint=True)
  ).astype(int)

  state = init_fn()
  assert "loss" not in state and "n" not in state and "w" in state, list(state)
  state["loss"] = jnp.array(0.0, jnp.float64)
  state["n"] = 0
  if extra_loss is not None:
    state["extra_loss"] = jnp.array(0.0, jnp.float64)

  return _compiled_run(
      dataset.x, dataset.y, state, obs_ixs,
      jax.value_and_grad(dataset.loss), update_fn, extra_loss)
