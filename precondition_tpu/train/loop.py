"""SPMD training loop: jit + Mesh, no pmap.

The reference's loop is pmap + host-side batch slicing
(`/root/reference/precondition/datamix_gemma/training_loop.py:213-327`); the
TPU-native version is a single jit'd step over a Mesh with NamedSharding on
params/batch — XLA inserts the gradient all-reduce over ICI, multihost falls
out of GSPMD for free, and the optimizer's stacked root solves shard over
the same mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from precondition_tpu.parallel import mesh as mesh_lib


def make_train_step(loss_fn: Callable, tx) -> Callable:
  """Pure (params, opt_state, batch) -> (loss, params, opt_state)."""

  def step(params, opt_state, batch):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    return loss, params, opt_state

  return step


def make_sharded_train_step(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    param_rules=(),
    batch_spec: P = P("data"),
) -> Callable:
  """jit the train step with sharding constraints over ``mesh``.

  Params follow ``param_rules`` (regex -> PartitionSpec, see
  `parallel.mesh.shard_params`); the batch shards its leading axis on
  ``data``.  Optimizer state inherits whatever layout the initial values
  carry (jit propagates shardings through the state pytree).
  """
  step = make_train_step(loss_fn, tx)

  @functools.partial(jax.jit, donate_argnums=(0, 1))
  def sharded_step(params, opt_state, batch):
    batch = jax.lax.with_sharding_constraint(
        batch, jax.tree.map(lambda _: NamedSharding(mesh, batch_spec), batch))
    return step(params, opt_state, batch)

  return sharded_step


def train(
    loss_fn: Callable,
    tx,
    params,
    batches,
    mesh: Optional[Mesh] = None,
    param_rules=(),
    log_every: int = 0,
    log_fn=print,
) -> Tuple[Any, Any, list]:
  """Simple driver: init optimizer state, run all batches, return history."""
  opt_state = tx.init(params)
  if mesh is not None:
    params = mesh_lib.shard_params(params, mesh, param_rules)
    step = make_sharded_train_step(loss_fn, tx, mesh, param_rules)
  else:
    step = jax.jit(make_train_step(loss_fn, tx))
  losses = []
  for i, batch in enumerate(batches):
    loss, params, opt_state = step(params, opt_state, batch)
    losses.append(loss)
    if log_every and (i % log_every == 0):
      log_fn(f"step {i}: loss {float(loss):.4f}")
  return params, opt_state, losses
