"""Sharded-gradient-transformation interface (praxis-compatible shim).

Mirrors `/root/reference/precondition/tearfree/praxis_shim.py:25-90` so that
trainer stacks expecting praxis' `ShardedGradientTransformation` contract
(init / update / init_partition_spec) can drive the tearfree optimizers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class ShardedGradientTransformation:
  """An optax transform that also exposes state partition specs."""

  init: optax.TransformInitFn
  update: optax.TransformUpdateFn
  init_partition_spec: Any


NestedHParams = Any


class WeightHParams(NamedTuple):
  shape: list
  init: Any
  dtype: jnp.dtype
  collections: Any
  tensor_split_dims_mapping: list


def sharded_chain(
    *transforms: Union[optax.GradientTransformation,
                       ShardedGradientTransformation],
) -> ShardedGradientTransformation:
  """Like `optax.chain`, but propagating partition specs."""

  def init_fn(params):
    return tuple(tx.init(params) for tx in transforms)

  def update_fn(updates, state, params=None):
    if len(transforms) != len(state):
      raise ValueError(
          f"sharded_chain: {len(transforms)} transforms but "
          f"{len(state)} states")
    new_states = []
    for s, tx in zip(state, transforms):
      updates, new_s = tx.update(updates, s, params)
      new_s = jax.tree.map(
          lambda x: optax.MaskedNode() if x is None else x,
          new_s, is_leaf=lambda x: x is None)
      new_states.append(new_s)
    return updates, tuple(new_states)

  def init_partition_spec_fn(mdl_vars):
    specs = []
    for tx in transforms:
      fn = getattr(tx, "init_partition_spec", None)
      if callable(fn):
        specs.append(fn(mdl_vars))
      else:
        # Plain optax members (e.g. `optax.scale`, the lr stage) carry
        # no spec method; synthesize one from their init state — array
        # leaves become replicated WeightHParams, everything else (empty
        # NamedTuples, MaskedNode) passes through.  The reference raises
        # here instead, which breaks `tearfree(...).init_partition_spec`
        # for every chain ending in a learning-rate stage.
        state = tx.init(mdl_vars)
        specs.append(jax.tree.map(
            lambda x: WeightHParams(
                shape=list(x.shape), init=None, dtype=x.dtype,
                collections=None, tensor_split_dims_mapping=[-1] * x.ndim)
            if isinstance(x, (jax.Array, jnp.ndarray)) else x,
            state))
    return optax.MaskedState(inner_state=tuple(specs))

  return ShardedGradientTransformation(
      init=init_fn, update=update_fn,
      init_partition_spec=init_partition_spec_fn)
