"""Tearfree optimizer: graft ∘ second-order ∘ momentum ∘ lr.

Key memory saving vs the core optimizer: one shared momentum buffer between
the grafting and preconditioned updates (the core keeps two).  Learning
rate is always decoupled (applied last).  Parity with
`/root/reference/precondition/tearfree/optimizer.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import chex
import optax

from precondition_tpu.tearfree import grafting
from precondition_tpu.tearfree import momentum
from precondition_tpu.tearfree import praxis_shim
from precondition_tpu.tearfree import second_order


@dataclasses.dataclass
class TearfreeOptions:
  """Bundle of the three stage configs."""

  grafting_options: grafting.Options = dataclasses.field(
      default_factory=grafting.Options)
  second_order_options: second_order.Options = dataclasses.field(
      default_factory=second_order.Options)
  momentum_options: momentum.Options = dataclasses.field(
      default_factory=momentum.Options)


def tearfree(
    learning_rate: Union[chex.Numeric, optax.Schedule],
    options: TearfreeOptions,
) -> praxis_shim.ShardedGradientTransformation:
  """Build the full tearfree optimizer chain.

  Args:
    learning_rate: value or schedule; applied last (decoupled).
    options: stage options.

  Returns:
    A sharded gradient transformation producing ``-lr *`` the grafted,
    preconditioned, momentum-smoothed update.
  """
  second_order_tx = second_order.apply(options.second_order_options)
  graft_tx = grafting.graft(options.grafting_options, second_order_tx)
  momentum_tx = momentum.apply(options.momentum_options)
  if callable(learning_rate):
    lr_tx = optax.scale_by_schedule(lambda x: -1.0 * learning_rate(x))
  else:
    lr_tx = optax.scale(-1.0 * learning_rate)
  return praxis_shim.sharded_chain(graft_tx, momentum_tx, lr_tx)
