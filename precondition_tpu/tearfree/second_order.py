"""Second-order statistics dispatch: blocked Shampoo or Sketchy.

Wraps the chosen preconditioner with the merge/pad → precondition → unmerge
reshaping chain.  Parity with
`/root/reference/precondition/tearfree/second_order.py`.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import optax

from precondition_tpu.tearfree import praxis_shim
from precondition_tpu.tearfree import reshaper
from precondition_tpu.tearfree import shampoo
from precondition_tpu.tearfree import sketchy


@enum.unique
class SecondOrderType(enum.Enum):
  SHAMPOO = "shampoo"
  SKETCHY = "sketchy"


@dataclasses.dataclass
class Options:
  """Second-order tracking options.

  Attributes:
    merge_dims: dim-merging threshold fed to the reshaper.
    second_order_type: SHAMPOO or SKETCHY.
    shampoo_options: blocked-Shampoo options (when SHAMPOO).
    sketchy_options: Sketchy options (when SKETCHY).
  """

  merge_dims: int = 1024
  second_order_type: SecondOrderType = SecondOrderType.SHAMPOO
  shampoo_options: Optional[shampoo.Options] = dataclasses.field(
      default_factory=shampoo.Options)
  sketchy_options: Optional[sketchy.Options] = None


def _reshaper_options(options: Options) -> reshaper.Options:
  if options.second_order_type == SecondOrderType.SHAMPOO:
    assert options.shampoo_options
    return reshaper.Options(options.merge_dims,
                            options.shampoo_options.block_size)
  if options.second_order_type == SecondOrderType.SKETCHY:
    # Sketchy has no divisibility constraint: merge only, no padding.
    return reshaper.Options(options.merge_dims, 0)
  raise ValueError(f"unknown second order type {options.second_order_type}")


def _precond_tx(options: Options) -> praxis_shim.ShardedGradientTransformation:
  if options.second_order_type == SecondOrderType.SHAMPOO:
    assert options.shampoo_options
    return shampoo.apply(options.shampoo_options)
  if options.second_order_type == SecondOrderType.SKETCHY:
    assert options.sketchy_options
    return sketchy.apply(options.sketchy_options)
  raise ValueError(f"unknown second order type {options.second_order_type}")


def apply(options: Options) -> praxis_shim.ShardedGradientTransformation:
  """Build merge → precondition → unmerge."""
  reshaper_options = _reshaper_options(options)
  merge_tx = reshaper.merge(reshaper_options)
  precond_tx = _precond_tx(options)

  def wrap_init(params: optax.Params):
    # The preconditioner sees merged/padded shapes, so initialise its state
    # from the reshaped params.
    reshaped, _ = merge_tx.update(params, merge_tx.init(params), params)
    return precond_tx.init(reshaped)

  wrapped = praxis_shim.ShardedGradientTransformation(
      wrap_init, precond_tx.update, precond_tx.init_partition_spec)

  return praxis_shim.sharded_chain(
      merge_tx, wrapped, reshaper.unmerge(reshaper_options))
