"""Gradient merge/pad and unpad/unmerge transforms.

Collapses small dimensions then pads large ones up to a multiple of the
block size, so the blocked Shampoo layer downstream sees only
divisible-by-block shapes.  Semantics parity with
`/root/reference/precondition/tearfree/reshaper.py`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from precondition_tpu.tearfree import praxis_shim
from precondition_tpu.utils import shapes as shape_utils


@dataclasses.dataclass
class Options:
  """Reshaping options.

  Attributes:
    merge_dims: collapse adjacent dims whose product stays under this.
    block_size: if nonzero, pad every dim >= block_size up to a multiple of
      it (0 disables padding).
  """

  merge_dims: int = 1024
  block_size: int = 1024


@dataclasses.dataclass
class _Shapes:
  original_shape: list
  merged_shape: list
  padded_shape: list


def _derive_shapes(options: Options, param) -> _Shapes:
  merged = shape_utils.merge_small_dims(param.shape, options.merge_dims)
  if merged == [1]:
    # Fully-degenerate tensors collapse to scalars.
    return _Shapes(list(param.shape), [], [])
  if options.block_size == 0:
    padded = list(merged)
  else:
    bs = options.block_size
    padded = [(-(-s // bs)) * bs if s >= bs else s for s in merged]
  return _Shapes(list(param.shape), list(merged), padded)


def _validate(options: Options):
  if options.merge_dims < 2:
    raise ValueError(f"merge_dims ({options.merge_dims}) must be at least 2")
  if options.block_size != 0 and options.block_size < 2:
    raise ValueError(
        f"block_size ({options.block_size}) must be at least 2 (or 0)")


def merge(options: Options) -> praxis_shim.ShardedGradientTransformation:
  """Merge small dims and zero-pad large ones (gradients only)."""
  _validate(options)

  def _merge(update, shapes: _Shapes):
    assert list(update.shape) == shapes.original_shape, (update.shape, shapes)
    merged = update.reshape(shapes.merged_shape)
    if options.block_size > 0:
      padding = [(0, p - m)
                 for p, m in zip(shapes.padded_shape, shapes.merged_shape)]
      if padding:
        return jnp.pad(merged, padding)
    return merged

  def update_fn(updates, state, params):
    shapes = jax.tree.map(functools.partial(_derive_shapes, options), params)
    return jax.tree.map(_merge, updates, shapes), state

  # Stateless, so the partition spec is trivially empty; providing it lets
  # the whole tearfree chain satisfy `init_partition_spec` (the reference
  # leaves this hole open — `second_order.py:66` TODO).
  return praxis_shim.ShardedGradientTransformation(
      lambda _: optax.MaskedNode(), update_fn,
      lambda _: optax.MaskedNode())


def unmerge(options: Options) -> praxis_shim.ShardedGradientTransformation:
  """Inverse of `merge`."""
  _validate(options)

  def _unmerge(update, shapes: _Shapes):
    assert list(update.shape) == shapes.padded_shape, (update.shape, shapes)
    if options.block_size == 0:
      merged = update
    else:
      merged = update[tuple(slice(0, m) for m in shapes.merged_shape)]
    return merged.reshape(shapes.original_shape)

  def update_fn(updates, state, params):
    shapes = jax.tree.map(functools.partial(_derive_shapes, options), params)
    return jax.tree.map(_unmerge, updates, shapes), state

  return praxis_shim.ShardedGradientTransformation(
      lambda _: optax.MaskedNode(), update_fn,
      lambda _: optax.MaskedNode())
