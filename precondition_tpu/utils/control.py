"""Traced-control-flow helpers."""

from __future__ import annotations

import jax
from jax import lax


def lazy_cond(predicate, compute_fn, init_state):
  """Run ``compute_fn`` only when ``predicate`` is true, else keep state.

  Expressed as a zero-or-one-trip `lax.while_loop` rather than `lax.cond`:
  under XLA a `cond` whose branches return large buffers materialises both
  sides' outputs, while the while_loop form updates buffers in place and
  skips the body entirely on false — the trick the reference uses to make
  ``statistics_compute_steps``/``preconditioning_compute_steps`` gating free
  (`/root/reference/precondition/distributed_shampoo.py:1372-1384`).

  Args:
    predicate: traced bool.
    compute_fn: nullary function returning a tuple/list shaped like
      ``init_state``.
    init_state: list of arrays returned unchanged when predicate is false.

  Returns:
    Tuple of results.
  """

  def body(_):
    return tuple([False] + list(compute_fn()))

  def cond(state):
    return state[0]

  results = lax.while_loop(cond, body, tuple([predicate] + list(init_state)))
  return tuple(results[1:])


def tree_lazy_cond(predicate, compute_fn, init_tree):
  """`lazy_cond` generalised to an arbitrary pytree of arrays."""
  leaves, treedef = jax.tree.flatten(init_tree)

  def flat_compute():
    return jax.tree.leaves(compute_fn())

  out = lazy_cond(predicate, flat_compute, leaves)
  return jax.tree.unflatten(treedef, out)
