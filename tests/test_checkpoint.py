"""Checkpoint/resume roundtrips for optimizer state (SURVEY §5).

The reference defines checkpointable state pytrees plus shape/dtype and
partition-spec factories and leaves the save/restore to the trainer
(`/root/reference/precondition/distributed_shampoo.py:2162-2416`,
`:3661-3673`).  These tests drive that contract end-to-end with orbax:
state saved mid-run and restored must continue bit-identically, and the
sharded mode's `InitFnState` factories must describe the real state layout
exactly (they are what a trainer restores *into*).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import orbax.checkpoint as ocp

from precondition_tpu.optim import shampoo
from precondition_tpu.optim import sharded_shampoo
from precondition_tpu.tearfree import optimizer as tearfree_optimizer


def _params():
  rng = np.random.RandomState(7)
  return {
      "w": jnp.asarray(rng.randn(12, 20), jnp.float32),
      "blk": {"k": jnp.asarray(rng.randn(8, 8), jnp.float32),
              "b": jnp.asarray(rng.randn(20), jnp.float32)},
  }


def _grads(seed):
  rng = np.random.RandomState(seed)
  return jax.tree.map(
      lambda p: jnp.asarray(rng.randn(*p.shape) * 0.1, jnp.float32),
      _params())


def _run(tx, state, params, steps, seed0=100):
  outs = []
  for i in range(steps):
    updates, state = tx.update(_grads(seed0 + i), state, params)
    params = optax.apply_updates(params, updates)
    outs.append(params)
  return outs, state


def _roundtrip(state, tmp_path):
  """Save + restore through orbax's standard pytree checkpointer."""
  path = tmp_path / "ckpt"
  with ocp.StandardCheckpointer() as ckptr:
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return ckptr.restore(path, state)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(best_effort_memory_usage_reduction=True),  # int8/int16 leaves
    dict(reuse_preconditioner=True),
])
def test_shampoo_resume_bit_identical(tmp_path, kwargs):
  params = _params()
  tx = shampoo.distributed_shampoo(
      learning_rate=0.05, block_size=8, start_preconditioning_step=2,
      preconditioning_compute_steps=2,
      graft_type=shampoo.GraftingType.RMSPROP, **kwargs)
  state = tx.init(params)

  mid_params_list, mid_state = _run(tx, state, params, 3)
  mid_params = mid_params_list[-1]

  restored = _roundtrip(mid_state, tmp_path)
  chex_equal = jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      jax.tree.leaves(mid_state), jax.tree.leaves(restored))
  del chex_equal

  cont_direct, _ = _run(tx, mid_state, mid_params, 2, seed0=200)
  cont_restored, _ = _run(tx, restored, mid_params, 2, seed0=200)
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      cont_direct, cont_restored)


def test_tearfree_resume_bit_identical(tmp_path):
  params = _params()
  tx = tearfree_optimizer.tearfree(
      learning_rate=0.05, options=tearfree_optimizer.TearfreeOptions())
  state = tx.init(params)
  mid_params_list, mid_state = _run(tx, state, params, 3)
  restored = _roundtrip(mid_state, tmp_path)
  cont_direct, _ = _run(tx, mid_state, mid_params_list[-1], 2, seed0=300)
  cont_restored, _ = _run(tx, restored, mid_params_list[-1], 2, seed0=300)
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      cont_direct, cont_restored)


class TestShardedFactories:
  """`InitFnState` factories must describe the real state exactly —
  they are the restore-side source of truth for shapes and shardings."""

  def _tx_and_params(self):
    params = _params()
    tx = shampoo.distributed_shampoo(
        learning_rate=0.05, block_size=8, start_preconditioning_step=0,
        preconditioning_compute_steps=1, shard_optimizer_states=True,
        num_devices_for_pjit=2,
        graft_type=shampoo.GraftingType.RMSPROP)
    return tx, params

  def _flat_shape_dtypes(self, tree):
    """Flatten a shape/dtype-factory tree into [(shape, dtype), ...].

    The factory encodes each array as the 2-list ``[shape, dtype]``
    (reference layout, `distributed_shampoo.py:2343-2416`), which the
    generic flatten would explode; treat those pairs as leaves.
    """
    out = []

    def walk(node):
      if (isinstance(node, list) and len(node) == 2
          and isinstance(node[0], list)
          and not isinstance(node[1], list)):
        out.append((tuple(node[0]), jnp.dtype(node[1])))
      elif isinstance(node, list):
        for x in node:
          walk(x)
      else:
        for x in jax.tree.leaves(
            node, is_leaf=lambda l: isinstance(l, list)):
          if isinstance(x, list):
            walk(x)
          elif hasattr(x, "shape"):
            out.append((tuple(np.shape(x)), np.asarray(x).dtype))
    walk(jax.tree.leaves(tree, is_leaf=lambda l: isinstance(l, list)))
    return out

  def test_shape_dtype_fn_matches_state(self):
    tx, params = self._tx_and_params()
    init_state = tx.init(params)
    assert isinstance(init_state, sharded_shampoo.InitFnState)
    state = init_state.init_fn(params)
    declared = self._flat_shape_dtypes(
        init_state.shape_and_dtype_fn(params))
    actual = [(tuple(l.shape), l.dtype) for l in jax.tree.leaves(state)
              if hasattr(l, "shape")]
    # Every array in the real state must appear in the declaration with
    # identical shape+dtype (order-insensitive multiset comparison).
    assert sorted(map(repr, declared)) == sorted(map(repr, actual))

  def test_pspec_fn_structure_matches_state(self):
    tx, params = self._tx_and_params()
    init_state = tx.init(params)
    state = init_state.init_fn(params)
    specs = init_state.pspec_fn(
        params, jax.tree.map(lambda _: jax.sharding.PartitionSpec(),
                             params))
    # Same treedef up to leaf type (PartitionSpec vs array).
    flat_state = jax.tree.leaves(
        state, is_leaf=lambda l: isinstance(l, jax.sharding.PartitionSpec))
    flat_spec = jax.tree.leaves(
        specs, is_leaf=lambda l: isinstance(l, jax.sharding.PartitionSpec))
    arrays = [l for l in flat_state if hasattr(l, "shape")]
    pspecs = [l for l in flat_spec
              if isinstance(l, jax.sharding.PartitionSpec)]
    assert len(pspecs) == len(arrays), (len(pspecs), len(arrays))

  def test_sharded_state_orbax_roundtrip(self, tmp_path):
    tx, params = self._tx_and_params()
    init_state = tx.init(params)
    state = init_state.init_fn(params)
    updates, state2 = tx.update(_grads(1), state, params)
    del updates
    restored = _roundtrip(state2, tmp_path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.tree.leaves(state2), jax.tree.leaves(restored))
