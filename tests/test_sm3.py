"""SM3 optimizer tests: finiteness smoke + exact upstream parity."""

import numpy as np
import chex
import jax
import jax.numpy as jnp

from precondition_tpu.optim import sm3

from conftest import requires_reference


def _fixture():
  rng = np.random.RandomState(0)
  params = {
      "w": jnp.asarray(rng.randn(4, 3), jnp.float32),
      "b": jnp.asarray(rng.randn(3), jnp.float32),
      "t": jnp.asarray(rng.randn(2, 3, 4), jnp.float32),
  }
  grads = jax.tree.map(
      lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
  return params, grads


class TestSM3:

  def test_finite_after_steps(self):
    params, grads = _fixture()
    tx = sm3.sm3(0.1, normalize_grads=True, weight_decay=1e-4)
    state = tx.init(params)
    update = jax.jit(tx.update)
    for _ in range(6):
      updates, state = update(grads, state, params)
      params = jax.tree.map(lambda p, u: p + u, params, updates)
    chex.assert_tree_all_finite((params, state))

  def test_accumulator_shapes(self):
    params, _ = _fixture()
    state = sm3.sm3(0.1).init(params)
    accs = state.stats["t"].diagonal_statistics
    assert [a.shape for a in accs] == [(2,), (3,), (4,)]

  @requires_reference
  def test_matches_upstream(self):
    from precondition import sm3 as ref
    params, grads = _fixture()
    ours_tx = sm3.sm3(0.3, beta1=0.9, beta2=0.999)
    ref_tx = ref.sm3(0.3, beta1=0.9, beta2=0.999)
    ours_state = ours_tx.init(params)
    ref_state = ref_tx.init(params)
    for step in range(5):
      ours_up, ours_state = ours_tx.update(grads, ours_state, params)
      ref_up, ref_state = ref_tx.update(grads, ref_state, params)
      chex.assert_trees_all_close(ours_up, ref_up, rtol=1e-6, atol=1e-7,
                                  custom_message=f"step {step}")
