"""OCO harness tests: algorithm parity with upstream on a synthetic task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from precondition_tpu.oco import algorithms

from conftest import requires_reference


def _run_steps(init_fn, update_fn, grads):
  state = init_fn()
  for g in grads:
    state = update_fn(state, jnp.array(0.0), g)
  return state


def _grads(d=12, n=15, seed=0):
  rng = np.random.RandomState(seed)
  return [jnp.asarray(rng.randn(d)) for _ in range(n)]


class TestAlgorithms:

  @pytest.mark.parametrize("alg", list(algorithms.Algorithm))
  def test_finite(self, alg):
    sketched = alg not in (algorithms.Algorithm.OGD, algorithms.Algorithm.ADA)
    hp = algorithms.HParams(
        delta=1.0, lr=0.1, sketch_size=4 if sketched else 0, algorithm=alg)
    init_fn, update_fn = algorithms.generate_init_update((12,), hp)
    state = _run_steps(init_fn, update_fn, _grads())
    assert np.isfinite(np.asarray(state["w"])).all()
    assert float(jnp.linalg.norm(state["w"])) > 0

  def test_ogd_analytic(self):
    hp = algorithms.HParams(delta=0.0, lr=1.0, sketch_size=0,
                            algorithm=algorithms.Algorithm.OGD)
    init_fn, update_fn = algorithms.generate_init_update((3,), hp)
    g = jnp.asarray([1.0, 2.0, 3.0])
    state = init_fn()
    state = update_fn(state, jnp.array(0.0), g)
    # First step: w -= lr * g / sqrt(1).
    np.testing.assert_allclose(state["w"], -g, rtol=1e-12)

  @requires_reference
  @pytest.mark.parametrize("alg_name",
                           ["OGD", "ADA", "RFD_SON", "FD_SON", "ADA_FD",
                            "S_ADA"])
  def test_matches_upstream(self, alg_name):
    from precondition.oco import algorithms as ref

    ours_alg = algorithms.Algorithm[alg_name]
    ref_alg = ref.Algorithm[alg_name]
    sketched = alg_name not in ("OGD", "ADA")
    k = 4 if sketched else 0
    ours_hp = algorithms.HParams(0.5, 0.2, k, ours_alg)
    ref_hp = ref.HParams(0.5, 0.2, k, ref_alg)
    grads = _grads()
    ours_i, ours_u = algorithms.generate_init_update((12,), ours_hp)
    ref_i, ref_u = ref.generate_init_update((12,), ref_hp)
    ours_state = _run_steps(ours_i, ours_u, grads)
    ref_state = _run_steps(ref_i, ref_u, grads)
    np.testing.assert_allclose(
        np.asarray(ours_state["w"]), np.asarray(ref_state["w"]),
        rtol=1e-6, atol=1e-9)

  @requires_reference
  def test_matches_upstream_f64(self):
    """Parity at the precision the reference specifies (f64, see its
    `oco/sweep.py:38`). x64 must not leak into this session's f32 tests,
    so the comparison runs in a clean subprocess."""
    import os
    import subprocess
    import sys

    driver = os.path.join(os.path.dirname(__file__), "oco_f64_driver.py")
    proc = subprocess.run(
        [sys.executable, driver], capture_output=True, text=True,
        timeout=280, env={**os.environ, "JAX_ENABLE_X64": "1"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
