"""Pallas kernel tests (run on TPU; skipped on CPU backends).

The unit-test conftest forces the CPU backend, so these are exercised by
`benchmarks/` drives and the TPU bench; here we keep interpret-mode checks
cheap enough for CPU CI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from precondition_tpu.ops import pth_root


def _tpu_available():
  try:
    return jax.devices()[0].platform not in ("cpu",)
  except Exception:  # pylint: disable=broad-except
    return False


class TestStaticMatPower:

  @pytest.mark.parametrize("p", [1, 2, 3, 4, 6, 8])
  def test_static_matches_dynamic(self, p):
    rng = np.random.RandomState(p)
    m = jnp.asarray(rng.randn(8, 8) * 0.3, jnp.float32)
    static = pth_root.mat_power(m, p)
    dynamic = pth_root.mat_power(m, jnp.asarray(p))
    np.testing.assert_allclose(static, dynamic, rtol=1e-5, atol=1e-6)

  def test_static_exponent_solve_matches(self):
    rng = np.random.RandomState(0)
    s = rng.randn(3, 12, 12).astype(np.float32)
    stats = jnp.einsum("nij,nkj->nik", s, s) / 12
    pads = jnp.full((3,), 12, jnp.int32)
    r_static, m_static = pth_root.batched_inverse_pth_root(stats, 4, pads)
    r_dyn, m_dyn = pth_root.batched_inverse_pth_root(
        stats, jnp.full((3,), 4, jnp.int32), pads)
    np.testing.assert_allclose(r_static, r_dyn, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_static.error, m_dyn.error, rtol=1e-3)


@pytest.mark.skipif(not _tpu_available(), reason="needs a TPU backend")
class TestNewtonRootKernel:

  def test_matches_xla_path(self):
    from precondition_tpu.ops.pallas import newton_root

    rng = np.random.RandomState(0)
    n, m = 8, 128
    s = rng.randn(n, m, m).astype(np.float32)
    stats = jnp.einsum("nij,nkj->nik", s, s) / m
    exps = jnp.full((n,), 4, jnp.int32)
    pads = jnp.full((n,), m, jnp.int32)
    roots_p, met_p = newton_root.batched_inverse_pth_root_pallas(
        stats, exps, pads)
    roots_x, met_x = pth_root.batched_inverse_pth_root(stats, 4, pads)
    assert float(jnp.max(met_p.error)) < 1e-4
    rel = float(jnp.max(jnp.abs(roots_p - roots_x))) / float(
        jnp.max(jnp.abs(roots_x)))
    assert rel < 5e-3, rel
