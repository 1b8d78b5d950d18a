"""Rich diagnostics plumbing tests.

The diagnostics structs (`utils.diagnostics`) mirror the reference's
`InversePthRootDiagnostics` / `LOBPCGDiagnostics` / `FDDiagnostics`
(`distributed_shampoo.py:109-335`).  These tests cover:

* struct numerics against the upstream oracle (same inputs, same fields),
* the opt-in optimizer plumbing (`generate_detailed_metrics` /
  `generate_fd_metrics`): shapes, finiteness, masked-off defaults,
* staleness suppression on root-recompute off-steps.
"""

import chex
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from precondition_tpu.ops import pth_root
from precondition_tpu.optim import shampoo
from precondition_tpu.utils import diagnostics

from conftest import requires_reference


def _psd(rng, n, ridge=0.1):
  a = rng.randn(n, n).astype(np.float32)
  return jnp.asarray(a @ a.T / n + ridge * np.eye(n, dtype=np.float32))


def _fixture(seed=0):
  rng = np.random.RandomState(seed)
  params = {
      "w": jnp.asarray(rng.randn(4, 3) * 0.5, jnp.float32),
      "t": jnp.asarray(rng.randn(2, 3, 4) * 0.5, jnp.float32),
  }
  grads = [
      jax.tree.map(
          lambda p: jnp.asarray(rng.randn(*p.shape) * 0.1, jnp.float32),
          params) for _ in range(5)
  ]
  return params, grads


COMMON = dict(learning_rate=0.1, block_size=8, beta1=0.9, beta2=0.999,
              matrix_epsilon=1e-6, start_preconditioning_step=2)


class TestStructOracle:
  """Struct numerics vs the upstream dataclasses on identical inputs."""

  @requires_reference
  @pytest.mark.parametrize("p", [2, 4])
  def test_inverse_pth_root_diagnostics(self, p):
    import precondition.distributed_shampoo as ref

    rng = np.random.RandomState(p)
    mat = _psd(rng, 12)
    root, _ = pth_root.matrix_inverse_pth_root(mat, p)
    ours = diagnostics.InversePthRootDiagnostics.create(root, mat, p)
    want = ref.InversePthRootDiagnostics.create(root, mat, p)
    np.testing.assert_allclose(ours.max_diag_error, want.max_diag_error,
                               rtol=1e-5)
    np.testing.assert_allclose(ours.avg_diag_error, want.avg_diag_error,
                               rtol=1e-5)
    np.testing.assert_allclose(ours.max_off_diag_error,
                               want.max_off_diag_error, rtol=1e-5)
    np.testing.assert_allclose(ours.avg_off_diag_error,
                               want.avg_off_diag_error, rtol=1e-5)
    assert float(ours.p) == p

  @requires_reference
  def test_lobpcg_diagnostics(self):
    import precondition.distributed_shampoo as ref

    rng = np.random.RandomState(0)
    mat = _psd(rng, 16)
    e, v = np.linalg.eigh(np.asarray(mat))
    eigvals = jnp.asarray(e[-3:][::-1].copy())
    eigvecs = jnp.asarray(v[:, -3:][:, ::-1].copy())
    ours = diagnostics.LOBPCGDiagnostics.create(mat, eigvals, eigvecs, 7)
    want = ref.LOBPCGDiagnostics.create(mat, eigvals, eigvecs,
                                        jnp.asarray(7))
    for field in ("max_consistency_error", "avg_consistency_error",
                  "avg_orthogonality_error", "max_eigenvalue",
                  "min_eigenvalue", "num_topk_eigenvectors"):
      np.testing.assert_allclose(
          getattr(ours, field), getattr(want, field), rtol=1e-5, atol=1e-7,
          err_msg=field)


class TestSolverDiagnostics:

  def test_plain_solve_attaches_residuals(self):
    rng = np.random.RandomState(1)
    mat = _psd(rng, 12)
    root, met = pth_root.matrix_inverse_pth_root(
        mat, 4, generate_diagnostics=True)
    d = met.inverse_pth_root_diagnostics
    assert not isinstance(d, optax.MaskedNode)
    # Converged root: residual diagnostics agree with the solver error.
    assert float(jnp.maximum(d.max_diag_error, d.max_off_diag_error)) < 1e-3
    assert float(d.p) == 4
    # LOBPCG off: its diagnostics are structurally present but zero.
    assert float(met.lobpcg.max_eigenvalue) == 0.0
    assert float(
        met.conditioned_inverse_pth_root_diagnostics.max_diag_error) == 0.0

  def test_solve_without_flag_is_masked(self):
    rng = np.random.RandomState(2)
    root, met = pth_root.matrix_inverse_pth_root(_psd(rng, 8), 2)
    assert isinstance(met.inverse_pth_root_diagnostics, optax.MaskedNode)
    assert isinstance(met.lobpcg, optax.MaskedNode)
    assert isinstance(met.fd, optax.MaskedNode)

  def test_lobpcg_solve_fills_all(self):
    rng = np.random.RandomState(3)
    mat = _psd(rng, 16)
    root, met = pth_root.matrix_inverse_pth_root(
        mat, 2, lobpcg_topk_precondition=2, generate_diagnostics=True)
    assert float(met.lobpcg.num_topk_eigenvectors) == 2
    assert float(met.lobpcg.max_eigenvalue) > 0
    d_un = met.inverse_pth_root_diagnostics
    d_co = met.conditioned_inverse_pth_root_diagnostics
    assert float(jnp.maximum(d_un.max_diag_error,
                             d_un.max_off_diag_error)) < 5e-2
    assert float(jnp.maximum(d_co.max_diag_error,
                             d_co.max_off_diag_error)) < 5e-2

  def test_padding_masked_residuals(self):
    rng = np.random.RandomState(4)
    mat = np.zeros((12, 12), np.float32)
    mat[:8, :8] = np.asarray(_psd(rng, 8))
    root, met = pth_root.matrix_inverse_pth_root(
        jnp.asarray(mat), 4, padding_start=8, generate_diagnostics=True)
    d = met.inverse_pth_root_diagnostics
    # Without padding awareness the zero rows would report |0-1|=1.
    assert float(d.max_diag_error) < 1e-3
    # Pure padding: all-zero diagnostics.
    _, met0 = pth_root.matrix_inverse_pth_root(
        jnp.zeros((4, 4)), 4, padding_start=0, generate_diagnostics=True)
    assert float(met0.inverse_pth_root_diagnostics.max_diag_error) == 0.0


class TestOptimizerPlumbing:

  def test_masked_by_default(self):
    params, grads = _fixture()
    tx = shampoo.distributed_shampoo(**COMMON)
    state = tx.init(params)
    _, state = jax.jit(tx.update)(grads[0], state, params)
    met = state.stats["w"].training_metrics
    assert isinstance(met.inverse_pth_root_diagnostics, optax.MaskedNode)
    assert isinstance(met.fd, optax.MaskedNode)

  def test_detailed_metrics_in_state(self):
    params, grads = _fixture()
    tx = shampoo.distributed_shampoo(**COMMON,
                                     generate_detailed_metrics=True)
    state = tx.init(params)
    update = jax.jit(tx.update)
    p = params
    for g in grads:
      u, state = update(g, state, p)
      p = jax.tree.map(lambda a, b: a + b, p, u)
    met = state.stats["w"].training_metrics
    n = met.error.shape[0]
    d = met.inverse_pth_root_diagnostics
    assert d.max_diag_error.shape == (n,)
    chex.assert_tree_all_finite(met)
    # Past start_preconditioning_step the roots converged; the entrywise
    # residuals must agree with the scalar errors' magnitude.
    assert float(jnp.max(d.max_diag_error)) < 1e-2
    assert float(jnp.max(d.max_off_diag_error)) < 1e-2
    # "w" [4,3] merges to [12]: one factored axis -> p = 2 everywhere.
    np.testing.assert_array_equal(np.asarray(d.p), 2.0)

  def test_detailed_metrics_stale_on_off_steps(self):
    params, grads = _fixture()
    tx = shampoo.distributed_shampoo(
        **COMMON, preconditioning_compute_steps=2,
        generate_detailed_metrics=True)
    state = tx.init(params)
    update = jax.jit(tx.update)
    p = params
    snapshots = []
    for g in grads:
      u, state = update(g, state, p)
      p = jax.tree.map(lambda a, b: a + b, p, u)
      snapshots.append(state.stats["w"].training_metrics)
    # Solves run on even counts: the following off-step must keep the
    # stale diagnostics bit-for-bit.
    chex.assert_trees_all_equal(snapshots[2], snapshots[3])

  def test_fd_metrics_in_state(self):
    rng = np.random.RandomState(0)
    params = {"t": jnp.asarray(rng.randn(8, 6) * 0.5, jnp.float32)}
    grads = [jnp.asarray(rng.randn(8, 6) * 0.1, jnp.float32)
             for _ in range(5)]
    grads = [{"t": g} for g in grads]
    kw = {**COMMON, "block_size": 16, "start_preconditioning_step": 1}
    tx = shampoo.distributed_shampoo(
        **kw, merge_small_dims_block_size=1,
        compression_rank=2, frequent_directions=True,
        generate_fd_metrics=True)
    state = tx.init(params)
    update = jax.jit(tx.update)
    p = params
    for g in grads:
      u, state = update(g, state, p)
      p = jax.tree.map(lambda a, b: a + b, p, u)
    met = state.stats["t"].training_metrics
    assert not isinstance(met.fd, optax.MaskedNode)
    chex.assert_tree_all_finite(met.fd)
    n = met.error.shape[0]
    assert met.fd.rho.shape == (n,)
    # At least the compressed (dim-4) statistics produced real reports:
    # rank/max_size recorded for every fd-solved statistic.
    assert float(jnp.max(met.fd.size_rank)) == 2.0

  @requires_reference
  def test_fd_metrics_match_upstream(self):
    import precondition.distributed_shampoo as ref

    rng = np.random.RandomState(0)
    params = {"t": jnp.asarray(rng.randn(8, 6) * 0.5, jnp.float32)}
    grads = [{"t": jnp.asarray(rng.randn(8, 6) * 0.1, jnp.float32)}
             for _ in range(5)]
    # Upstream's FD path requires reuse_preconditioner to plumb `prev`.
    kw = dict(learning_rate=0.1, block_size=16, merge_small_dims_block_size=1,
              beta1=0.9, beta2=0.999, matrix_epsilon=1e-6,
              start_preconditioning_step=1, compression_rank=2,
              frequent_directions=True, generate_fd_metrics=True,
              reuse_preconditioner=True)
    ours_tx = shampoo.distributed_shampoo(**kw)
    ref_tx = ref.distributed_shampoo(
        **{k: v for k, v in kw.items() if k != "compression_rank"},
        compression_rank=2, num_devices_for_pjit=None)
    params_r = jax.tree.map(lambda x: x, params)
    ours_s, ref_s = ours_tx.init(params), ref_tx.init(params_r)
    p_o, p_r = params, params_r
    for g in grads:
      u_o, ours_s = jax.jit(ours_tx.update)(g, ours_s, p_o)
      u_r, ref_s = jax.jit(ref_tx.update)(g, ref_s, p_r)
      p_o = jax.tree.map(lambda a, b: a + b, p_o, u_o)
      p_r = jax.tree.map(lambda a, b: a + b, p_r, u_r)
    ours_fd = ours_s.stats["t"].training_metrics.fd
    ref_fd = ref_s.stats["t"].training_metrics.fd
    # Same FD solves -> same health report (field names map 1:1).
    for name, ref_name in [("rho", "rho"), ("tail", "tail"),
                           ("eig_max", "eig_max"), ("eig_min", "eig_min"),
                           ("size_rank", "size_rank"),
                           ("num_neg_eigs", "num_neg_eigs")]:
      ours_v = np.sort(np.asarray(getattr(ours_fd, name)).ravel())
      ref_v = np.sort(np.asarray(getattr(ref_fd, ref_name)).ravel())
      np.testing.assert_allclose(ours_v, ref_v, rtol=2e-3, atol=1e-5,
                                 err_msg=name)
