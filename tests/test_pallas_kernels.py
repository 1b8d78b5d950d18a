"""Pallas kernel tests.

The fused tile kernel (`ops/pallas/newton_root.py`) runs in interpret
mode here so every semantic branch — cold solves, certified warm starts,
padding masks, the retry ladder, tile padding — is exercised on the CPU
CI backend; the TPU benches drive the compiled kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from precondition_tpu.ops import pth_root
from precondition_tpu.ops.pallas import newton_root


def _psd_batch(rng, n, m, ridge=0.1):
  a = rng.randn(n, m, m).astype(np.float32)
  return jnp.einsum("nij,nkj->nik", a, a) / m + ridge * jnp.eye(m)[None]


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


class TestNewtonRootKernel:
  """Interpret-mode parity of the fused tile kernel vs the XLA path."""

  @pytest.mark.parametrize("p", [2, 4, 8])
  def test_cold_matches_xla(self, p):
    rng = np.random.RandomState(p)
    n, m = 12, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    roots_p, met_p = newton_root.batched_inverse_pth_root_pallas(
        stats, p, pads, interpret=True)
    roots_x, met_x = pth_root.batched_inverse_pth_root(stats, p, pads)
    assert float(jnp.max(met_p.error)) < 1e-4
    np.testing.assert_allclose(roots_p, roots_x, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(met_p.iterations, met_x.iterations, atol=2)

  @pytest.mark.parametrize("cond", [1e2, 1e6])
  def test_true_residual_ill_conditioned(self, cond):
    """The root's TRUE residual |H^p (A + r I) - I| (recomputed in f64,
    independent of the solver's self-report) must track the self-report.

    This is the contract the retired mixed-precision ladder broke: the
    coarse phase destroyed the H<->A commutativity the coupled
    iteration's invariant rests on, so it self-reported 1e-6 residuals
    while emitting roots with true residuals ~1e8 on ill-conditioned
    TPU batches.  CPU matmuls are exact f32 (DEFAULT==HIGHEST), so this
    interpret-mode test pins the contract; `benchmarks/
    tpu_numerics_check.py` re-verifies it on real-chip numerics."""
    import scipy.stats

    rng = np.random.RandomState(int(np.log10(cond)))
    n, m, p = 4, 32, 4
    mats = []
    for _ in range(n):
      q = scipy.stats.ortho_group.rvs(m, random_state=rng)
      e = np.logspace(0, np.log10(cond), m)
      mats.append((q * e) @ q.T)
    stats = jnp.asarray(np.stack(mats), jnp.float32)
    pads = jnp.full((n,), m, jnp.int32)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, p, pads, interpret=True)
    h = np.asarray(roots, np.float64)
    eff = (1e-6 * np.asarray(met.max_eigenvalue, np.float64)
           * 10.0 ** np.maximum(np.asarray(met.retries) - 1.0, 0.0))
    d = np.asarray(stats, np.float64) + eff[:, None, None] * np.eye(m)
    h2 = np.matmul(h, h)
    resid = np.abs(np.matmul(np.matmul(h2, h2), d) - np.eye(m)).max()
    # f32 storage of H alone costs ~eps*p*cond; allow 100x headroom.
    assert resid < max(100 * 1.2e-7 * p * cond, 1.0), resid

  def test_tile_padding(self):
    """n not a multiple of the tile; padded slots must not leak out."""
    rng = np.random.RandomState(1)
    n, m = 5, 16  # tile_for(16) == 4 -> pads 3 filler matrices
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, interpret=True)
    assert roots.shape == (n, m, m)
    assert met.error.shape == (n,)
    roots_x, _ = pth_root.batched_inverse_pth_root(stats, 4, pads)
    np.testing.assert_allclose(roots, roots_x, rtol=1e-3, atol=1e-5)

  def test_tile_k_override_matches_default(self):
    """tile_k is a perf knob only: results identical across tile sizes."""
    rng = np.random.RandomState(5)
    n, m = 6, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    base, _ = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, interpret=True)
    for k in (2, 3, 16):
      alt, _ = newton_root.batched_inverse_pth_root_pallas(
          stats, 4, pads, interpret=True, tile_k=k)
      np.testing.assert_allclose(alt, base, rtol=1e-5, atol=1e-7)

  def test_padding_masks(self):
    """Mixed valid sizes, including a pure-padding member."""
    rng = np.random.RandomState(2)
    n, m = 8, 16
    stats = np.array(_psd_batch(rng, n, m))
    sizes = [16, 12, 8, 0, 16, 4, 16, 16]
    for i, d in enumerate(sizes):
      stats[i, d:, :] = 0.0
      stats[i, :, d:] = 0.0
    stats = jnp.asarray(stats)
    pads = jnp.asarray(sizes, jnp.int32)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, interpret=True)
    roots_x, _ = pth_root.batched_inverse_pth_root(stats, 4, pads)
    np.testing.assert_allclose(roots, roots_x, rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(roots[3]), 0.0)
    assert float(met.error[3]) == 0.0

  def test_warm_start_parity_and_fewer_iters(self):
    rng = np.random.RandomState(3)
    n, m = 8, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    cold, met_cold = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, interpret=True)
    drifted = 0.999 * stats + 0.001 * _psd_batch(
        np.random.RandomState(4), n, m)
    warm, met_warm = newton_root.batched_inverse_pth_root_pallas(
        drifted, 4, pads, prevs=cold, interpret=True)
    ref, met_ref = pth_root.batched_inverse_pth_root(drifted, 4, pads)
    np.testing.assert_allclose(warm, ref, rtol=1e-3, atol=1e-4)
    assert float(jnp.max(met_warm.iterations)) < float(
        jnp.max(met_ref.iterations))
    assert float(jnp.max(met_warm.error)) < 1e-4

  def test_garbage_prev_falls_back_to_cold(self):
    """The warm certificate must reject a nonsense prev per matrix."""
    rng = np.random.RandomState(5)
    n, m = 4, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    garbage = jnp.asarray(rng.randn(n, m, m).astype(np.float32) * 100.0)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, prevs=garbage, interpret=True)
    ref, _ = pth_root.batched_inverse_pth_root(stats, 4, pads)
    np.testing.assert_allclose(roots, ref, rtol=1e-3, atol=1e-5)
    assert float(jnp.max(met.error)) < 1e-4

  def test_odd_exponent_warm_is_cold(self):
    """Odd p cannot form C = prev^{p/2}; prevs must be ignored."""
    rng = np.random.RandomState(6)
    n, m = 4, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    prev = jnp.broadcast_to(jnp.eye(m), (n, m, m))
    with_prev, _ = newton_root.batched_inverse_pth_root_pallas(
        stats, 3, pads, prevs=prev, interpret=True)
    without, _ = newton_root.batched_inverse_pth_root_pallas(
        stats, 3, pads, interpret=True)
    np.testing.assert_array_equal(np.asarray(with_prev), np.asarray(without))

  def test_retry_ladder_ill_conditioned(self):
    """A near-singular member escalates its ridge without derailing the
    tile's healthy members."""
    rng = np.random.RandomState(7)
    n, m = 8, 16
    stats = np.array(_psd_batch(rng, n, m, ridge=0.05))
    # member 0: condition number ~1e12 via a tiny spectrum tail
    q, _ = np.linalg.qr(rng.randn(m, m))
    eigs = np.logspace(0, -12, m)
    stats[0] = (q * eigs).dot(q.T).astype(np.float32)
    stats = jnp.asarray(stats)
    pads = jnp.full((n,), m, jnp.int32)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, interpret=True)
    roots_x, met_x = pth_root.batched_inverse_pth_root(stats, 4, pads)
    assert bool(jnp.all(jnp.isfinite(roots)))
    # Healthy members still match the XLA path exactly.
    np.testing.assert_allclose(roots[1:], roots_x[1:], rtol=1e-3, atol=1e-5)
    # The ill-conditioned member took the same number of ladder rounds.
    assert float(met.retries[0]) == float(met_x.retries[0])


class TestExternalMaxEv:
  """Top eigenvalues are computed OUTSIDE the kernel: supplied by the
  caller (`optim/shampoo._solve_batched`) or by the wrapper's fleet-wide
  batched XLA power iteration when omitted — the in-kernel variant was
  deleted (0.38x XLA, dead in production)."""

  @pytest.mark.parametrize("warm", [False, True])
  def test_external_maxev_parity(self, warm):
    rng = np.random.RandomState(11)
    n, m = 10, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    prevs = None
    if warm:
      prevs, _ = newton_root.batched_inverse_pth_root_pallas(
          stats, 4, pads, interpret=True)
    # The wrapper's omitted-max_evs fallback policy: loose 1% exit for
    # cold AND warm (mirrors optim/shampoo._solve_batched; the measured
    # SOLVE_GAP_PROBE decision).
    pi_tol = 1e-2
    max_evs = jax.vmap(
        lambda s, d: pth_root.power_iteration(
            s, padding_start=d, error_tolerance=pi_tol,
            relative_tolerance=True)[1])(stats, pads)
    ext, met_ext = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, prevs=prevs, max_evs=max_evs, interpret=True)
    wrapper, met_wrap = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, prevs=prevs, interpret=True)
    # The wrapper-computed eigenvalues are the same fleet-wide XLA batch
    # the caller would supply -> bit-identical roots and metrics.
    np.testing.assert_array_equal(np.asarray(ext), np.asarray(wrapper))
    np.testing.assert_array_equal(np.asarray(met_ext.max_eigenvalue),
                                  np.asarray(met_wrap.max_eigenvalue))
    assert float(jnp.max(met_ext.error)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(met_ext.max_eigenvalue), np.asarray(max_evs), rtol=1e-6)

  def test_underestimated_maxev_still_converges(self):
    """The loose-PI policy's safety contract, pinned.

    Power iteration converges to lambda_max from below, so a loose exit
    can only SHRINK the relative ridge.  Feed eigenvalues underestimated
    by 100x (far beyond the worst observed loose-exit error) and require
    the solve to still meet tolerance — the ladder escalates the ridge
    for members that need it.
    """
    rng = np.random.RandomState(13)
    n, m = 6, 16
    stats = _psd_batch(rng, n, m)
    pads = jnp.full((n,), m, jnp.int32)
    true_evs = jax.vmap(
        lambda s, d: pth_root.power_iteration(
            s, padding_start=d, error_tolerance=1e-6,
            relative_tolerance=True)[1])(stats, pads)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, max_evs=true_evs * 0.01, interpret=True)
    assert float(jnp.max(met.error)) < 1e-4
    ref, _ = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, max_evs=true_evs, interpret=True)
    # A 100x smaller ridge perturbs the root only at the ridge's own
    # scale on these well-conditioned inputs.
    np.testing.assert_allclose(roots, ref, rtol=1e-2, atol=1e-4)

  def test_external_maxev_with_mixed_padding(self):
    rng = np.random.RandomState(12)
    n, m = 6, 16
    stats = np.array(_psd_batch(rng, n, m))
    sizes = [16, 8, 0, 16, 12, 16]
    for i, d in enumerate(sizes):
      stats[i, d:, :] = 0.0
      stats[i, :, d:] = 0.0
    stats = jnp.asarray(stats)
    pads = jnp.asarray(sizes, jnp.int32)
    max_evs = jax.vmap(
        lambda s, d: pth_root.power_iteration(
            s, padding_start=d, relative_tolerance=True)[1])(stats, pads)
    roots, met = newton_root.batched_inverse_pth_root_pallas(
        stats, 4, pads, max_evs=max_evs, interpret=True)
    roots_x, _ = pth_root.batched_inverse_pth_root(stats, 4, pads)
    np.testing.assert_allclose(roots, roots_x, rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(roots[2]), 0.0)
