"""Low-rank / frequent-directions root tests (SURVEY §2 C3/C4 parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from precondition_tpu.ops import lowrank

from conftest import requires_reference


class TestPacking:

  def test_roundtrip(self):
    rng = np.random.RandomState(0)
    d, r = 8, 3
    eigvecs = jnp.asarray(rng.randn(d, r), jnp.float32)
    deflated = jnp.asarray(rng.rand(r), jnp.float32)
    inverted = jnp.asarray(rng.rand(r), jnp.float32)
    buf = lowrank.fd_pack(eigvecs, deflated, inverted, 0.5, 0.25, True, r)
    assert buf.shape == (d, r + 2)
    vecs, eigs, inv, const, tail, has_zeros = lowrank.fd_unpack(buf, r)
    np.testing.assert_array_equal(vecs, eigvecs)
    np.testing.assert_allclose(eigs, deflated, rtol=1e-6)
    np.testing.assert_allclose(inv, inverted, rtol=1e-6)
    assert float(const) == 0.5 and float(tail) == 0.25 and bool(has_zeros)

  def test_precond_dim(self):
    assert lowrank.precond_dim(0, 10) == 10
    assert lowrank.precond_dim(3, 10) == 5
    assert lowrank.precond_dim(-3, 10) == 5
    assert lowrank.precond_dim(8, 10) == 10  # no saving -> uncompressed
    assert lowrank.should_compress(3, 10)
    assert not lowrank.should_compress(8, 10)
    assert not lowrank.should_compress(0, 10)


class TestLowRankRoot:

  @pytest.mark.parametrize("p", list(range(2, 9)))
  def test_dynamic_exponent_exact(self, p):
    """Analytic oracle from `distributed_shampoo_test.py:482-500`:
    a rank-1 matrix with eigenvalue 2^p has inverse-pth-root 1/2."""
    a = np.zeros((4, 4), np.float32)
    a[0, 0] = 2.0**p
    buf, metrics = lowrank.low_rank_root(
        jnp.asarray(a), p, compression_rank=1,
        ridge_epsilon=0.0, relative_matrix_epsilon=False)
    eigvecs, inv_eigvals, const, _ = lowrank.low_rank_unpack(buf, 1)
    # Top inverse eigenvalue (of A's *smallest* eig = 0 -> inf clamped...
    # positive rank keeps the largest inverse roots; with ridge 0 the zero
    # eigenvalues map to 0, so the kept value is (2^p)^(-1/p) = 1/2 in the
    # elided-average constant or the kept slot depending on ordering.
    vals = np.concatenate([np.asarray(inv_eigvals), [float(const)]])
    assert np.any(np.abs(vals - 0.5) <= 10 * np.finfo(np.float32).eps), vals
    assert float(metrics.error) <= 1e-4

  def test_padding_zeroes(self):
    rng = np.random.RandomState(1)
    g = rng.randn(6, 6).astype(np.float32)
    mat = np.zeros((8, 8), np.float32)
    mat[:6, :6] = g @ g.T
    buf, _ = lowrank.low_rank_root(
        jnp.asarray(mat), 4, compression_rank=2, padding_start=6)
    eigvecs, _, _, _ = lowrank.low_rank_unpack(buf, 2)
    np.testing.assert_allclose(np.asarray(eigvecs)[6:], 0.0, atol=1e-5)

  @requires_reference
  def test_matches_upstream(self):
    from precondition import distributed_shampoo as ref

    rng = np.random.RandomState(2)
    g = rng.randn(8, 8).astype(np.float32)
    mat = jnp.asarray(g @ g.T)
    for rank in [2, -2]:
      ours, m_ours = lowrank.low_rank_root(
          mat, 4, compression_rank=rank, padding_start=8)
      theirs, m_theirs = ref._low_rank_root(
          mat, 4, compression_rank=rank, padding_start=8)
      np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=1e-4)


class TestFrequentDirections:

  def test_cholesky_factor(self):
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.randn(5, 7), jnp.float32)
    r = lowrank.frequent_directions_update(None, g, 0, 0, 0)
    assert r.shape == (5, 5)
    # jax's f32 QR carries ~1e-2 absolute error at this scale (numpy's
    # LAPACK path is 1e-6); the FD sketch tolerates it by construction.
    np.testing.assert_allclose(
        r @ r.T, np.asarray(g) @ np.asarray(g).T, rtol=2e-2, atol=5e-2)

  def test_fd_update_tracks_covariance(self):
    """After updates, sketch + tail ~ true decayed covariance (top-k)."""
    rng = np.random.RandomState(4)
    d, rank, decay = 8, 3, 0.99
    # Low-rank gradients so FD is nearly exact.
    base = rng.randn(d, 2)
    prev = jnp.zeros((d, rank + 2), jnp.float32)
    cov = np.zeros((d, d))
    for _ in range(3):
      g = (base @ rng.randn(2, d)).astype(np.float32)
      factor = lowrank.frequent_directions_update(None, jnp.asarray(g), 0,
                                                  0, 0)
      prev, metrics = lowrank.fd_update_root(
          factor, 4, rank, ridge_epsilon=0.0, decay=decay, padding_start=d,
          prev=prev)
      cov = decay * cov + g @ g.T
    vecs, eigs, inv, const, tail, _ = lowrank.fd_unpack(prev, rank)
    true_eigs = np.sort(np.linalg.eigvalsh(cov))[::-1]
    got = np.sort(np.asarray(eigs))[::-1]
    # Top-2 eigenvalues captured (grads are rank<=2).
    np.testing.assert_allclose(got[:2] + float(tail), true_eigs[:2],
                               rtol=2e-2)

  @requires_reference
  def test_matches_upstream(self):
    from precondition import distributed_shampoo as ref

    rng = np.random.RandomState(5)
    d, rank = 8, 3
    prev_ours = jnp.zeros((d, rank + 2), jnp.float32)
    prev_ref = jnp.zeros((d, rank + 2), jnp.float32)
    for step in range(3):
      g = jnp.asarray(rng.randn(d, d) * 0.5, jnp.float32)
      prev_ours, _ = lowrank.fd_update_root(
          g, 4, rank, decay=0.99, padding_start=d, prev=prev_ours)
      prev_ref, _ = ref._fd_update_root(
          g, 4, rank=rank, decay=0.99, padding_start=d, prev=prev_ref)
      np.testing.assert_allclose(
          np.abs(np.asarray(prev_ours)), np.abs(np.asarray(prev_ref)),
          rtol=5e-3, atol=1e-4, err_msg=f"step {step}")
