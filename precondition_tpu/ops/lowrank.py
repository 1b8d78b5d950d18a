"""Low-rank compressed and frequent-directions inverse roots.

For very large blocks, storing the full ``[d, d]`` inverse root is wasteful:
these produce a rank-``k`` + constant-tail approximation packed into a
rectangular ``[d, k+2]`` buffer (eigvecs | packed eigvals/constants).

* `low_rank_root` — eigendecompose the statistics, keep the top-k (or
  bottom-k for negative rank) inverse-root eigenpairs, average the elided
  spectrum into one constant.  Parity:
  `/root/reference/precondition/distributed_shampoo.py:1033-1120`.
* `fd_update_root` — frequent-directions update of the *preconditioner
  itself*: concatenate the decayed weighted sketch with the new gradient
  Cholesky factor, SVD, deflate by the (k+1)-th singular value, accumulate
  the escaped mass into a tail, and invert the upshifted spectrum.  Carries
  the reference's numerical guards (unit-norm eigenvector check,
  padding-mass check, zero-eigenvalue masking).  Parity: `:1123-1290`.
* `frequent_directions_update` — square Cholesky factor ``R`` with
  ``R R^T = G_(a) G_(a)^T`` from a gradient block via QR.  Parity:
  `:1473-1505`.

Packing layout (parity with `:520-592` so checkpoints are comparable)::

    buf[:, :k]    eigvecs                 buf[:k, -2]  inverted eigvals
    buf[0, -1]    tail constant (root)    buf[1, -1]   tail (raw)
    buf[-k:, -1]  deflated eigvals        buf[-1, -2]  has_zeros flag
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
from jax import lax
import jax.numpy as jnp

from precondition_tpu.ops.pth_root import (
    RootMetrics, power_iteration, root_dtype, _padding_mask)

Array = jax.Array


def precond_dim(compression_rank: int, dim: int) -> int:
  """Storage width: ``|rank|+2`` when compressing actually saves memory."""
  if not compression_rank:
    return dim
  compressed = abs(compression_rank) + 2
  return dim if compressed >= dim else compressed


def should_compress(compression_rank: int, dim) -> bool:
  return compression_rank != 0 and abs(compression_rank) + 2 < dim


def fd_pack(eigvecs, deflated_eigs, inverted_eigs, const, tail, has_zeros,
            rank: int) -> Array:
  """Pack FD/low-rank parameters into the rectangular buffer."""
  rank = abs(rank)
  d = eigvecs.shape[0]
  assert eigvecs.shape == (d, rank)
  assert precond_dim(rank, d) == rank + 2 < d
  buf = jnp.zeros((d, rank + 2), eigvecs.dtype)
  buf = buf.at[:, :rank].set(eigvecs)
  buf = buf.at[:rank, -2].set(inverted_eigs)
  buf = buf.at[0, -1].set(const)
  buf = buf.at[1, -1].set(tail)
  buf = buf.at[-rank:, -1].set(deflated_eigs)
  buf = buf.at[-1, -2].set(jnp.asarray(has_zeros).astype(buf.dtype))
  return buf


def fd_unpack(buf: Array, compression_rank: int):
  """Inverse of `fd_pack`: (eigvecs, eigvals, inv_eigvals, const, tail,
  has_zeros)."""
  r = abs(compression_rank)
  d, storage = buf.shape
  assert storage == r + 2 < d, (buf.shape, r)
  return (buf[:, :r], buf[-r:, -1], buf[:r, -2], buf[0, -1], buf[1, -1],
          buf[-1, -2].astype(bool))


def low_rank_pack(eigvecs, eigvals, const, compression_rank: int) -> Array:
  return fd_pack(eigvecs, jnp.zeros_like(eigvals), eigvals, const, 0.0,
                 False, compression_rank)


def low_rank_unpack(buf: Array, compression_rank: int):
  """(eigvecs, inverted_eigvals, const, has_zeros)."""
  eigvecs, _, inv, const, _, has_zeros = fd_unpack(buf, compression_rank)
  return eigvecs, inv, const, has_zeros


def frequent_directions_update(old_stats_factor, g, axis, w1, w2) -> Array:
  """Square Cholesky factor ``R`` with ``R R^T = G_(a) G_(a)^T``.

  The previous factor and weights are deliberately ignored: FD accumulates
  history inside the preconditioner sketch, not the statistics.
  """
  del old_stats_factor, w1, w2
  x = jnp.reshape(jnp.moveaxis(g, axis, 0), (g.shape[axis], -1))
  r = jnp.linalg.qr(x.T, mode="r").T
  return jnp.pad(r, ((0, 0), (0, x.shape[0] - r.shape[1])))


def low_rank_root(
    matrix: Array,
    p: Union[int, Array],
    compression_rank: int,
    ridge_epsilon: float = 1e-6,
    error_tolerance: float = 1e-6,
    relative_matrix_epsilon: bool = True,
    padding_start: Union[int, Array, None] = None,
    prev: Optional[Array] = None,
) -> Tuple[Array, RootMetrics]:
  """Rank-``k`` + constant-tail approximation of ``(A + eps I)^{-1/p}``.

  Positive rank keeps the *largest* inverse-root eigenvalues (smallest of
  A — the directions Shampoo shrinks least); negative rank keeps the
  smallest.  The elided spectrum's inverse roots are averaged into the
  ``const`` entry applied on the orthogonal complement.
  """
  del prev
  assert compression_rank != 0
  n = matrix.shape[0]
  assert n > abs(compression_rank) + 2
  orig_dtype = matrix.dtype
  work = root_dtype()
  matrix = matrix.astype(work)
  alpha = jnp.asarray(-1.0 / p, work)
  identity = jnp.eye(n, dtype=work)
  ix = None
  if padding_start is not None:
    ix = _padding_mask(n, padding_start, matrix.dtype)
    matrix = matrix * ix[None, :] * ix[:, None]
    identity = identity * ix
  if relative_matrix_epsilon:
    _, max_ev = power_iteration(
        matrix, num_iters=100, error_tolerance=error_tolerance,
        precision=lax.Precision.HIGHEST, padding_start=padding_start)
  else:
    max_ev = jnp.asarray(1.0, work)
  ridge = ridge_epsilon * jnp.maximum(max_ev, error_tolerance)
  regularized = matrix + ridge * identity
  e, u = jnp.linalg.eigh(regularized)
  if ix is not None:
    # Ascending order: padding zeros sort first.
    e = e * jnp.flip(ix)
  recovered = u.T @ (regularized @ u)
  eig_err = recovered - jnp.diag(e)
  if ix is not None:
    eig_err = eig_err * jnp.flip(ix)
  error = jnp.max(jnp.abs(eig_err)).astype(jnp.float32)
  inv_e = jnp.where(e == 0.0, 0.0, jnp.power(jnp.maximum(e, ridge), alpha))

  d = n
  pad = padding_start if padding_start is not None else d
  if compression_rank < 0:
    # Keep the small-eigenvalue end: rotate the padding zeros to the back.
    inv_e = jnp.roll(inv_e, -(d - pad))
    u = jnp.roll(u, -(d - pad), axis=1)
  else:
    # Keep the top of the inverse spectrum (A's smallest eigenvalues).
    inv_e = jnp.flip(inv_e)
    u = jnp.flip(u, axis=1)
  k = abs(compression_rank)
  keep_e = inv_e[:k]
  elided = inv_e[k:]
  real_elided = pad - k
  const = jnp.sum(elided) / jnp.where(real_elided > 0, real_elided, 1.0)
  val = low_rank_pack(u[:, :k], keep_e, const, compression_rank)

  if padding_start is not None:
    val = jnp.where(padding_start == 0, 0.0, val)
    error = jnp.where(padding_start == 0, 0.0, error)
  metrics = RootMetrics(error=jnp.asarray(error, jnp.float32),
                        max_eigenvalue=jnp.asarray(max_ev, jnp.float32))
  return val.astype(orig_dtype), metrics


def fd_update_root(
    new_grad: Array,
    p: Union[int, Array],
    rank: int,
    ridge_epsilon: float = 1e-6,
    error_tolerance: float = 1e-6,
    relative_matrix_epsilon: bool = True,
    decay: float = 1.0,
    padding_start: Union[int, Array, None] = None,
    prev: Optional[Array] = None,
    generate_fd_metrics: bool = False,
) -> Tuple[Array, RootMetrics]:
  """One frequent-directions step of the packed preconditioner.

  ``new_grad`` is the (zero-padded) Cholesky factor of the new gradient's
  Gram matrix; ``prev`` the previous packed ``[d, rank+2]`` buffer.

  ``generate_fd_metrics`` attaches the 20-field sketch health report
  (`utils.diagnostics.FDDiagnostics`; parity:
  `distributed_shampoo.py:1206-1280`) to the returned metrics.
  """
  assert prev is not None
  assert rank > 0
  d = new_grad.shape[0]
  assert new_grad.shape == (d, d)
  pd = precond_dim(rank, d)
  assert prev.shape == (d, pd) and rank + 2 == pd < d

  sketch, fwd_eigvals, _, _, tail, _ = fd_unpack(prev, rank)
  if relative_matrix_epsilon:
    max_ev = fwd_eigvals[0]
  else:
    max_ev = 1.0
  ridge = ridge_epsilon * jnp.maximum(max_ev, error_tolerance)

  if padding_start is None:
    padding_start = d
  active_d = padding_start > jnp.arange(d)
  active_r = padding_start > jnp.arange(rank)

  # SVD ignores padding; re-zero aggressively so error cannot compound.
  sketch = sketch * active_d[:, None] * active_r
  fwd_eigvals = (fwd_eigvals + ridge) * active_r
  weighted = sketch * jnp.sqrt(fwd_eigvals)
  grad = new_grad * active_d * active_d[:, None]

  # [decayed sketch ; grad factor]: its Gram is decay*SS^T + GG^T.
  updated = jnp.concatenate([jnp.sqrt(decay) * weighted, grad], axis=1)
  u, s, vt = jnp.linalg.svd(updated, full_matrices=False)
  cutoff = s[rank]
  rho = cutoff**2
  top = s[:rank]
  deflated = (top - cutoff) * (top + cutoff)
  eigvecs = u[:, :rank]
  tail = tail * decay
  new_tail = tail + rho

  alpha = jnp.asarray(-1.0 / p)
  new_const = jnp.where(new_tail <= 0, 0.0, new_tail**alpha)
  new_tail = jnp.where(new_tail <= 0, 0.0, new_tail)
  num_neg_eigs = jnp.sum(deflated < 0)
  num_zero_initial_eigs = jnp.sum(deflated == 0.0)
  deflated = jnp.where(deflated <= 0, 0.0, deflated)
  eigvecs = eigvecs * (deflated > 0)

  # Guard 1: SVD occasionally returns wildly non-unit vectors; drop them.
  norms = jnp.linalg.norm(eigvecs, axis=0)
  safe = (0.99 <= norms) & (norms <= 1.01)
  eigvecs = eigvecs * safe / jnp.where(safe, norms, 1.0)
  deflated = deflated * safe
  num_unsafe_norms = jnp.sum(~safe) - (num_neg_eigs + num_zero_initial_eigs)

  # Guard 2: drop directions leaking into the padding subspace.
  pad_mass = jnp.linalg.norm(
      eigvecs * (jnp.arange(d) >= padding_start)[:, None], axis=0, ord=1)
  leaked = pad_mass > 0.01
  eigvecs = eigvecs * (1 - leaked)
  deflated = deflated * (1 - leaked)

  upshifted = jnp.square(top) + tail
  upshifted = jnp.where(deflated > 0, upshifted, 0.0)
  inverted = jnp.where(upshifted <= 0, 0.0, upshifted**alpha)
  has_zeros = jnp.any(deflated <= 0) | jnp.any(new_tail <= 0)
  val = fd_pack(eigvecs, deflated, inverted, new_const, new_tail, has_zeros,
                rank)
  if padding_start is not None:
    val = jnp.where(padding_start == 0, 0.0, val)
  metrics = RootMetrics(error=jnp.zeros([], jnp.float32),
                        max_eigenvalue=jnp.asarray(max_ev, jnp.float32))
  if generate_fd_metrics:
    from precondition_tpu.utils.diagnostics import FDDiagnostics

    # Top-k fit quality, measured against the rank-k SVD reconstruction
    # of the updated sketch (not the recovered singular values, whose
    # relative error blows up near zero).
    recovered = jnp.matmul(u[:, :rank] * s[None, :rank], vt[:rank, :],
                           precision=lax.Precision.HIGHEST)
    diff = recovered - updated
    frob = jnp.square(diff).sum()
    entrywise = jnp.abs(diff).sum() / (
        padding_start**2 + padding_start * rank)
    expected_frob = jnp.square(s[rank:]).sum()
    total_frob = jnp.square(updated).sum()
    metrics = metrics.replace(fd=FDDiagnostics.create(
        rho, new_tail, deflated, grad, eigvecs, padding_start, d,
        num_neg_eigs, num_zero_initial_eigs, num_unsafe_norms,
        jnp.sum(leaked), frob, expected_frob, entrywise, total_frob))
  return val, metrics


def apply_low_rank_preconditioner(g, preconditioner, compression_rank,
                                  roll_to_end: bool = True):
  """Apply a packed ``[d, k+2]`` preconditioner to axis 0 of ``g``.

  Returns ``g`` with axis 0 moved to the end (matching the tensordot-cycle
  convention in `Preconditioner.preconditioned_grad`).
  """
  eigvecs, inv_eigvals, const, skip = low_rank_unpack(
      preconditioner, abs(compression_rank))
  rank = g.ndim
  basis = jnp.tensordot(g, eigvecs, axes=[[0], [0]])
  lowrank = jnp.tensordot(basis, eigvecs, axes=[[rank - 1], [1]])
  rolled = jnp.moveaxis(g, 0, -1)
  complement = rolled - lowrank
  scaled = jnp.tensordot(basis * inv_eigvals, eigvecs,
                         axes=[[rank - 1], [1]])
  new_g = const * complement + scaled
  return jnp.where(skip, rolled, new_g)
