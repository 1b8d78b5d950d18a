"""Fused batched inverse-pth-root Pallas kernel.

One grid step solves one ``[m, m]`` matrix entirely in VMEM: power
iteration for the relative ridge, the coupled-Newton loop, and the ridge
retry ladder all run on-chip with zero HBM traffic between iterations.

Why this beats the XLA/vmap path (`precondition_tpu.ops.pth_root`):

* **Per-matrix early exit.**  A vmapped `lax.while_loop` iterates until the
  *slowest* matrix in the batch converges and a single matrix entering the
  retry ladder re-runs the whole batch.  Here each matrix runs exactly its
  own iteration count.
* **VMEM residency.**  XLA's while_loop carries the ``[N, m, m]`` state
  through HBM every iteration (~2 x 46 MB per iteration for the bench
  batch); the kernel touches HBM once for the input and once for the root.
* The grid is pipelined by Pallas's automatic double-buffered DMA, so the
  next matrix loads while the current one solves.

Semantics match `matrix_inverse_pth_root` (ridge retry x10 up to 6 tries,
error-ratio divergence exit, padding masks, dynamic exponents).  The only
intentional difference: the power-iteration start vector is a deterministic
on-chip hash sequence instead of a host PRNG draw (both are valid; results
agree to the solver tolerance, which the tests assert).

VMEM budget: ~8 [m, m] f32 buffers -> m <= 512 fits in 16 MB.  Use
`supported(m)` to gate and fall back to the jnp path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from precondition_tpu.ops.pth_root import RootMetrics

Array = jax.Array


def supported(m: int) -> bool:
  """Whether the fused kernel handles this matrix size."""
  return 8 <= m <= 512 and m % 8 == 0


def _mm(a, b):
  return lax.dot_general(
      a, b, (((1,), (0,)), ((), ())),
      precision=lax.Precision.HIGHEST,
      preferred_element_type=jnp.float32)


def _mat_power(mat, p, m):
  """mat**p by square-and-multiply; p is a traced int32 scalar."""
  eye_m = _masked_eye_full(m)

  def cond(state):
    return state[0] > 0

  def body(state):
    i, acc, sq = state
    acc = lax.cond(i % 2 == 1, lambda: _mm(sq, acc), lambda: acc)
    return i // 2, acc, _mm(sq, sq)

  _, out, _ = lax.while_loop(cond, body, (p, eye_m, mat))
  return out


def _masked_eye_full(m):
  rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
  cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
  return jnp.where(rows == cols, 1.0, 0.0).astype(jnp.float32)


def _masked_eye(m, pad):
  rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
  cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
  return jnp.where((rows == cols) & (rows < pad), 1.0, 0.0).astype(
      jnp.float32)


def _hash_vector(m):
  """Deterministic pseudo-random start vector in [-0.5, 0.5)."""
  idx = lax.broadcasted_iota(jnp.uint32, (m, 1), 0)
  h = (idx * jnp.uint32(2654435761)) ^ jnp.uint32(0x9E3779B9)
  h = (h >> jnp.uint32(9)) | jnp.uint32(0x3F800000)  # [1, 2) as float bits
  return (lax.bitcast_convert_type(h, jnp.float32) - 1.5)


def _power_iteration(mat, pad, m, num_iters=100, tol=1e-6):
  """Top eigenvalue via matvec power iteration, padding-aware."""
  row = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
  mask = (row < pad).astype(jnp.float32)
  v0 = _hash_vector(m) * mask

  def cond(state):
    i, _, _, run = state
    return jnp.logical_and(i < num_iters, run)

  def body(state):
    i, v, ev, _ = state
    v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30)
    mv = _mm(mat, v)
    ev_new = jnp.sum(v * mv)
    return i + 1, mv, ev_new, jnp.abs(ev_new - ev) > tol

  _, _, ev, _ = lax.while_loop(
      cond, body, (0, v0, jnp.float32(0.0), True))
  return ev


def _newton_solve(mat, p, pad, m, *, num_iters, ridge_epsilon,
                  error_tolerance, relative_matrix_epsilon,
                  retry_threshold, num_tries, max_error_ratio):
  """Full solve for one matrix; returns (root, error, iters, retries)."""
  eye = _masked_eye(m, pad)
  rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
  cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
  valid = ((rows < pad) & (cols < pad)).astype(jnp.float32)
  mat = mat * valid

  if relative_matrix_epsilon:
    max_ev = _power_iteration(mat, pad, m)
  else:
    max_ev = jnp.float32(1.0)
  ridge = ridge_epsilon * jnp.maximum(max_ev, 1e-25)
  alpha = -1.0 / p.astype(jnp.float32)

  def newton_cond(state):
    i, _, _, _, error, ratio = state
    keep = jnp.logical_and(error > error_tolerance, ratio < max_error_ratio)
    return jnp.logical_and(i < num_iters, keep)

  def newton_body(state):
    i, mat_m, mat_h, _, error, _ = state
    mat_t = (1.0 - alpha) * eye + alpha * mat_m
    new_m = _mm(_mat_power(mat_t, p, m), mat_m)
    new_h = _mm(mat_h, mat_t)
    new_error = jnp.max(jnp.abs(new_m - eye))
    return i + 1, new_m, new_h, mat_h, new_error, new_error / error

  def retry_cond(state):
    i, _, _, _, failed = state
    return jnp.logical_and(failed, i < num_tries)

  def retry_body(state):
    i, _, _, _, _ = state
    # Mosaic has no scalar powf; express powers via exp/log.
    ridge_scale = jnp.exp(i.astype(jnp.float32) * jnp.float32(2.302585093))
    damped = mat + ridge * ridge_scale * eye
    z = (1.0 + p.astype(jnp.float32)) / (
        2.0 * jnp.sqrt(jnp.sum(damped * damped)))
    z_root = jnp.exp(jnp.log(z) / p.astype(jnp.float32))
    m0 = damped * z
    h0 = eye * z_root
    err0 = jnp.max(jnp.abs(m0 - eye))
    iters, mat_m, mat_h, old_h, error, ratio = lax.while_loop(
        newton_cond, newton_body,
        (0, m0, h0, h0, err0, jnp.float32(1.0)))
    error = jnp.max(jnp.abs(mat_m - eye))
    converged = (ratio < max_error_ratio).astype(jnp.float32)
    root = converged * mat_h + (1.0 - converged) * old_h
    return (i + 1, root, error, iters, error > retry_threshold)

  retries, root, error, iters, _ = lax.while_loop(
      retry_cond, retry_body,
      (0, eye, jnp.float32(1000.0), 100, True))

  # Pure-padding matrices produce zeros, not garbage.
  is_padding = (pad == 0)
  root = jnp.where(is_padding, 0.0, root * valid)
  error = jnp.where(is_padding, 0.0, error)
  return root, error, iters, retries


def _kernel(exps_ref, pads_ref, stats_ref, roots_ref, err_ref, iters_ref,
            retries_ref, maxev_ref, *, m, num_iters, ridge_epsilon,
            error_tolerance, relative_matrix_epsilon, retry_threshold,
            num_tries, max_error_ratio):
  i = pl.program_id(0)
  p = exps_ref[i]
  pad = pads_ref[i]
  mat = stats_ref[0]
  if relative_matrix_epsilon:
    maxev = _power_iteration(mat, pad, m)
  else:
    maxev = jnp.float32(1.0)
  root, error, iters, retries = _newton_solve(
      mat, p, pad, m,
      num_iters=num_iters, ridge_epsilon=ridge_epsilon,
      error_tolerance=error_tolerance,
      relative_matrix_epsilon=relative_matrix_epsilon,
      retry_threshold=retry_threshold, num_tries=num_tries,
      max_error_ratio=max_error_ratio)
  roots_ref[0] = root
  err_ref[i] = error
  iters_ref[i] = iters.astype(jnp.float32)
  retries_ref[i] = retries.astype(jnp.float32)
  maxev_ref[i] = maxev


def batched_inverse_pth_root_pallas(
    stats: Array,
    exponents: Array,
    padding_starts: Array = None,
    *,
    num_iters: int = 100,
    ridge_epsilon: float = 1e-6,
    error_tolerance: float = 1e-6,
    relative_matrix_epsilon: bool = True,
    retry_loop_error_threshold: float = 0.05,
    num_tries: int = 6,
    max_error_ratio: float = 1.2,
) -> Tuple[Array, RootMetrics]:
  """Drop-in fused replacement for `pth_root.batched_inverse_pth_root`.

  Args:
    stats: ``[N, m, m]`` PSD batch (f32).
    exponents: ``[N]`` int32 root exponents per matrix.
    padding_starts: ``[N]`` int32 valid sizes (defaults to m).

  Returns:
    ``(roots [N, m, m], RootMetrics with [N] leaves)``.
  """
  n, m, m2 = stats.shape
  assert m == m2, stats.shape
  assert supported(m), f"matrix size {m} unsupported by the pallas kernel"
  if padding_starts is None:
    padding_starts = jnp.full((n,), m, jnp.int32)

  kernel = functools.partial(
      _kernel, m=m, num_iters=num_iters, ridge_epsilon=ridge_epsilon,
      error_tolerance=error_tolerance,
      relative_matrix_epsilon=relative_matrix_epsilon,
      retry_threshold=retry_loop_error_threshold, num_tries=num_tries,
      max_error_ratio=max_error_ratio)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(n,),
      in_specs=[
          pl.BlockSpec((1, m, m), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, m, m), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          # Scalar outputs live whole in SMEM, indexed by program_id.
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
  )

  flops_per = 5 * 2 * m * m * m * 40  # ~5 matmuls x ~40 iterations
  roots, errors, iters, retries, maxevs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((n, m, m), jnp.float32),
          jax.ShapeDtypeStruct((n,), jnp.float32),
          jax.ShapeDtypeStruct((n,), jnp.float32),
          jax.ShapeDtypeStruct((n,), jnp.float32),
          jax.ShapeDtypeStruct((n,), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops_per * n,
          bytes_accessed=2 * n * m * m * 4,
          transcendentals=0),
  )(exponents.astype(jnp.int32), padding_starts.astype(jnp.int32),
    stats.astype(jnp.float32))

  metrics = RootMetrics(
      error=errors,
      iterations=iters,
      error_ratio=jnp.zeros_like(errors),
      max_eigenvalue=maxevs,
      retries=retries)
  return roots, metrics
