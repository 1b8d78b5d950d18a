"""Matrix inverse p-th root numerics for TPU.

Computes ``(A + eps*I)^{-1/p}`` for symmetric PSD ``A`` — the kernel at the
heart of Shampoo-style preconditioning.  Two algorithms:

* **Coupled Newton iteration** (Higham, *Functions of Matrices*, eq. 7.18):
  all-matmul inner loop, maps straight onto the TPU MXU.  Includes the
  production guard rails of the reference implementation
  (`/root/reference/precondition/distributed_shampoo.py:702-940`): a ridge
  retry ladder (eps x10 per retry, up to 6 tries), an error-ratio divergence
  exit (keep the previous iterate if error grew >1.2x), relative epsilon
  scaling by the top eigenvalue, and padding masks so stacked/padded
  statistics batches stay exact.
* **eigh path** (`distributed_shampoo.py:943-1030` behavioural parity):
  symmetric eigendecomposition, eigenvalues clamped at the ridge, root
  formed as ``(U sqrt(e^{-1/p})) @ (U sqrt(e^{-1/p}))^T`` so it is exactly
  symmetric.

TPU-first design notes (differences from the reference, which is f64 CPU-style
code vmapped one matrix at a time):

* The iteration dtype defaults to float32 on TPU (no native f64) and float64
  when ``jax_enable_x64`` is on.  The eigh path is the accuracy fallback at
  high condition numbers, exactly as the reference tolerates Newton failures
  above cond 1e6.
* Everything is expressed with `lax.while_loop` + fixed-shape matmuls at
  ``Precision.HIGHEST`` so a `vmap` over a stacked ``[B, n, n]`` statistics
  batch compiles to one fused MXU program.
* `mat_power` takes a *traced* exponent (blocks of different tensor ranks are
  batched together), implemented as square-and-multiply.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array
_EPSILON = 1e-25

# Default Newton chunk size when `newton_unroll` is not passed explicitly.
# Chunking amortises the vmapped-while select/copy overhead but multiplies
# compute for fast-converging solves: measured 37->28 ms on a slow-converging
# random batch (20 iters) but 70->121 ms on the bench fixture's
# near-converged statistics (2-6 iters). Production statistics are the
# latter, so the default stays 1; raise explicitly for cold-start batches.
DEFAULT_NEWTON_UNROLL = 1


def root_dtype() -> jnp.dtype:
  """Iteration dtype: f64 when x64 is enabled (CPU tests), else f32 (TPU)."""
  return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@struct.dataclass
class RootMetrics:
  """Diagnostics for one inverse-pth-root solve.

  Mirrors the reference's ``TrainingMetrics`` root fields
  (`distributed_shampoo.py:338-363`) so trainers can scrape them to
  TensorBoard: max entrywise error of ``M_k - I``, iteration count, final
  error ratio, derived max eigenvalue, and how many ridge retries ran.
  """

  error: Array = struct.field(default_factory=lambda: jnp.zeros([], jnp.float32))
  iterations: Array = struct.field(default_factory=lambda: jnp.zeros([], jnp.float32))
  error_ratio: Array = struct.field(default_factory=lambda: jnp.zeros([], jnp.float32))
  max_eigenvalue: Array = struct.field(default_factory=lambda: jnp.zeros([], jnp.float32))
  retries: Array = struct.field(default_factory=lambda: jnp.zeros([], jnp.float32))


def _padding_mask(n: int, padding_start, dtype) -> Array:
  """1-D mask: 1 for rows < padding_start, 0 after."""
  return (jnp.arange(n, dtype=jnp.int32) < padding_start).astype(dtype)


def power_iteration(
    matrix: Array,
    num_iters: int = 100,
    error_tolerance: float = 1e-6,
    precision: lax.Precision = lax.Precision.HIGHEST,
    padding_start: Union[int, Array, None] = None,
    key: Optional[Array] = None,
    relative_tolerance: bool = False,
) -> Tuple[Array, Array]:
  """Top eigenpair of a symmetric PSD matrix by power iteration.

  Behavioural parity with `distributed_shampoo.py:595-652`: deterministic
  start vector (fixed seed so results are reproducible run-to-run), exits
  when the Rayleigh quotient moves less than ``error_tolerance``, and zeroes
  the start vector beyond ``padding_start`` so padded rows never contaminate
  the estimate.

  Returns:
    ``(eigenvector [n], eigenvalue [])``.
  """
  n = matrix.shape[-1]
  # Deterministic start vector. The reference uses a host-side RandomState;
  # we use jax's own PRNG (traceable, device-resident) with a fixed key.
  if key is None:
    key = jax.random.PRNGKey(1729)
  v0 = jax.random.uniform(key, (n,), matrix.dtype, -1.0, 1.0)
  if padding_start is not None:
    v0 = v0 * _padding_mask(n, padding_start, matrix.dtype)

  def cond(state):
    i, _, _, run = state
    return jnp.logical_and(i < num_iters, run)

  def body(state):
    i, v, ev, _ = state
    v = v / jnp.maximum(jnp.linalg.norm(v), _EPSILON)
    mv = jnp.einsum("ij,j->i", matrix, v, precision=precision)
    ev_new = jnp.einsum("i,i->", v, mv, precision=precision)
    if relative_tolerance:
      # The eigenvalue only scales the relative ridge; an absolute 1e-6
      # tolerance over-iterates (each matvec re-reads the matrix from HBM).
      not_done = jnp.abs(ev_new - ev) > error_tolerance * jnp.maximum(
          jnp.abs(ev_new), 1.0)
    else:
      not_done = jnp.abs(ev_new - ev) > error_tolerance
    return (i + 1, mv, ev_new, not_done)

  _, v, ev, _ = lax.while_loop(
      cond, body, (0, v0, jnp.zeros([], matrix.dtype), True)
  )
  v = v / jnp.maximum(jnp.linalg.norm(v), _EPSILON)
  return v, ev


def mat_power(
    m: Array,
    p: Union[int, Array],
    precision: lax.Precision = lax.Precision.HIGHEST,
) -> Array:
  """``m**p`` by square-and-multiply; ``p`` may be static or traced.

  Parity: `distributed_shampoo.py:655-678`.  When ``p`` is a python int the
  exponentiation unrolls to pure matmuls — crucial on TPU, where a traced-p
  while_loop under vmap costs several full-batch select/copy passes per
  Newton iteration (measured ~10x the matmul cost).  The optimizer layers
  bucket statistics by exponent so the static path is the hot one.
  """
  if isinstance(p, int):
    if p <= 0:
      return jnp.eye(m.shape[-1], dtype=m.dtype)
    result = None
    square = m
    bits = p
    while bits:
      if bits & 1:
        result = square if result is None else jnp.matmul(
            result, square, precision=precision)
      bits >>= 1
      if bits:
        square = jnp.matmul(square, square, precision=precision)
    return result

  out = jnp.eye(m.shape[-1], dtype=m.dtype)

  def cond(state):
    i, _, _ = state
    return i > 0

  def body(state):
    i, acc, sq = state
    acc = lax.cond(
        i % 2 == 1,
        lambda: jnp.matmul(sq, acc, precision=precision),
        lambda: acc,
    )
    return i // 2, acc, jnp.matmul(sq, sq, precision=precision)

  _, out, _ = lax.while_loop(cond, body, (jnp.asarray(p, jnp.int32), out, m))
  return out


def pth_root_difference(
    w: Array, alpha: Array, beta: Array, p: Union[int, Array]
) -> Array:
  """Numerically stable ``(w+alpha)^{-1/p} - (w+beta)^{-1/p}``.

  Naive subtraction cancels catastrophically when ``alpha ~ beta``; instead
  factor out the larger term and use ``expm1/log1p`` (parity:
  `distributed_shampoo.py:681-699`). Used to re-deflate LOBPCG eigenvectors
  after the Newton solve.
  """
  a = w + alpha
  b = w + beta
  d = alpha - beta
  exp = -1.0 / p

  def stable(base, diff):
    # base^exp * ((1 + diff/base)^exp - 1), all in log-space.
    return (base**exp) * jnp.expm1(exp * jnp.log1p(diff / base))

  # Pick whichever branch has the smaller log1p argument.
  return jnp.where(jnp.abs(d / b) < jnp.abs(d / a), -stable(a, -d), stable(b, d))


def _mask_matrix(matrix: Array, identity: Array, padding_start):
  """Zero rows/cols >= padding_start of both the matrix and the identity."""
  n = matrix.shape[-1]
  ix = _padding_mask(n, padding_start, matrix.dtype)
  matrix = matrix * ix[None, :] * ix[:, None]
  identity = identity * ix
  return matrix, identity


def matrix_inverse_pth_root(
    matrix: Array,
    p: Union[int, Array],
    num_iters: int = 100,
    ridge_epsilon: float = 1e-6,
    error_tolerance: float = 1e-6,
    precision: lax.Precision = lax.Precision.HIGHEST,
    relative_matrix_epsilon: bool = True,
    lobpcg_topk_precondition: int = 0,
    lobpcg_max_iter: int = 0,
    padding_start: Union[int, Array, None] = None,
    prev: Optional[Array] = None,
    eigh: bool = False,
    retry_loop_error_threshold: float = 0.05,
    num_tries: int = 6,
    max_error_ratio: float = 1.2,
    newton_unroll: Optional[int] = None,
) -> Tuple[Array, RootMetrics]:
  """``(matrix + eps I)^{-1/p}`` via coupled Newton with production guards.

  Behavioural parity with `distributed_shampoo.py:702-940`:

  * ``relative_matrix_epsilon``: scale the ridge by the top eigenvalue
    (power iteration, or LOBPCG's output when deflation is on).
  * Retry ladder: if the converged error exceeds
    ``retry_loop_error_threshold``, multiply the ridge by 10 and re-solve,
    up to ``num_tries`` times.
  * Divergence guard: inside the Newton loop, exit when the error grows by
    more than ``max_error_ratio`` between iterations and return the
    *previous* iterate.
  * ``padding_start``: rows/cols at and beyond it are zeroed in the input,
    excluded from convergence checks, and exactly zero in the output; a
    pure-padding matrix (``padding_start == 0``) returns all zeros.
  * ``lobpcg_topk_precondition``: deflate the top-k eigenpairs before the
    Newton solve (cuts the condition number), then re-deflate the root with
    the stable `pth_root_difference`.

  Args mirror the reference's public signature so downstream layers can be
  configured identically. ``prev`` (warm start) is accepted for API parity.

  Returns:
    ``(root, RootMetrics)``; root in ``matrix.dtype``.
  """
  if eigh:
    return matrix_inverse_pth_root_eigh(
        matrix, p, ridge_epsilon, error_tolerance, precision,
        relative_matrix_epsilon, padding_start, prev,
    )
  del prev

  assert matrix.shape[-1] == matrix.shape[-2]
  n = matrix.shape[-1]
  orig_dtype = matrix.dtype
  work = root_dtype()
  matrix = matrix.astype(work)
  alpha = jnp.asarray(-1.0 / p, work)
  identity = jnp.eye(n, dtype=work)

  if padding_start is not None:
    matrix, identity = _mask_matrix(matrix, identity, padding_start)

  original_matrix = matrix

  eigvals = eigvecs = None
  if lobpcg_topk_precondition > 0:
    from jax.experimental.sparse import linalg as sparse_linalg

    k = lobpcg_topk_precondition
    search = jnp.concatenate(
        [jnp.eye(k, dtype=matrix.dtype),
         jnp.zeros((n - k, k), dtype=matrix.dtype)], axis=0)
    eigvals, eigvecs, _ = sparse_linalg.lobpcg_standard(
        matrix, search, lobpcg_max_iter if lobpcg_max_iter else k)
    # Deflate so the smallest of the top-k becomes the new spectral radius.
    deflation = eigvals - jnp.min(eigvals)
    scaled = eigvecs * jnp.sqrt(deflation)
    matrix = matrix - jnp.matmul(scaled, scaled.T, precision=lax.Precision.HIGHEST)

  if relative_matrix_epsilon:
    if eigvals is not None:
      max_ev = jnp.max(eigvals)
    else:
      _, max_ev = power_iteration(
          matrix, num_iters=100, error_tolerance=1e-6,
          precision=precision, padding_start=padding_start)
  else:
    max_ev = jnp.asarray(1.0, work)
  ridge = ridge_epsilon * jnp.maximum(max_ev, _EPSILON)

  # Optionally run several Newton iterations per while-loop trip (see
  # DEFAULT_NEWTON_UNROLL for the tradeoff). Convergence/divergence checks
  # happen at chunk granularity: the iteration is a stable fixed point at
  # M ~= I, so extra iterations past tolerance only polish the root, and
  # the divergence rollback returns the chunk-start iterate (conservative).
  if newton_unroll is None:
    newton_unroll = DEFAULT_NEWTON_UNROLL

  def newton_cond(state):
    i, _, _, _, error, ratio = state
    keep_going = jnp.logical_and(error > error_tolerance, ratio < max_error_ratio)
    return jnp.logical_and(i < num_iters, keep_going)

  def newton_body(state):
    i, mat_m, mat_h, _, error, _ = state
    block_start_h = mat_h
    for _ in range(newton_unroll):
      # T = (1 - alpha) I + alpha M; then M <- T^p M, H <- H T.
      mat_t = (1 - alpha) * identity + alpha * mat_m
      mat_m = jnp.matmul(mat_power(mat_t, p, precision), mat_m,
                         precision=precision)
      mat_h = jnp.matmul(mat_h, mat_t, precision=precision)
    new_error = jnp.max(jnp.abs(mat_m - identity))
    return (i + newton_unroll, mat_m, mat_h, block_start_h, new_error,
            new_error / error)

  if n == 1:
    root = (matrix + ridge) ** alpha
    error = jnp.zeros([], jnp.float32)
    iters = jnp.zeros([], jnp.float32)
    ratio = jnp.zeros([], jnp.float32)
    retries = jnp.zeros([], jnp.float32)
  else:

    def retry_cond(state):
      i, _, _, _, _, failed = state
      return jnp.logical_and(failed, i < num_tries)

    def retry_body(state):
      i, _, _, _, _, _ = state
      damped = matrix + ridge * (10.0**i) * identity
      # z scales the spectrum into the Newton basin of attraction.
      z = (1 + p) / (2 * jnp.linalg.norm(damped))
      m0 = damped * z
      h0 = identity * jnp.power(z, 1.0 / p)
      err0 = jnp.max(jnp.abs(m0 - identity))
      iters, mat_m, mat_h, old_h, error, ratio = lax.while_loop(
          newton_cond, newton_body, (0, m0, h0, h0, err0, jnp.asarray(1.0, work)))
      error = jnp.max(jnp.abs(mat_m - identity)).astype(jnp.float32)
      converged = jnp.asarray(ratio < max_error_ratio, mat_h.dtype)
      root = converged * mat_h + (1 - converged) * old_h
      return (i + 1, root, error, jnp.asarray(iters, jnp.float32),
              jnp.asarray(ratio, jnp.float32),
              error > retry_loop_error_threshold)

    init = (0, identity, jnp.asarray(1000.0, jnp.float32),
            jnp.asarray(100.0, jnp.float32), jnp.asarray(1.0, jnp.float32), True)
    retries_i, root, error, iters, ratio, _ = lax.while_loop(
        retry_cond, retry_body, init)
    retries = jnp.asarray(retries_i, jnp.float32)

  if lobpcg_topk_precondition > 0:
    # The deflated directions were solved with eigenvalue min(eigvals); put
    # back the difference between their true inverse-roots and that one.
    diff = pth_root_difference(ridge, jnp.min(eigvals), eigvals, p)
    scaled = eigvecs * jnp.sqrt(diff)
    root = root - jnp.matmul(scaled, scaled.T, precision=lax.Precision.HIGHEST)
    # Report error against the undeflated problem at the ridge the solver
    # actually used (the retry ladder may have escalated it); measuring
    # against the original ridge would flag perfectly good roots.
    # Round i used ridge * 10^i; `retries` counts completed rounds.
    effective_ridge = ridge * 10.0 ** jnp.maximum(
        jnp.asarray(retries, work) - 1.0, 0.0)
    damped = original_matrix + effective_ridge * identity
    err_mat = jnp.matmul(
        mat_power(root, p, precision), damped, precision=precision) - identity
    if padding_start is not None:
      ix = _padding_mask(n, padding_start, err_mat.dtype)
      err_mat = err_mat * ix[None, :] * ix[:, None]
    error = jnp.max(jnp.abs(err_mat)).astype(jnp.float32)

  if padding_start is not None:
    # Pure-padding inputs (hosts with unequal statistic counts) return zeros.
    root = jnp.where(padding_start == 0, 0.0, root)
    error = jnp.where(padding_start == 0, 0.0, error)

  metrics = RootMetrics(
      error=jnp.asarray(error, jnp.float32),
      iterations=jnp.asarray(iters, jnp.float32),
      error_ratio=jnp.asarray(ratio, jnp.float32),
      max_eigenvalue=jnp.asarray(max_ev, jnp.float32),
      retries=retries,
  )
  return root.astype(orig_dtype), metrics


def matrix_inverse_pth_root_eigh(
    matrix: Array,
    p: Union[int, Array],
    ridge_epsilon: float = 1e-6,
    error_tolerance: float = 1e-6,
    precision: lax.Precision = lax.Precision.HIGHEST,
    relative_matrix_epsilon: bool = True,
    padding_start: Union[int, Array, None] = None,
    prev: Optional[Array] = None,
) -> Tuple[Array, RootMetrics]:
  """``(matrix + eps I)^{-1/p}`` via symmetric eigendecomposition.

  Accuracy fallback for ill-conditioned statistics (parity:
  `distributed_shampoo.py:943-1030`). Eigenvalues are clamped at the ridge,
  exact zeros (from padding) map to zero, and the root is formed as
  ``R R^T`` with ``R = U sqrt(e^{-1/p})`` so it is symmetric by construction.
  The reported error is the max residual of ``U^T (A + eps I) U - diag(e)``.
  """
  del prev
  assert matrix.shape[-1] == matrix.shape[-2]
  n = matrix.shape[-1]
  orig_dtype = matrix.dtype
  work = root_dtype()
  matrix = matrix.astype(work)
  alpha = jnp.asarray(-1.0 / p, work)
  identity = jnp.eye(n, dtype=work)
  ix = None
  if padding_start is not None:
    ix = _padding_mask(n, padding_start, matrix.dtype)
    matrix, identity = _mask_matrix(matrix, identity, padding_start)
  if relative_matrix_epsilon:
    _, max_ev = power_iteration(
        matrix, num_iters=100, error_tolerance=error_tolerance,
        precision=precision, padding_start=padding_start)
  else:
    max_ev = jnp.asarray(1.0, work)
  ridge = ridge_epsilon * jnp.maximum(max_ev, error_tolerance)

  regularized = matrix + ridge * identity
  e, u = jnp.linalg.eigh(regularized)
  if ix is not None:
    # eigh sorts ascending: the zero (padding) eigenvalues come first.
    e = e * jnp.flip(ix)
  inv_e = jnp.where(e == 0.0, 0.0, jnp.power(jnp.maximum(e, ridge), alpha))
  sqrt_root = u * jnp.sqrt(inv_e)
  root = jnp.matmul(sqrt_root, sqrt_root.T, precision=precision)
  # Error: how well U diagonalises the regularised input.
  recovered = jnp.matmul(
      u.T, jnp.matmul(regularized, u, precision=precision), precision=precision)
  eig_err = recovered - jnp.diag(e)
  if ix is not None:
    eig_err = eig_err * jnp.flip(ix)
  error = jnp.max(jnp.abs(eig_err)).astype(jnp.float32)
  if padding_start is not None:
    root = jnp.where(padding_start == 0, 0.0, root)
    error = jnp.where(padding_start == 0, 0.0, error)
  metrics = RootMetrics(
      error=error, max_eigenvalue=jnp.asarray(max_ev, jnp.float32))
  return root.astype(orig_dtype), metrics


# Unified entry point used by the optimizer layers.
inverse_pth_root = matrix_inverse_pth_root


def batched_inverse_pth_root(
    stats: Array,
    exponents: Union[int, Array],
    padding_starts: Optional[Array] = None,
    **kwargs,
) -> Tuple[Array, RootMetrics]:
  """vmap of `matrix_inverse_pth_root` over a stacked ``[B, n, n]`` batch.

  This is the unit of work the distribution layer shards across devices:
  each device solves its slice of the batch, then the fresh preconditioners
  are all-gathered (see `precondition_tpu.parallel`).

  Pass a python-int ``exponents`` when the whole batch shares one exponent:
  the inner `mat_power` then unrolls statically, which is several times
  faster on TPU than the traced-exponent path (the optimizer buckets
  statistics by exponent to exploit this).
  """
  fn = functools.partial(matrix_inverse_pth_root, **kwargs)
  if isinstance(exponents, int):
    if padding_starts is None:
      return jax.vmap(lambda m: fn(m, exponents))(stats)
    return jax.vmap(lambda m, s: fn(m, exponents, padding_start=s))(
        stats, padding_starts)
  if padding_starts is None:
    return jax.vmap(lambda m, p: fn(m, p))(stats, exponents)
  return jax.vmap(lambda m, p, s: fn(m, p, padding_start=s))(
      stats, exponents, padding_starts)
