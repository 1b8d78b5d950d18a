"""Fused batched inverse-pth-root Pallas kernel (tiled variant).

One grid step solves a *tile* of ``k`` matrices entirely in VMEM: the
coupled-Newton loop and the ridge retry ladder run on-chip with zero
HBM traffic between iterations.

Why tiles?  The round-1 per-matrix kernel lost to XLA (0.65x): a single
``[m, m]`` matmul chain is latency-bound — each Newton iteration is ~4
*dependent* MXU ops, so the systolic array drains between them.  With
``k`` independent matrices per program the per-iteration matmuls become
batched ``[k, m, m]`` dots whose k independent chains pipeline through
the MXU back-to-back.  Convergence control stays per matrix:

* **Per-matrix early exit within the tile.**  Each matrix carries its own
  ``active`` mask; converged/diverged members freeze while the rest
  iterate, and the tile's while-loop exits when *all* k members are done.
  A vmapped XLA while_loop pays the max iteration count over the whole
  [N] batch; here only over k (=4 for the 128-block production shape —
  the measured sweet spot, see `tile_for`).
* **Per-matrix retry ladder.**  Only members whose converged error
  exceeds the retry threshold re-solve at the escalated ridge; the
  others' roots are frozen by the same masking.
* **VMEM residency.**  XLA's while_loop carries the ``[N, m, m]`` state
  through HBM every iteration (~2 x 46 MB for the bench batch); the
  kernel touches HBM once for the statistics and once for the roots.
* **Static exponent.**  The exponent is a Python int (the optimizer
  buckets statistics by exponent — `optim/shampoo.py` groups), so
  ``T^p`` unrolls to log2(p) square-and-multiply batched matmuls with no
  scalar control flow — the round-1 kernel's traced-exponent
  while_loop-per-matmul was pure overhead.
* **Warm starts** (``prevs``): the same certified transformed-problem
  formulation as `pth_root.matrix_inverse_pth_root` — round 0 attempts
  ``C (A + r I) C`` with ``C = prev^{p/2}``; a per-matrix certificate
  ``|M0 - I| <= warm_error_threshold`` gates it, failures fall through
  to the cold ladder.  Near-converged production statistics then take
  1-2 Newton iterations, exactly where per-matrix early exit pays most.

Semantics match `matrix_inverse_pth_root` (ridge retry x10 up to 6
tries, error-ratio divergence exit returning the previous iterate,
padding masks, pure-padding rows zeroed).  The relative-ridge top
eigenvalues are computed OUTSIDE the kernel — supplied by the caller or
by the wrapper's fleet-wide batched XLA power iteration; an in-kernel
variant was deleted after measuring 0.38x XLA (it serialised the
latency-bound matvecs over only the tile's k member chains).

Reference hot loop this replaces: `distributed_shampoo.py:836-848`
(Newton iteration) + `:702-940` (guards).

VMEM budget: ~12 live [k, m, m] f32 buffers; ``tile_for(m)`` picks k
(cap 4, measured — see its docstring), <= ~3 MB of state at m=128.
Use `supported(m)` to gate and fall back to the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from precondition_tpu.ops import pth_root
from precondition_tpu.ops.pth_root import RootMetrics

Array = jax.Array

_LN10 = 2.302585092994046


def supported(m: int) -> bool:
  """Whether the fused kernel handles this matrix size.

  Cap 256, measured (benchmarks/blocksize_sweep.py, KERNELS_TPU.json):
  at m=512 even the k=1 tile's ~12 live [512,512] f32 buffers plus the
  double-buffered I/O blocks overflow the ~16 MB VMEM (server compile
  fails), and at m>=512 XLA's batched while_loop already runs at 21-26
  TF/s cold (69-83%% of the measured MXU ceiling) — the problem is
  MXU-bound there, not HBM/latency-bound, so there is little left for a
  fused kernel to win.  Measured where the kernel IS admitted:
  m=128 2.6x XLA cold (19.1 TF/s), m=256 2.0x cold (28.3 TF/s, 91%% of
  ceiling) and 2.7x warm.  `solver_backend="auto"` routes by this gate.
  """
  return 8 <= m <= 256 and m % 8 == 0


def tile_for(m: int, warm: bool = False) -> int:
  """Matrices per grid step: fill the MXU pipeline within VMEM budget.

  The cap is 4 — a MEASURED choice (benchmarks/pallas_tile_breakdown.py,
  PALLAS_TILE_BREAKDOWN.json, production [712,128,128] p=4 batch):
  k=4 solves in 8.14 ms (26.1 TF/s, 84% of the 31.1 TF/s measured MXU
  ceiling) vs 8.82 ms at the former k=8 — four independent chains
  already saturate the MXU pipeline (the mask-free matmul-only chain
  runs 26.8 TF/s at k=4, and the full body's per-iteration cost equals
  it: masks/selects are free), while larger tiles only add straggler
  coupling (every member iterates until the tile's slowest converges).
  k=16 does not even compile at m=128 (~12.6 MB live state overflows
  VMEM server-side).  Warm solves hold ~2x the live state (prev, C,
  CMC, CC blocks) so the same budget halves their tile at large m.
  """
  budget = 128 * 128 * (4 if warm else 8)
  return max(1, min(4, budget // (m * m)))


def _bmm(a, b, prec=lax.Precision.HIGHEST):
  """Batched [k,m,m] @ [k,m,m] on the MXU."""
  return lax.dot_general(
      a, b, (((2,), (1,)), ((0,), (0,))),
      precision=prec,
      preferred_element_type=jnp.float32)


def _bmat_power(mat, p: int, prec=lax.Precision.HIGHEST):
  """mat**p (static p) by square-and-multiply; log2(p) batched matmuls."""
  assert p >= 1
  out = None
  while p > 0:
    if p % 2:
      out = mat if out is None else _bmm(out, mat, prec)
    p //= 2
    if p:
      mat = _bmm(mat, mat, prec)
  return out


def _transpose(x):
  return jnp.swapaxes(x, 1, 2)


def _rowmax(x):
  """[k,m,m] -> [k,1,1] max (staged: Mosaic rejects multi-axis reduces)."""
  return jnp.max(jnp.max(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _rowsum2(x):
  """[k,m,m] -> [k,1,1] sum, staged like `_rowmax`."""
  return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _any(mask):
  """Rank-0 any() of a [k,1,1] bool (Mosaic-safe while_loop predicate)."""
  return jnp.max(mask.astype(jnp.float32)) > 0.0


def _kernel(pads_ref, maxevs_in_ref, stats_ref, *rest, p, k, m, warm,
            num_iters, ridge_epsilon, error_tolerance,
            relative_matrix_epsilon, warm_error_threshold, retry_threshold,
            num_tries, max_error_ratio):
  if warm:
    (prevs_ref, roots_ref, err_ref, iters_ref, retries_ref,
     maxev_ref) = rest
  else:
    roots_ref, err_ref, iters_ref, retries_ref, maxev_ref = rest
    prevs_ref = None
  g = pl.program_id(0)

  # Per-matrix valid sizes from the prefetched scalar array -> [k,1,1].
  # (Mosaic can't reshape a 1D scalar stack to [k,1,1]; build it with
  # k broadcast-selects instead.)
  tile_idx = lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
  pads = jnp.zeros((k, 1, 1), jnp.int32)
  for j in range(k):
    pads = jnp.where(tile_idx == j, pads_ref[g * k + j], pads)

  rows = lax.broadcasted_iota(jnp.int32, (k, m, m), 1)
  cols = lax.broadcasted_iota(jnp.int32, (k, m, m), 2)
  valid = ((rows < pads) & (cols < pads)).astype(jnp.float32)
  eye = jnp.where((rows == cols) & (rows < pads), 1.0, 0.0).astype(
      jnp.float32)

  mat = stats_ref[...].astype(jnp.float32) * valid

  if relative_matrix_epsilon:
    # Externally supplied top eigenvalues (the wrapper computes them with
    # one batched XLA power iteration over the WHOLE fleet when the
    # caller doesn't; an in-kernel variant existed and was deleted — it
    # serialised the latency-bound matvecs over only k member chains and
    # measured 0.38x XLA).
    max_ev = jnp.zeros((k, 1, 1), jnp.float32)
    for j in range(k):
      max_ev = jnp.where(tile_idx == j, maxevs_in_ref[g * k + j], max_ev)
  else:
    max_ev = jnp.ones((k, 1, 1), jnp.float32)
  ridge = ridge_epsilon * jnp.maximum(max_ev, 1e-25)

  pf = float(p)
  inv_p = 1.0 / pf
  alpha = -inv_p

  if warm:
    prev = prevs_ref[...].astype(jnp.float32) * valid
    mat_c = _bmat_power(prev, p // 2)
    cmc = _bmm(mat_c, _bmm(mat, mat_c))
    cmc = 0.5 * (cmc + _transpose(cmc))
    cc = _bmm(mat_c, mat_c)
    total_rounds = num_tries + 1
  else:
    total_rounds = num_tries

  # NOTE on precision: every matmul runs at HIGHEST.  A mixed-precision
  # "ladder" (coarse bf16 phase, invariant rebuild, full-precision
  # polish) was tried and RETIRED: the coupled iteration's invariant
  # M = H^p (A + r I) relies on H, T and A commuting, which holds only
  # while every iterate is a polynomial of A.  Coarse rounding injects
  # non-polynomial components; the polish then converges M -> I while H
  # drifts off the principal root, so the kernel SELF-REPORTS 1e-6
  # residuals while emitting roots with true residuals up to ~1e8 on
  # ill-conditioned input (measured on TPU at the [712,128,128] bench
  # batch; CPU tests missed it because CPU DEFAULT==HIGHEST).  Measured
  # gain of the ladder before retirement: 3% (20.3 vs 20.9 ms) — the
  # tile is MXU-latency-bound, not matmul-throughput-bound, so cheaper
  # matmuls barely help.  See DESIGN.md "Retired: mixed-precision
  # ladder".

  # Per-member masks live in the while-loop carries as {0,1} float32 —
  # Mosaic cannot yield i1 vectors across loop boundaries.
  def _make_newton(tol):
    def newton_cond(state):
      i, _, _, _, _, active = state
      return jnp.logical_and(i < num_iters, jnp.max(active) > 0.0)

    def newton_body(state):
      i, mat_m, mat_h, error, iters, active = state
      mat_t = (1.0 + inv_p) * eye + alpha * mat_m
      new_m = _bmm(_bmat_power(mat_t, p), mat_m)
      new_h = _bmm(mat_h, mat_t)
      new_error = _rowmax(jnp.abs(new_m - eye))
      ratio = new_error / jnp.maximum(error, 1e-30)
      # A divergent step is rejected outright: (mat_h, error) stay at the
      # last good iterate/error pair, which is exactly what the member
      # should report (the XLA path's old_h rollback, expressed as
      # never-adopt instead of adopt-then-undo).
      step_ok = active * (ratio < max_error_ratio).astype(jnp.float32)
      take = step_ok > 0.5
      mat_m = jnp.where(take, new_m, mat_m)
      mat_h = jnp.where(take, new_h, mat_h)
      error = jnp.where(take, new_error, error)
      iters = iters + step_ok
      active = step_ok * (error > tol).astype(jnp.float32)
      return i + 1, mat_m, mat_h, error, iters, active

    return newton_cond, newton_body

  def retry_body(state):
    rnd, root, error, iters, retries, failed, warm_final = state
    if warm:
      ridge_i = ridge * jnp.exp(
          jnp.maximum(rnd - 1, 0).astype(jnp.float32) * _LN10)
    else:
      ridge_i = ridge * jnp.exp(rnd.astype(jnp.float32) * _LN10)
    damped = mat + ridge_i * eye
    fro = jnp.sqrt(_rowsum2(damped * damped))
    z = (1.0 + pf) / (2.0 * jnp.maximum(fro, 1e-30))
    m0 = damped * z
    h0 = eye * jnp.exp(jnp.log(z) * inv_p)
    if warm:
      m0_w = cmc + ridge_i * cc
      bound = jnp.max(jnp.sum(jnp.abs(m0_w), axis=2, keepdims=True),
                      axis=1, keepdims=True)
      z_w = jnp.minimum(1.0, (1.0 + pf) / (2.0 * jnp.maximum(bound, 1e-30)))
      err0_w = _rowmax(jnp.abs(m0_w * z_w - eye))
      use_warm = ((rnd == 0) & (err0_w <= warm_error_threshold)).astype(
          jnp.float32)
      m0 = jnp.where(use_warm > 0.5, m0_w * z_w, m0)
      h0 = jnp.where(use_warm > 0.5, prev * jnp.exp(jnp.log(z_w) * inv_p), h0)
    err0 = _rowmax(jnp.abs(m0 - eye))
    zeros = jnp.zeros((k, 1, 1), jnp.float32)
    newton_cond, newton_body = _make_newton(error_tolerance)
    _, _, mat_h, n_error, n_iters, _ = lax.while_loop(
        newton_cond, newton_body,
        (0, m0, h0, err0, zeros,
         failed * (err0 > error_tolerance).astype(jnp.float32)))
    # Only members that entered this round adopt its results.
    entered = failed > 0.5
    root = jnp.where(entered, mat_h, root)
    error = jnp.where(entered, n_error, error)
    iters = jnp.where(entered, n_iters, iters)
    retries = retries + failed
    if warm:
      warm_final = jnp.where(entered, use_warm, warm_final)
    new_failed = failed * (error > retry_threshold).astype(jnp.float32)
    return rnd + 1, root, error, iters, retries, new_failed, warm_final

  def retry_cond(state):
    rnd, _, _, _, _, failed, _ = state
    return jnp.logical_and(rnd < total_rounds, jnp.max(failed) > 0.0)

  kmm_zeros = jnp.zeros((k, m, m), jnp.float32)
  k11 = jnp.zeros((k, 1, 1), jnp.float32)
  init = (0, kmm_zeros, k11 + 1000.0, k11, k11,
          jnp.ones((k, 1, 1), jnp.float32), k11)
  _, root, error, iters, retries, _, warm_final = lax.while_loop(
      retry_cond, retry_body, init)

  if warm:
    # The warm limit prev * M0^{-1/p} is symmetric only up to the
    # certified-small non-commutativity; symmetrise those members.
    root = jnp.where(warm_final > 0.5, 0.5 * (root + _transpose(root)), root)
  else:
    # The SPD principal root is symmetric; H is symmetric up to rounding
    # (measured ~1e-3 max at the bench batch), so symmetrising only
    # removes error components.
    root = 0.5 * (root + _transpose(root))

  is_padding = (pads == 0)
  root = jnp.where(is_padding, 0.0, root * valid)
  error = jnp.where(is_padding, 0.0, error)

  roots_ref[...] = root
  # Scalar extraction via one-hot masked full reduces (Mosaic rejects
  # vector.extract of [k,1,1] elements).
  neg_inf = jnp.float32(-jnp.inf)
  for j in range(k):
    sel = tile_idx == j
    err_ref[g * k + j] = jnp.max(jnp.where(sel, error, neg_inf))
    iters_ref[g * k + j] = jnp.max(jnp.where(sel, iters, neg_inf))
    retries_ref[g * k + j] = jnp.max(jnp.where(sel, retries, neg_inf))
    maxev_ref[g * k + j] = jnp.max(jnp.where(sel, max_ev, neg_inf))


def batched_inverse_pth_root_pallas(
    stats: Array,
    p: int,
    padding_starts: Optional[Array] = None,
    *,
    prevs: Optional[Array] = None,
    max_evs: Optional[Array] = None,
    num_iters: int = 100,
    ridge_epsilon: float = 1e-6,
    error_tolerance: float = 1e-6,
    relative_matrix_epsilon: bool = True,
    warm_error_threshold: float = 0.05,
    retry_loop_error_threshold: float = 0.05,
    num_tries: int = 6,
    max_error_ratio: float = 1.2,
    interpret: bool = False,
    tile_k: Optional[int] = None,
) -> Tuple[Array, RootMetrics]:
  """Drop-in fused replacement for `pth_root.batched_inverse_pth_root`.

  Args:
    stats: ``[N, m, m]`` PSD batch (f32).
    p: static int root exponent shared by the batch (the optimizer solves
      one exponent bucket per call).
    padding_starts: ``[N]`` int32 valid sizes (defaults to m).
    prevs: optional ``[N, m, m]`` previous roots for certified warm
      starts (`reuse_preconditioner`).
    max_evs: optional ``[N]`` externally computed top eigenvalues for the
      relative ridge.  When omitted, the wrapper computes them with one
      fleet-wide batched XLA power iteration before the kernel launch —
      all N latency-bound matvec chains pipeline through the MXU.  (An
      in-kernel power iteration existed and was deleted: it serialised
      the matvecs over only the tile's ``k`` member chains and measured
      0.38x XLA.)  Ignored when ``relative_matrix_epsilon=False``.
    interpret: run the kernel in the Pallas interpreter (CPU CI).
    tile_k: override the matrices-per-grid-step tile size (default:
      ``tile_for(m, warm)``).  Benchmarking knob — the default is the
      measured production choice (see DESIGN.md's tile-size breakdown).

  Returns:
    ``(roots [N, m, m], RootMetrics with [N] leaves)``.
  """
  n, m, m2 = stats.shape
  assert m == m2, stats.shape
  assert supported(m), f"matrix size {m} unsupported by the pallas kernel"
  assert isinstance(p, int) and p >= 1, p
  if padding_starts is None:
    padding_starts = jnp.full((n,), m, jnp.int32)

  # Warm starts need an even exponent (C = prev^{p/2}); odd p falls back
  # to a cold solve, mirroring `matrix_inverse_pth_root`.  Decide BEFORE
  # the eigenvalue fallback below: its exit tolerance is warmth-dependent.
  if prevs is not None and p % 2:
    prevs = None

  if relative_matrix_epsilon and max_evs is None:
    # Loose 1% exit for cold AND warm — the estimate only scales the
    # ridge, power iteration converges from below, and the retry ladder
    # guards the rare member that needs more rounds (same measured
    # policy as `optim/shampoo._solve_batched`; see
    # SOLVE_GAP_PROBE.json: 22.6 -> 1.8 ms at identical root errors).
    pi_tol = 1e-2
    max_evs = jax.vmap(
        lambda s, d: pth_root.power_iteration(
            s, padding_start=d, error_tolerance=pi_tol,
            relative_tolerance=True)[1])(stats, padding_starts)
  if max_evs is None:
    max_evs = jnp.zeros((n,), jnp.float32)
  k = tile_k or tile_for(m, warm=prevs is not None)
  pad_n = (-n) % k
  if pad_n:
    filler = jnp.broadcast_to(jnp.eye(m, dtype=stats.dtype),
                              (pad_n, m, m))
    stats = jnp.concatenate([stats, filler], axis=0)
    padding_starts = jnp.concatenate(
        [padding_starts, jnp.zeros((pad_n,), jnp.int32)])
    max_evs = jnp.concatenate([max_evs, jnp.ones((pad_n,), max_evs.dtype)])
    if prevs is not None:
      prevs = jnp.concatenate([prevs, filler.astype(prevs.dtype)], axis=0)
  total = n + pad_n
  warm = prevs is not None

  kernel = functools.partial(
      _kernel, p=p, k=k, m=m, warm=warm,
      num_iters=num_iters,
      ridge_epsilon=ridge_epsilon, error_tolerance=error_tolerance,
      relative_matrix_epsilon=relative_matrix_epsilon,
      warm_error_threshold=warm_error_threshold,
      retry_threshold=retry_loop_error_threshold, num_tries=num_tries,
      max_error_ratio=max_error_ratio)

  mat_spec = pl.BlockSpec((k, m, m), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
  smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(total // k,),
      in_specs=[mat_spec] * (2 if warm else 1),
      out_specs=[mat_spec, smem_spec, smem_spec, smem_spec, smem_spec],
  )

  # ~5 batched matmuls x ~25 amortised iterations per matrix.
  flops_per = 5 * 2 * m * m * m * 25
  args = [padding_starts.astype(jnp.int32), max_evs.astype(jnp.float32),
          stats.astype(jnp.float32)]
  if warm:
    args.append(prevs.astype(jnp.float32))
  roots, errors, iters, retries, maxevs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((total, m, m), jnp.float32),
          jax.ShapeDtypeStruct((total,), jnp.float32),
          jax.ShapeDtypeStruct((total,), jnp.float32),
          jax.ShapeDtypeStruct((total,), jnp.float32),
          jax.ShapeDtypeStruct((total,), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops_per * total,
          bytes_accessed=(3 if warm else 2) * total * m * m * 4,
          transcendentals=0),
      interpret=interpret,
  )(*args)

  if pad_n:
    roots = roots[:n]
    errors, iters, retries, maxevs = (
        errors[:n], iters[:n], retries[:n], maxevs[:n])

  metrics = RootMetrics(
      error=errors,
      iterations=iters,
      error_ratio=jnp.zeros_like(errors),
      max_eigenvalue=maxevs,
      retries=retries)
  return roots.astype(stats.dtype), metrics
