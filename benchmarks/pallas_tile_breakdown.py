"""Per-iteration latency breakdown of the Pallas tile solver.

Quantifies where the cold-solve gap to the MXU ceiling comes from
(KERNELS_TPU.json: 18.6 TF/s achieved vs 31.1 TF/s measured matmul
ceiling at the [712, 128, 128] p=4 production batch):

* **Tile-size sweep** (``tile_k`` in {4, 8, 16}): does doubling the
  VMEM budget (k=16, ~12.6 MB live state) buy pipeline depth, or is the
  tile already dependency-bound?
* **Per-iteration slope** of the real Newton body: solve with
  ``error_tolerance=0, num_tries=1`` at two fixed iteration budgets —
  the difference isolates one iteration's cost with masks, selects and
  convergence reductions included, with launch/IO/setup in the
  intercept.
* **Pure-matmul slope**: a mask-free microkernel running only the
  iteration's five batched [k,m,m] HIGHEST matmuls (T = c1*I + c2*M;
  M <- T^p M via square-and-multiply for p=4: T2=T*T, T2*T, (T^3)*... —
  structured exactly like `_bmat_power(T, 4) @ M` + H update) over the
  same grid. The full-body slope minus this is the per-iteration
  mask/select/reduce overhead.
* **Retry-round tail**: production solve time minus (mean_iters x
  full slope + intercept) — time spent in extra ladder rounds' setup
  and the tile's straggler coupling (all members wait for the slowest).

Writes ``PALLAS_TILE_BREAKDOWN.json`` at the repo root.

Run on TPU:  python benchmarks/pallas_tile_breakdown.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from precondition_tpu.ops.pallas import newton_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "PALLAS_TILE_BREAKDOWN.json")


def _sync(x) -> float:
  leaf = jax.tree.leaves(x)[0]
  return float(np.asarray(jnp.ravel(leaf)[0]))


def _rtt() -> float:
  f = jax.jit(lambda: jnp.zeros(()))
  _sync(f())
  best = float("inf")
  for _ in range(5):
    t0 = time.perf_counter()
    _sync(f())
    best = min(best, time.perf_counter() - t0)
  return best


def _time_chained(solve, stats, chain, rtt, rounds=3):
  """Seconds per solve of ``chain`` data-dependent re-solves in one program."""

  def body(_, carry):
    roots = solve(stats * (1.0 + 1e-30 * carry))
    return roots

  run = jax.jit(lambda s: lax.fori_loop(
      0, chain, body, jnp.zeros_like(s)))
  _sync(run(stats))
  best = float("inf")
  for _ in range(rounds):
    t0 = time.perf_counter()
    _sync(run(stats))
    best = min(best, time.perf_counter() - t0)
  return max(best - rtt, 1e-9) / chain


def _matmul_only_kernel(stats_ref, out_ref, *, iters, p, k, m):
  """The Newton iteration's matmul chain with no masks/selects/reduces."""
  eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (k, m, m))
  mat_m = stats_ref[...]
  mat_h = eye

  def body(_, carry):
    mat_m, mat_h = carry
    mat_t = 1.25 * eye - 0.25 * mat_m
    new_m = newton_root._bmm(newton_root._bmat_power(mat_t, p), mat_m)
    new_h = newton_root._bmm(mat_h, mat_t)
    # Renormalize so the chain stays finite over `iters` iterations
    # without convergence (one rowmax+divide; ~the cheapest stabilizer).
    scale = newton_root._rowmax(jnp.abs(new_m))
    return new_m / jnp.maximum(scale, 1e-30), new_h

  mat_m, mat_h = lax.fori_loop(0, iters, body, (mat_m, mat_h))
  out_ref[...] = mat_h + mat_m


def _matmul_only(stats, iters, p, k):
  n, m, _ = stats.shape
  assert n % k == 0
  spec = pl.BlockSpec((k, m, m), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
  return pl.pallas_call(
      functools.partial(_matmul_only_kernel, iters=iters, p=p, k=k, m=m),
      grid=(n // k,),
      in_specs=[spec],
      out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((n, m, m), jnp.float32),
  )(stats)


def measure(n=712, m=128, p=4):
  rng = np.random.RandomState(0)
  rtt = _rtt()
  out = {
      "platform": jax.devices()[0].platform,
      "device": str(jax.devices()[0]),
      "fixture": {"n": n, "m": m, "p": p},
      "tunnel_rtt_ms": round(rtt * 1e3, 1),
  }

  g = jnp.asarray(rng.randn(n, m, m), jnp.float32)
  stats = jnp.einsum("nij,nkj->nik", g, g) / m
  pads = jnp.full((n,), m, jnp.int32)

  # External eigenvalues once (production 'auto' supplies them).
  from precondition_tpu.ops import pth_root
  max_evs = jax.jit(jax.vmap(
      lambda s: pth_root.power_iteration(s, padding_start=m)[1]))(stats)
  _sync(max_evs)

  # FLOPs per iteration and matrix at p=4 (same convention as
  # KERNELS_TPU.json): square-and-multiply T^4 (2 matmuls) + T^4 @ M +
  # H @ T = 4 batched matmuls of 2*m^3.
  flops_iter = 4 * 2 * m**3

  # ---- tile sweep: production solve, external eigenvalues ------------
  # (the wrapper pads n up to a multiple of k internally)
  for k in (4, 8, 16):
    def solve(s, k=k):
      roots, _ = newton_root.batched_inverse_pth_root_pallas(
          s, p, pads, max_evs=max_evs, tile_k=k)
      return roots
    try:
      t = _time_chained(solve, stats, chain=4, rtt=rtt)
      out[f"solve_k{k}_ms"] = round(t * 1e3, 3)
      # Same iteration count regardless of k (same math): use 17.8
      # (KERNELS_TPU measured mean) for the GF/s derivation.
      out[f"solve_k{k}_gflops"] = round(
          n * 17.8 * flops_iter / t / 1e9, 1)
    except Exception as e:  # pragma: no cover
      out[f"solve_k{k}_error"] = repr(e)[:200]

  # ---- per-iteration slope of the real body --------------------------
  # error_tolerance=0 never converges; num_tries=1 disables the ladder:
  # exactly `iters` full-body iterations per member.
  for iters in (8, 24):
    def solve_fixed(s, iters=iters):
      roots, _ = newton_root.batched_inverse_pth_root_pallas(
          s, p, pads, max_evs=max_evs, num_iters=iters,
          error_tolerance=0.0, num_tries=1)
      return roots
    t = _time_chained(solve_fixed, stats, chain=4, rtt=rtt)
    out[f"fullbody_iters{iters}_ms"] = round(t * 1e3, 3)
  slope_full = (out["fullbody_iters24_ms"] - out["fullbody_iters8_ms"]) / 16
  intercept = out["fullbody_iters8_ms"] - 8 * slope_full
  out["fullbody_per_iter_ms"] = round(slope_full, 4)
  out["launch_io_setup_ms"] = round(intercept, 3)

  # ---- pure-matmul slope ---------------------------------------------
  k_prod = newton_root.tile_for(m)
  for iters in (8, 24):
    t_run = jax.jit(functools.partial(
        _matmul_only, iters=iters, p=p, k=k_prod))
    _sync(t_run(stats))
    best = float("inf")
    for _ in range(3):
      t0 = time.perf_counter()
      _sync(t_run(stats))
      best = min(best, time.perf_counter() - t0)
    out[f"matmulonly_iters{iters}_ms"] = round(
        max(best - rtt, 1e-9) * 1e3, 3)
  slope_mm = (out["matmulonly_iters24_ms"]
              - out["matmulonly_iters8_ms"]) / 16
  out["matmulonly_per_iter_ms"] = round(slope_mm, 4)
  out["mask_select_overhead_per_iter_ms"] = round(slope_full - slope_mm, 4)
  out["matmulonly_tflops"] = round(
      n * flops_iter / (slope_mm * 1e-3) / 1e12, 1)

  # ---- retry tail -----------------------------------------------------
  def solve_prod(s):
    roots, _ = newton_root.batched_inverse_pth_root_pallas(
        s, p, pads, max_evs=max_evs)
    return roots
  t_prod = _time_chained(solve_prod, stats, chain=4, rtt=rtt)
  out["solve_prod_ms"] = round(t_prod * 1e3, 3)
  mean_iters = 17.8  # KERNELS_TPU.json measured mean on this fixture
  modeled = intercept + mean_iters * slope_full
  out["modeled_no_retry_ms"] = round(modeled, 3)
  out["retry_straggler_tail_ms"] = round(t_prod * 1e3 - modeled, 3)
  return out


def main():
  out = measure()
  with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
  print(json.dumps(out, indent=1))


if __name__ == "__main__":
  main()
