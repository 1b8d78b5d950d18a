"""Per-kernel roofline measurements on the bench fixture's hot shapes.

Writes ``KERNELS_TPU.json`` at the repo root (committed alongside the
code) so `bench.py` can attach the numbers to its one-line output without
re-paying ~15 min of XLA compiles through the TPU tunnel on every run.

Run on TPU:  python benchmarks/kernel_breakdown.py

Measures, on the [712, 128, 128] inverse-4th-root batch the headline
fixture solves every step (reference hot loops: gram update
`distributed_shampoo.py:1440-1470`, Newton `:836-848`):

* the achievable MXU matmul ceiling at the solver's precision,
* the statistics gram EMA rate,
* the XLA coupled-Newton solve, cold and warm-started, with achieved
  GF/s derived from the *measured* iteration counts (4 batched [m, m]
  HIGHEST matmuls per iteration at p=4),
* the fused Pallas tile solver on the same problems, same derivation.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Allow `python benchmarks/kernel_breakdown.py` without PYTHONPATH games:
# the interpreter puts benchmarks/ (the script dir) on sys.path, not the
# repo root that holds the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from precondition_tpu.ops import pth_root
from precondition_tpu.ops.pallas import newton_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "KERNELS_TPU.json")


def _sync(x) -> float:
  """Force completion: 4-byte device->host readback of one element.

  Through the remote-device tunnel `jax.block_until_ready` returns at
  enqueue (observed: "matmul rates" 10x above hardware peak), and bulk
  transfers run ~0.5 MB/s; only a scalar readback gives an honest fence.
  """
  leaf = jax.tree.leaves(x)[0]
  return float(np.asarray(jnp.ravel(leaf)[0]))


def _rtt() -> float:
  """Tunnel round-trip of an empty program + scalar sync (~30 ms)."""
  f = jax.jit(lambda: jnp.zeros(()))
  _sync(f())
  best = float("inf")
  for _ in range(5):
    t0 = time.perf_counter()
    _sync(f())
    best = min(best, time.perf_counter() - t0)
  return best


def _timeit_loop(body, x0, k, rtt, rounds=3):
  """Seconds per iteration of ``lax.fori_loop(0, k, body, x0)``.

  Running the K iterations inside ONE device program amortizes the ~30 ms
  tunnel round-trip, which is subtracted from the measured wall time.
  """
  run = jax.jit(lambda x: jax.lax.fori_loop(0, k, body, x))
  y = run(x0)
  _sync(y)
  best = float("inf")
  for _ in range(rounds):
    t0 = time.perf_counter()
    _sync(run(x0))
    best = min(best, time.perf_counter() - t0)
  return max(best - rtt, 1e-9) / k


def measure(n=712, m=128, p=4):
  rng = np.random.RandomState(0)
  rtt = _rtt()
  out = {
      "platform": jax.devices()[0].platform,
      "device": str(jax.devices()[0]),
      "fixture": {"n": n, "m": m, "p": p},
      "tunnel_rtt_ms": round(rtt * 1e3, 1),
  }

  # Achievable MXU ceiling at the solver's precision (f32 HIGHEST).
  # The normalization keeps the chain finite; it is O(n^2) against the
  # O(n^3) matmul.
  big = jnp.asarray(rng.randn(4096, 4096), jnp.float32)
  big = big / jnp.linalg.norm(big)

  def mm_body(_, a):
    b = jnp.matmul(a, a, precision=jax.lax.Precision.HIGHEST)
    return b / jnp.max(jnp.abs(b))

  t_mm = _timeit_loop(mm_body, big, k=64, rtt=rtt)
  out["matmul_ceiling_tflops"] = round(2 * 4096**3 / t_mm / 1e12, 1)

  # Statistics gram EMA on the bench block shape (carried through the
  # statistics EMA, exactly like the optimizer).
  g = jnp.asarray(rng.randn(n, m, m), jnp.float32)
  s0 = jnp.zeros((n, m, m), jnp.float32)

  def gram_body(_, s):
    # The 1e-30 carry coupling keeps the contraction inside the timed
    # loop: with a loop-invariant `g` XLA hoists the einsum out of the
    # fori_loop entirely and the "measurement" reports multi-TB/s HBM
    # rates (observed 8.7 TB/s on an ~0.8 TB/s part).
    gg = g * (1.0 + 1e-30 * s)
    return 0.999 * s + 0.001 * jnp.einsum(
        "nij,nkj->nik", gg, gg, precision=jax.lax.Precision.HIGHEST)

  # k must keep the whole loop well above the ~30 ms tunnel RTT being
  # subtracted (at k=64 the 0.18 ms/iter loop ran UNDER the RTT and the
  # artifact recorded a nonsense 0.0 ms).
  t_gram = _timeit_loop(gram_body, s0, k=256, rtt=rtt)
  out["stats_gemm_ms"] = round(t_gram * 1e3, 3)
  out["stats_gemm_gflops"] = round(n * 2 * m**3 / t_gram / 1e9, 1)
  # The gram EMA is HBM-bound: 3 x [n,m,m] f32 moves per update.
  hbm_bytes = 3 * n * m * m * 4
  out["stats_gemm_gbps"] = round(hbm_bytes / t_gram / 1e9, 1)

  stats = jnp.einsum("nij,nkj->nik", g, g) / m
  pads = jnp.full((n,), m, jnp.int32)
  drift = jnp.einsum("nij,nkj->nik", 0.03 * g[:, :, ::-1], g) / m
  drifted = 0.999 * stats + 0.001 * (drift + jnp.swapaxes(drift, 1, 2))

  def record(tag, solve, problem, warm_with=None, k=4):
    """Time k chained re-solves of the SAME problem inside one program.

    The carry feeds each round's roots back as a value-negligible
    perturbation (1e-30 * roots) of the statistics, forcing sequential
    execution without changing the solved problem; ``warm_with`` (fixed
    prevs) keeps the warm path solving the intended drifted problem, not
    warm-starting from its own output.
    """
    roots, met = jax.jit(
        lambda s: solve(s, warm_with))(problem)
    _sync(roots)

    def body(_, carry):
      r, _ = solve(problem + 1e-30 * carry, warm_with)
      return r

    t = _timeit_loop(body, jnp.zeros_like(problem), k=k, rtt=rtt)
    iters_total = float(jnp.sum(met.iterations))
    flops = iters_total * p * 2 * m**3  # p matmuls per Newton iteration
    out[f"{tag}_ms"] = round(t * 1e3, 3)
    out[f"{tag}_gflops"] = round(flops / t / 1e9, 1)
    out[f"{tag}_iters_mean"] = round(iters_total / n, 1)
    out[f"{tag}_err_max"] = float(jnp.max(met.error))
    return roots

  xla = lambda s, w: pth_root.batched_inverse_pth_root(s, p, pads, prevs=w)
  pallas = lambda s, w: newton_root.batched_inverse_pth_root_pallas(
      s, p, pads, prevs=w)

  # Production routing (`optim/shampoo._solve_batched`): the relative
  # ridge's top eigenvalues come from ONE fleet-wide batched XLA power
  # iteration, then the kernel runs with its latency-bound in-kernel
  # power iteration disabled.  Timed as the composite (power iteration
  # included) since that is what a step pays.
  def _ext_maxev(s):
    return jax.vmap(
        lambda mat, d: pth_root.power_iteration(
            mat, padding_start=d, relative_tolerance=True)[1])(s, pads)

  pallas_ext = lambda s, w: newton_root.batched_inverse_pth_root_pallas(
      s, p, pads, prevs=w, max_evs=_ext_maxev(s))

  # Warm chains need k >> 1: a warm re-solve is now a few ms, and the
  # whole fori_loop must stay well above the ~30 ms tunnel RTT being
  # subtracted (k=8 once measured a literal 0.0 ms after the in-kernel
  # power iteration was deleted).
  roots = record("xla_cold", xla, stats)
  record("xla_warm", xla, drifted, warm_with=roots, k=32)
  pl_roots = record("pallas_cold", pallas, stats)
  record("pallas_warm", pallas, drifted, warm_with=pl_roots, k=32)
  record("pallas_cold_ext", pallas_ext, stats)
  record("pallas_warm_ext", pallas_ext, drifted, warm_with=pl_roots, k=32)

  # TRUE residual |H^p (A + r I) - I| of the kernel's roots, recomputed
  # on the host in float64, independently of the solver's self-report —
  # the tripwire that would have caught the retired mixed-precision
  # ladder (self-reported 1e-6 while emitting ~1e8-residual roots on
  # this very batch).  The f32 storage of H alone contributes
  # ~eps_f32 * p * cond ~ O(1) at this batch's conditioning, so the
  # meaningful signal is the order of magnitude.
  rr, rm = jax.jit(lambda s: pallas(s, None))(stats)
  h64 = np.asarray(rr, np.float64)
  eff = (1e-6 * np.maximum(np.asarray(rm.max_eigenvalue, np.float64), 1e-30)
         * 10.0 ** np.maximum(np.asarray(rm.retries, np.float64) - 1.0, 0.0))
  d64 = np.asarray(stats, np.float64) + eff[:, None, None] * np.eye(m)
  hp64 = np.matmul(np.matmul(h64, h64), np.matmul(h64, h64))
  resid = np.matmul(hp64, d64) - np.eye(m)
  out["pallas_cold_true_residual"] = float(np.abs(resid).max())

  # The standalone fleet-wide power iteration, for the phase breakdown.
  def pi_body(_, c):
    return _ext_maxev(stats * (1.0 + 1e-30 * c[:, None, None]))

  t_pi = _timeit_loop(pi_body, jnp.zeros((n,), jnp.float32), k=8, rtt=rtt)
  out["xla_powerit_ms"] = round(t_pi * 1e3, 3)

  ratio = lambda a, b: round(out[a] / max(out[b], 1e-3), 2)
  out["pallas_vs_xla_cold"] = ratio("xla_cold_ms", "pallas_cold_ms")
  out["pallas_vs_xla_warm"] = ratio("xla_warm_ms", "pallas_warm_ms")
  out["pallas_ext_vs_xla_cold"] = ratio("xla_cold_ms", "pallas_cold_ext_ms")
  out["pallas_ext_vs_xla_warm"] = ratio("xla_warm_ms", "pallas_warm_ext_ms")
  out["pallas_xla_root_agreement"] = float(jnp.max(jnp.abs(roots - pl_roots)))

  # block_size=1024 fallback row: the fused whole-matrix kernel cannot
  # hold a [1024,1024] f32 working set (~4 MB/buffer x ~8 live buffers vs
  # ~16 MB VMEM/core), so `supported()` caps at 512 and the optimizer
  # routes these to XLA — measured here so the cap is a recorded tradeoff,
  # not an untested claim.  (Reference block-size guidance:
  # `distributed_shampoo.py:1917-1920`.)
  out["pallas_supported_m1024"] = newton_root.supported(1024)
  n2, m2 = 24, 1024
  g2 = jnp.asarray(rng.randn(n2, m2, m2).astype(np.float32))
  stats2 = jnp.einsum("nij,nkj->nik", g2, g2) / m2
  pads2 = jnp.full((n2,), m2, jnp.int32)
  drift2 = jnp.einsum("nij,nkj->nik", 0.03 * g2[:, :, ::-1], g2) / m2
  drifted2 = 0.999 * stats2 + 0.001 * (drift2 + jnp.swapaxes(drift2, 1, 2))

  def record2(tag, solve, problem, warm_with=None, k=2):
    roots2, met2 = jax.jit(lambda s: solve(s, warm_with))(problem)
    _sync(roots2)

    def body(_, carry):
      r, _ = solve(problem + 1e-30 * carry, warm_with)
      return r

    t = _timeit_loop(body, jnp.zeros_like(problem), k=k, rtt=rtt)
    iters_total = float(jnp.sum(met2.iterations))
    flops = iters_total * p * 2 * m2**3
    out[f"{tag}_ms"] = round(t * 1e3, 3)
    out[f"{tag}_gflops"] = round(flops / t / 1e9, 1)
    out[f"{tag}_iters_mean"] = round(iters_total / n2, 1)
    return roots2

  xla2 = lambda s, w: pth_root.batched_inverse_pth_root(s, p, pads2, prevs=w)
  roots2 = record2("xla_cold_m1024", xla2, stats2)
  record2("xla_warm_m1024", xla2, drifted2, warm_with=roots2, k=4)
  return out


def main():
  result = measure()
  with open(OUT, "w") as f:
    json.dump(result, f, indent=1)
  print(json.dumps(result))


if __name__ == "__main__":
  main()
