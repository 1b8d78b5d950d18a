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
    return 0.999 * s + 0.001 * jnp.einsum(
        "nij,nkj->nik", g, g, precision=jax.lax.Precision.HIGHEST)

  t_gram = _timeit_loop(gram_body, s0, k=64, rtt=rtt)
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

  pallas_single = lambda s, w: newton_root.batched_inverse_pth_root_pallas(
      s, p, pads, prevs=w, coarse_precision=None)

  roots = record("xla_cold", xla, stats)
  record("xla_warm", xla, drifted, warm_with=roots, k=8)
  pl_roots = record("pallas_cold", pallas, stats)
  record("pallas_warm", pallas, drifted, warm_with=pl_roots, k=8)
  # Ladder ablation: same kernel, single-phase HIGHEST iteration.
  record("pallas_cold_single", pallas_single, stats)
  out["pallas_vs_xla_cold"] = round(out["xla_cold_ms"]
                                    / out["pallas_cold_ms"], 2)
  out["pallas_vs_xla_warm"] = round(out["xla_warm_ms"]
                                    / out["pallas_warm_ms"], 2)
  out["pallas_xla_root_agreement"] = float(jnp.max(jnp.abs(roots - pl_roots)))
  return out


def main():
  result = measure()
  with open(OUT, "w") as f:
    json.dump(result, f, indent=1)
  print(json.dumps(result))


if __name__ == "__main__":
  main()
