"""Pallas-vs-XLA inverse-root sweep over block sizes 256 / 512.

Round-4 review finding: every Pallas measurement sat at m=128 while the
optimizer's `supported()` gate admits up to m=512 and the signature
default is block_size=1024 (reference guidance "increase block size if
you have compute budget", `distributed_shampoo.py:1917-1920`).  This
sweep measures the kernel at the admitted sizes so the auto-routing is a
recorded tradeoff, validating (or falsifying) `tile_for`'s VMEM-budget
formula on hardware.

Batch sizes mirror the 58.7M-parameter bench tree re-blocked at each
size: doubling the block quarters the statistic count, so [712@128] ->
[178@256] -> [44@512] keeps the modeled parameter tree constant.

Merges rows into ``KERNELS_TPU.json`` (``m256_*`` / ``m512_*`` keys).

Run on TPU:  python benchmarks/blocksize_sweep.py
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from precondition_tpu.ops import pth_root
from precondition_tpu.ops.pallas import newton_root

from benchmarks.kernel_breakdown import _rtt, _sync, _timeit_loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "KERNELS_TPU.json")


def sweep_one(out, n, m, p, rtt, rng):
  g = jnp.asarray(rng.randn(n, m, m), jnp.float32)
  stats = jnp.einsum("nij,nkj->nik", g, g) / m
  pads = jnp.full((n,), m, jnp.int32)
  drift = jnp.einsum("nij,nkj->nik", 0.03 * g[:, :, ::-1], g) / m
  drifted = 0.999 * stats + 0.001 * (drift + jnp.swapaxes(drift, 1, 2))
  tag0 = f"m{m}"
  out[f"{tag0}_fixture_n"] = n
  out[f"{tag0}_tile_k"] = newton_root.tile_for(m)
  out[f"{tag0}_tile_k_warm"] = newton_root.tile_for(m, warm=True)

  def _ext_maxev(s):
    return jax.vmap(
        lambda mat, d: pth_root.power_iteration(
            mat, padding_start=d, error_tolerance=1e-2,
            relative_tolerance=True)[1])(s, pads)

  def record(tag, solve, problem, warm_with=None, k=4):
    roots, met = jax.jit(lambda s: solve(s, warm_with))(problem)
    _sync(roots)

    def body(_, carry):
      r, _ = solve(problem + 1e-30 * carry, warm_with)
      return r

    t = _timeit_loop(body, jnp.zeros_like(problem), k=k, rtt=rtt)
    iters_total = float(jnp.sum(met.iterations))
    flops = iters_total * p * 2 * m**3
    out[f"{tag}_ms"] = round(t * 1e3, 3)
    out[f"{tag}_gflops"] = round(flops / t / 1e9, 1)
    out[f"{tag}_iters_mean"] = round(iters_total / n, 1)
    out[f"{tag}_err_max"] = float(jnp.max(met.error))
    return roots

  xla = lambda s, w: pth_root.batched_inverse_pth_root(s, p, pads, prevs=w)
  pallas_ext = lambda s, w: newton_root.batched_inverse_pth_root_pallas(
      s, p, pads, prevs=w, max_evs=_ext_maxev(s))

  roots = record(f"{tag0}_xla_cold", xla, stats)
  record(f"{tag0}_xla_warm", xla, drifted, warm_with=roots, k=16)
  try:
    pl_roots = record(f"{tag0}_pallas_cold", pallas_ext, stats)
    record(f"{tag0}_pallas_warm", pallas_ext, drifted, warm_with=pl_roots,
           k=16)
    out[f"{tag0}_pallas_xla_root_agreement"] = float(
        jnp.max(jnp.abs(roots - pl_roots)))
    ratio = lambda a, b: round(out[a] / max(out[b], 1e-3), 2)
    out[f"{tag0}_pallas_vs_xla_cold"] = ratio(
        f"{tag0}_xla_cold_ms", f"{tag0}_pallas_cold_ms")
    out[f"{tag0}_pallas_vs_xla_warm"] = ratio(
        f"{tag0}_xla_warm_ms", f"{tag0}_pallas_warm_ms")
  except Exception as e:  # VMEM overflow etc: record, don't die.
    out[f"{tag0}_pallas_error"] = f"{type(e).__name__}: {e}"[:300]
  return out


def main():
  rtt = _rtt()
  out = {}
  if os.path.exists(OUT):
    with open(OUT) as f:
      out = json.load(f)
  rng = np.random.RandomState(0)
  for n, m in ((178, 256), (44, 512)):
    sweep_one(out, n, m, 4, rtt, rng)
    with open(OUT, "w") as f:  # checkpoint after each size
      json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k.startswith(f"m{m}")}))


if __name__ == "__main__":
  main()
