"""TPU numerics validation of the solver paths (run on real hardware).

CPU CI cannot validate reduced-precision matmul behavior (every precision
tier is exact f32 there), so this script checks, on the real chip:

* the Pallas tile solver's mixed-precision ladder converges to the same
  tolerance as the single-phase kernel across a condition-number ladder,
* warm starts stay certified (error <= tolerance, iterations ~1-2),
* the XLA path with the opt-in ladder agrees with its single-phase self.

Exit code 0 = all checks pass.  Prints one summary JSON line.
"""

import json
import os
import sys

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp

# Script-dir sys.path fixup: make `python benchmarks/tpu_numerics_check.py`
# find the package at the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from precondition_tpu.ops import pth_root
from precondition_tpu.ops.pallas import newton_root


def conditioned_batch(rng, n, m, cond):
  """Symmetric PSD batch with exact condition number ``cond``."""
  mats = []
  for _ in range(n):
    q = scipy.stats.ortho_group.rvs(m, random_state=rng)
    e = np.logspace(0, np.log10(cond), m)
    mats.append((q * e) @ q.T)
  return jnp.asarray(np.stack(mats), jnp.float32)


def main():
  rng = np.random.RandomState(7)
  out = {"platform": jax.devices()[0].platform}
  failures = []

  for cond in [1e2, 1e4, 1e6]:
    stats = conditioned_batch(rng, 16, 128, cond)
    pads = jnp.full((16,), 128, jnp.int32)

    ladder, met_l = jax.jit(
        lambda s: newton_root.batched_inverse_pth_root_pallas(s, 4, pads))(
            stats)
    single, met_s = jax.jit(
        lambda s: newton_root.batched_inverse_pth_root_pallas(
            s, 4, pads, coarse_precision=None))(stats)
    err_l = float(jnp.max(met_l.error))
    err_s = float(jnp.max(met_s.error))
    agree = float(jnp.max(jnp.abs(ladder - single)))
    scale = float(jnp.max(jnp.abs(single)))
    out[f"cond{cond:.0e}"] = {
        "ladder_err": err_l, "single_err": err_s,
        "iters_ladder": float(jnp.mean(met_l.iterations)),
        "iters_single": float(jnp.mean(met_s.iterations)),
        "agreement_rel": agree / max(scale, 1e-30),
    }
    # The ladder must not be materially less accurate than single-phase
    # (both are gated by the same retry ladder / failure threshold).
    if err_l > max(5 * err_s, 0.05):
      failures.append(f"cond {cond:.0e}: ladder err {err_l} vs {err_s}")
    if agree / max(scale, 1e-30) > 0.05:
      failures.append(f"cond {cond:.0e}: roots diverge {agree}")

  # Warm-start certificate on drifted statistics.
  stats = conditioned_batch(rng, 16, 128, 1e3)
  pads = jnp.full((16,), 128, jnp.int32)
  cold, _ = jax.jit(
      lambda s: newton_root.batched_inverse_pth_root_pallas(s, 4, pads))(
          stats)
  g = jax.random.normal(jax.random.PRNGKey(0), stats.shape) * 0.01
  drifted = 0.999 * stats + 0.001 * (g @ jnp.swapaxes(g, 1, 2))
  warm, met_w = jax.jit(
      lambda s, w: newton_root.batched_inverse_pth_root_pallas(
          s, 4, pads, prevs=w))(drifted, cold)
  out["warm"] = {"err": float(jnp.max(met_w.error)),
                 "iters_mean": float(jnp.mean(met_w.iterations))}
  if float(jnp.max(met_w.error)) > 0.05:
    failures.append("warm solve error above failure threshold")

  # XLA opt-in ladder vs its single-phase self.
  stats = conditioned_batch(rng, 8, 128, 1e4)
  pads8 = jnp.full((8,), 128, jnp.int32)
  x_l, met_xl = jax.jit(
      lambda s: pth_root.batched_inverse_pth_root(
          s, 4, pads8, coarse_precision=jax.lax.Precision.HIGH))(stats)
  x_s, met_xs = jax.jit(
      lambda s: pth_root.batched_inverse_pth_root(s, 4, pads8))(stats)
  rel = float(jnp.max(jnp.abs(x_l - x_s)) / jnp.max(jnp.abs(x_s)))
  out["xla_ladder"] = {
      "err": float(jnp.max(met_xl.error)),
      "single_err": float(jnp.max(met_xs.error)),
      "agreement_rel": rel,
  }
  if rel > 0.05:
    failures.append(f"xla ladder diverges from single phase: {rel}")

  out["failures"] = failures
  print(json.dumps(out))
  sys.exit(1 if failures else 0)


if __name__ == "__main__":
  main()
