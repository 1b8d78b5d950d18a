"""TPU numerics validation of the solver paths (run on real hardware).

CPU CI cannot validate TPU matmul rounding behavior (CPU's DEFAULT tier
is exact f32, so precision-sensitive failure modes are invisible there —
this is exactly how the retired mixed-precision ladder's corruption
slipped past interpret-mode tests).  This script checks, on the chip:

* Pallas-vs-XLA root agreement across a condition-number ladder,
* the TRUE residual ``|H^p (A + r I) - I|`` of every root, recomputed
  on the host in float64 — independent of the solver's self-reported
  error, which an invariant-drift bug can fake (the retired ladder
  self-reported 1e-6 while emitting ~1e8-residual roots),
* warm starts stay certified (error <= tolerance, iterations ~1-2),
  both with the in-kernel power iteration and with externally supplied
  eigenvalues (the production routing).

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


def true_residual(roots, stats, metrics, p=4, ridge_epsilon=1e-6):
  """Host-side float64 ``max |H^p (A + r_eff I) - I|`` over the batch.

  ``r_eff`` accounts for the retry ladder's ridge escalation
  (``ridge * 10^(retries-1)``).  The f32 storage of H contributes
  ~``eps_f32 * p * cond`` by itself, so thresholds must scale with the
  batch's conditioning; the signal that matters is the order of
  magnitude (a coupled-invariant drift shows up as 1e4-1e8).
  """
  h = np.asarray(roots, np.float64)
  eff = (ridge_epsilon
         * np.maximum(np.asarray(metrics.max_eigenvalue, np.float64), 1e-30)
         * 10.0 ** np.maximum(
             np.asarray(metrics.retries, np.float64) - 1.0, 0.0))
  m = h.shape[-1]
  d = np.asarray(stats, np.float64) + eff[:, None, None] * np.eye(m)
  hp = np.eye(m)[None].repeat(h.shape[0], axis=0)
  q, k = h, p
  while k:
    if k % 2:
      hp = np.matmul(hp, q)
    k //= 2
    if k:
      q = np.matmul(q, q)
  return float(np.abs(np.matmul(hp, d) - np.eye(m)).max())


def main():
  rng = np.random.RandomState(7)
  out = {"platform": jax.devices()[0].platform}
  failures = []

  for cond in [1e2, 1e4, 1e6]:
    stats = conditioned_batch(rng, 16, 128, cond)
    pads = jnp.full((16,), 128, jnp.int32)

    roots_p, met_p = jax.jit(
        lambda s: newton_root.batched_inverse_pth_root_pallas(s, 4, pads))(
            stats)
    roots_x, met_x = jax.jit(
        lambda s: pth_root.batched_inverse_pth_root(s, 4, pads))(stats)
    agree = float(jnp.max(jnp.abs(roots_p - roots_x)))
    scale = float(jnp.max(jnp.abs(roots_x)))
    res_p = true_residual(roots_p, stats, met_p)
    res_x = true_residual(roots_x, stats, met_x)
    out[f"cond{cond:.0e}"] = {
        "pallas_err": float(jnp.max(met_p.error)),
        "xla_err": float(jnp.max(met_x.error)),
        "agreement_rel": agree / max(scale, 1e-30),
        "true_residual_pallas": res_p,
        "true_residual_xla": res_x,
    }
    if agree / max(scale, 1e-30) > 0.05:
      failures.append(f"cond {cond:.0e}: pallas/xla roots diverge {agree}")
    # f32 root storage alone costs ~eps*p*cond; allow 100x headroom —
    # an invariant-drift bug overshoots this by several more orders.
    ceiling = max(100.0 * 1.2e-7 * 4 * cond, 1.0)
    if res_p > ceiling or res_x > ceiling:
      failures.append(
          f"cond {cond:.0e}: true residual pallas={res_p} xla={res_x} "
          f"above {ceiling}")

  # Warm-start certificate on drifted statistics: in-kernel power
  # iteration AND the production routing (external eigenvalues).
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
  if float(jnp.mean(met_w.iterations)) > 4:
    failures.append(
        "warm certificate not engaging (iterations ~cold): "
        f"{float(jnp.mean(met_w.iterations))}")

  def ext_maxev(s):
    return jax.vmap(
        lambda mat, d: pth_root.power_iteration(
            mat, padding_start=d, error_tolerance=1e-2,
            relative_tolerance=True)[1])(s, pads)

  warm_e, met_we = jax.jit(
      lambda s, w: newton_root.batched_inverse_pth_root_pallas(
          s, 4, pads, prevs=w, max_evs=ext_maxev(s)))(drifted, cold)
  out["warm_ext"] = {"err": float(jnp.max(met_we.error)),
                     "iters_mean": float(jnp.mean(met_we.iterations))}
  if float(jnp.max(met_we.error)) > 0.05:
    failures.append("warm(ext maxev) error above failure threshold")
  if float(jnp.mean(met_we.iterations)) > 4:
    failures.append("warm(ext maxev) certificate not engaging")

  out["failures"] = failures
  print(json.dumps(out))
  sys.exit(1 if failures else 0)


if __name__ == "__main__":
  main()
