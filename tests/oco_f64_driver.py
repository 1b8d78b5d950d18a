"""Subprocess driver: OCO upstream parity at float64.

The reference's OCO contract is explicitly f64 (`oco/sweep.py:38` enables
jax_enable_x64); the main test session runs f32 (x64 would leak into every
other test), so `test_oco.py::test_matches_upstream_f64` launches this
script in a clean interpreter with x64 on and asserts rc == 0.
"""

import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_PLATFORMS") == "cpu":
  jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# Repo root first (the interpreter puts tests/ on sys.path, not the root
# that holds the package), then the mounted reference.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, "/root/reference")
sys.dont_write_bytecode = True

from precondition_tpu.oco import algorithms
from precondition.oco import algorithms as ref


def run(alg_name: str) -> float:
  ours_alg = algorithms.Algorithm[alg_name]
  ref_alg = ref.Algorithm[alg_name]
  sketched = alg_name not in ("OGD", "ADA")
  k = 6 if sketched else 0
  rng = np.random.RandomState(7)
  grads = [jnp.asarray(rng.randn(16)) for _ in range(40)]
  assert grads[0].dtype == jnp.float64, grads[0].dtype

  ours_i, ours_u = algorithms.generate_init_update(
      (16,), algorithms.HParams(0.5, 0.2, k, ours_alg))
  ref_i, ref_u = ref.generate_init_update(
      (16,), ref.HParams(0.5, 0.2, k, ref_alg))
  ours_s, ref_s = ours_i(), ref_i()
  worst = 0.0
  for g in grads:
    ours_s = ours_u(ours_s, jnp.array(0.0), g)
    ref_s = ref_u(ref_s, jnp.array(0.0), g)
    diff = np.max(np.abs(np.asarray(ours_s["w"]) - np.asarray(ref_s["w"])))
    scale = max(1e-30, np.max(np.abs(np.asarray(ref_s["w"]))))
    worst = max(worst, float(diff / scale))
  return worst


def main():
  failures = []
  for name in ["OGD", "ADA", "RFD_SON", "FD_SON", "ADA_FD", "S_ADA"]:
    worst = run(name)
    print(f"{name}: worst relative trajectory divergence {worst:.3e}")
    # f64 end-to-end: both sides run the identical algorithm; everything
    # beyond SVD sign/rounding ambiguity would show up far above this.
    if worst > 1e-9:
      failures.append((name, worst))
  if failures:
    print("FAILURES:", failures)
    return 1
  return 0


if __name__ == "__main__":
  sys.exit(main())
