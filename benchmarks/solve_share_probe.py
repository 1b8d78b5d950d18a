"""Decompose the in-step solve share: kernel vs PI vs orchestration.

`STEP_BREAKDOWN_TPU.json` (round 5) shows `solve_share_ms` ~42 ms while
the standalone Pallas solve of the same fleet is ~11 ms cold
(`KERNELS_TPU.json`) — and warm-started steps got SLOWER than cold
(53.3 vs 50.2), meaning the kernel's iteration count is not the
dominant term of the in-step solve.  This probe bisects the gap with
three full-step ablations (each one tunnel compile):

  * ``step_no_pi_ms``: relative_matrix_epsilon=False — removes every
    power iteration from the solve path.
  * ``step_xla_solver_ms``: solver_backend='xla' — swaps the 11 ms
    Pallas batch for the 28 ms XLA batch; the step delta vs the default
    bounds what the kernel actually contributes in-step.
  * ``step_interval2_ms``: preconditioning_compute_steps=2 — half the
    steps solve; the amortized step isolates per-solve vs per-step cost.

Merges keys into STEP_BREAKDOWN_TPU.json.
Run on TPU:  python benchmarks/solve_share_probe.py
"""

import json
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from precondition_tpu.optim import shampoo

from benchmarks.kernel_breakdown import _rtt
from benchmarks.profile_step import _step_ms

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "STEP_BREAKDOWN_TPU.json")


def main():
  import bench

  rtt = _rtt()
  params, grads = bench.device_fixture(False)
  out = {}
  if os.path.exists(OUT):
    with open(OUT) as f:
      out = json.load(f)

  def _record(key, tx, **kw):
    out[key] = round(_step_ms(tx, params, grads, rtt, **kw), 2)
    with open(OUT, "w") as f:
      json.dump(out, f, indent=1)
    print(f"{key}: {out[key]} ms", flush=True)

  common = dict(graft_type=shampoo.GraftingType.RMSPROP,
                generate_training_metrics=False)
  _record("step_no_pi_ms", shampoo.distributed_shampoo(
      **bench.HYPERS, **common, relative_matrix_epsilon=False))
  _record("step_xla_solver_ms", shampoo.distributed_shampoo(
      **bench.HYPERS, **common, solver_backend="xla"))
  _record("step_interval2_ms", shampoo.distributed_shampoo(
      **{**bench.HYPERS, "preconditioning_compute_steps": 2},
      **common), k=16, settle_steps=4)


if __name__ == "__main__":
  main()
