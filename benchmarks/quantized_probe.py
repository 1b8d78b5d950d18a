"""Quantized-state (best_effort_memory_usage_reduction) TPU measurements.

The quantized path is the reference's answer to optimizer-state HBM
pressure (int8 momenta, int16+diagonal statistics/roots —
`distributed_shampoo.py:3012-3281`); round-4 review flagged that ours
was parity-tested on CPU but absent from every TPU artifact.

Two measurements, merged into ``STEP_BREAKDOWN_TPU.json``:

* ``quantized_step_reduced_ms`` / ``f32_step_reduced_ms``: step time of
  the quantized vs plain config on bench.py's REDUCED (~2M param)
  fixture.  The full 58.7M quantized program keeps the legacy
  per-block state (QuantizedValue triples per statistic) and its XLA
  compile exceeded an hour through the TPU tunnel — the reduced tree
  exercises the identical code path at a compile the round budget
  affords; the ratio is the honest signal.
* ``quantized_state_mb`` / ``f32_state_mb``: EXACT optimizer-state HBM
  footprint of both configs on the FULL fixture, from the state
  pytree's shapes/dtypes (no compile needed) — the number the mode
  exists to improve.

Run on TPU:  python benchmarks/quantized_probe.py
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


def _tx(quantized):
  return shampoo.distributed_shampoo(
      **__import__("bench").HYPERS,
      graft_type=shampoo.GraftingType.RMSPROP,
      generate_training_metrics=False,
      best_effort_memory_usage_reduction=quantized)


def _state_mb(tx_, params):
  shapes = jax.eval_shape(tx_.init, params)
  return sum(int(np.prod(l.shape)) * l.dtype.itemsize
             for l in jax.tree.leaves(shapes)) / 1e6


def main():
  import bench

  rtt = _rtt()
  out = {}
  if os.path.exists(OUT):
    with open(OUT) as f:
      out = json.load(f)

  def _record(key, val):
    out[key] = val
    with open(OUT, "w") as f:
      json.dump(out, f, indent=1)
    print(f"{key}: {val}", flush=True)

  # Exact state HBM at the FULL fixture (shape/dtype only, no compile).
  rng = np.random.RandomState(0)
  full_shapes = jax.eval_shape(lambda: bench._param_tree(rng))
  _record("quantized_state_mb", round(_state_mb(_tx(True), full_shapes), 1))
  _record("f32_state_mb", round(_state_mb(_tx(False), full_shapes), 1))

  # Step time on the reduced fixture (identical code path, affordable
  # compile).
  params, grads = bench.device_fixture(True)
  _record("f32_step_reduced_ms",
          round(_step_ms(_tx(False), params, grads, rtt, k=16), 3))
  _record("quantized_step_reduced_ms",
          round(_step_ms(_tx(True), params, grads, rtt, k=16), 3))


if __name__ == "__main__":
  main()
