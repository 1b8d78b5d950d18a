"""Headline benchmark: full Shampoo optimizer step vs the upstream reference.

Measures the wall-clock of one complete distributed-Shampoo update (stats
EMA + batched inverse-pth-roots + grafted/preconditioned transform) on a
transformer-shaped parameter tree with block_size 128, preconditioning every
step (the hardest case), on whatever backend is available (TPU under the
driver).  The same fixture is run through google-research/precondition's
`distributed_shampoo` as the baseline; ``vs_baseline`` is the speedup
(baseline_time / our_time, >1 means faster).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

import jax

# Persist compiled executables across runs: the fixture's programs (ours +
# the upstream baseline's traced-exponent while_loops) cost ~20 min of XLA
# compile through the TPU tunnel but milliseconds to reload from cache.
if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def _param_tree(rng, small=False):
  """Transformer-ish tree: ~58.7M params, mixes blocked and small tensors.

  ``small`` (~2M params) is the CPU-fallback fixture: the upstream
  baseline's lowered program at full size is too large for LLVM's CPU
  backend (observed: thousands of 'LLVM compilation error: Cannot
  allocate memory' despite >100 GB free).
  """
  d, ff, vocab, layers = ((256, 1024, 2048, 2) if small
                          else (1024, 4096, 8192, 4))
  tree = {"embed": jnp.asarray(rng.randn(vocab, d) * 0.02, jnp.float32)}
  for i in range(layers):
    tree[f"blk{i}"] = {
        "qkv": jnp.asarray(rng.randn(d, 3 * d) * 0.02, jnp.float32),
        "out": jnp.asarray(rng.randn(d, d) * 0.02, jnp.float32),
        "ffn_in": jnp.asarray(rng.randn(d, ff) * 0.02, jnp.float32),
        "ffn_out": jnp.asarray(rng.randn(ff, d) * 0.02, jnp.float32),
        "norm": jnp.asarray(np.ones(d), jnp.float32),
    }
  return tree


HYPERS = dict(
    learning_rate=0.1,
    block_size=128,
    beta1=0.9,
    beta2=0.999,
    matrix_epsilon=1e-6,
    start_preconditioning_step=0,
    preconditioning_compute_steps=1,
    statistics_compute_steps=1,
)


def _fence(x) -> None:
  """Drain the device queue: 4-byte scalar readback.

  Through the remote-TPU tunnel `jax.block_until_ready` returns at
  enqueue, so a timing window "ended" with it still contains the
  *previous* window's executing work (queue cross-contamination between
  interleaved candidates — observed as run-to-run ratio swings).  Only a
  device->host readback truly waits; a scalar keeps the transfer cost at
  the ~30 ms round-trip floor.
  """
  leaf = jax.tree.leaves(x)[0]
  np.asarray(jnp.ravel(leaf)[0])


def _steps_program(tx):
  """One jitted program running k optimizer steps as a device-side loop.

  Dispatching steps one python call at a time measures the tunnel's
  enqueue pipeline, not the chip (a full step "measured" 60-80 ms that
  way; the honest number is ~an order of magnitude higher).  A
  `fori_loop` over the update keeps all k steps inside one program, so
  host/tunnel effects appear once, and the k=LOOP_ITERS vs k=1
  difference cancels that once too.
  """
  def run(state, k, grads, params):
    def body(_, st):
      _, st2 = tx.update(grads, st, params)
      return st2
    return jax.lax.fori_loop(0, k, body, state)

  return jax.jit(run)


LOOP_ITERS = 8


def _time_interleaved(runs, iters=LOOP_ITERS, rounds=4):
  """Min-of-interleaved-rounds per-step seconds for each candidate.

  The tunneled chip's throughput drifts on multi-second scales, so the
  candidates' rounds alternate (A B A B ...) instead of timing each one
  in its own window.  Each sample is (t[k=iters] - t[k=1]) / (iters-1),
  with a scalar-readback fence ending every window (block_until_ready
  returns at enqueue through the tunnel and must not be trusted).
  """
  prepared = {}
  for name, (tx, params, grads) in runs.items():
    run = _steps_program(tx)
    state = run(tx.init(params), 3, grads, params)  # compile + settle
    _fence(state)
    prepared[name] = (run, state)

  best = {name: float("inf") for name in runs}
  for _ in range(rounds):
    for name, (tx, params, grads) in runs.items():
      run, state = prepared[name]
      t0 = time.perf_counter()
      _fence(run(state, iters, grads, params))
      t_many = time.perf_counter() - t0
      t0 = time.perf_counter()
      _fence(run(state, 1, grads, params))
      t_one = time.perf_counter() - t0
      best[name] = min(best[name], max(t_many - t_one, 1e-9) / (iters - 1))
  return best


def main():
  # If the ambient TPU plugin's backend cannot initialize (tunnel outage),
  # fall back to CPU rather than crashing: a same-harness CPU comparison
  # still yields an honest vs_baseline (both sides run on the same
  # backend), just slower to produce.
  platform = None
  try:
    platform = jax.devices()[0].platform
  except Exception:
    jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform

  rng = np.random.RandomState(0)
  params = _param_tree(rng, small=platform == "cpu")
  grads = jax.tree.map(
      lambda p: jnp.asarray(rng.randn(*p.shape) * 0.01, jnp.float32), params)

  from precondition_tpu.optim import shampoo as ours

  # Probe-compile the fused Pallas solver on a tiny batch before trusting
  # it for the headline: a Mosaic lowering regression would otherwise
  # fail the whole artifact, and the XLA path is a correct (slower)
  # stand-in.
  solver_backend = "auto"
  if platform == "tpu":
    try:
      from precondition_tpu.ops.pallas import newton_root

      probe = jnp.eye(128, dtype=jnp.float32)[None] * 2.0
      jax.jit(lambda s: newton_root.batched_inverse_pth_root_pallas(
          s, 4, jnp.full((1,), 128, jnp.int32)))(probe)[0].block_until_ready()
    except Exception:
      solver_backend = "xla"

  # Metrics off on both sides for an apples-to-apples comparison (the
  # reference side below also disables them).
  ours_tx = ours.distributed_shampoo(
      **HYPERS, graft_type=ours.GraftingType.RMSPROP,
      generate_training_metrics=False, solver_backend=solver_backend)
  runs = {"ours": (ours_tx, params, grads)}

  # Warm-started re-solves (reuse_preconditioner): the recorded artifact
  # carries this alongside the like-for-like headline so the lever's
  # effect on the full step is visible, not just the kernel-level number
  # in KERNELS_TPU.json. (Settled fixture = best case: constant grads
  # mean the statistics barely drift between solves.)
  ours_warm_tx = ours.distributed_shampoo(
      **HYPERS, graft_type=ours.GraftingType.RMSPROP,
      generate_training_metrics=False, solver_backend=solver_backend,
      reuse_preconditioner=True)
  runs["ours_warmstart"] = (ours_warm_tx, params, grads)

  try:
    ref_path = "/root/reference"
    if os.path.isdir(ref_path) and ref_path not in sys.path:
      sys.path.append(ref_path)
    sys.dont_write_bytecode = True
    from precondition import distributed_shampoo as ref

    ref_tx = ref.distributed_shampoo(
        **HYPERS, graft_type=ref.GraftingType.RMSPROP,
        generate_training_metrics=False)
    runs["baseline"] = (ref_tx, params, grads)
  except Exception:
    pass

  # CPU fallback: fewer in-program iterations/rounds so the run finishes
  # within the driver's budget (the relative comparison stays fair).
  if platform == "cpu":
    best = _time_interleaved(runs, iters=3, rounds=2)
  else:
    best = _time_interleaved(runs)
  ours_time = best["ours"]
  baseline_time = best.get("baseline")

  result = {
      # Renamed from r01's "...17M..." (the tree is 58.7M params) and
      # re-measured with the in-program loop harness: r01's 62.974 ms was
      # tunnel enqueue rate, not chip time — values are not comparable
      # across rounds; `vs_baseline` (same-harness, interleaved) is.
      "metric": ("shampoo_step_time_2M_block128_cpufallback"
                 if platform == "cpu" else
                 "shampoo_step_time_58M_block128"),
      "value": round(ours_time * 1e3, 3),
      "unit": "ms",
      "vs_baseline": (round(baseline_time / ours_time, 3)
                      if baseline_time else None),
      "platform": platform,
  }
  warm_time = best.get("ours_warmstart")
  if warm_time:
    result["warmstart_ms"] = round(warm_time * 1e3, 3)
    result["warmstart_vs_baseline"] = (round(baseline_time / warm_time, 3)
                                       if baseline_time else None)
  # Per-kernel roofline numbers: measuring them live adds ~15 min of XLA
  # compile through the TPU tunnel, so by default attach the recorded
  # artifact from `benchmarks/kernel_breakdown.py` (committed after real
  # TPU runs); BENCH_BREAKDOWN=1 re-measures live.
  try:
    if os.environ.get("BENCH_BREAKDOWN"):
      from benchmarks import kernel_breakdown

      result["breakdown"] = kernel_breakdown.measure()
    else:
      path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "KERNELS_TPU.json")
      if os.path.exists(path):
        with open(path) as f:
          result["breakdown_recorded"] = json.load(f)
  except Exception as e:  # never lose the headline to a breakdown bug
    result["breakdown_error"] = repr(e)[:200]
  print(json.dumps(result))


if __name__ == "__main__":
  main()
