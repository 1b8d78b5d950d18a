"""Decompose the Shampoo step time: statistics vs root solve vs transform.

Run on TPU:  python benchmarks/profile_step.py [--trace_dir /tmp/xprof]

All timings use the in-program ``lax.fori_loop`` harness with a scalar
device->host readback fence (see ``benchmarks/kernel_breakdown.py``):
through the remote-TPU tunnel ``jax.block_until_ready`` returns at enqueue,
so naive repeated-call timing measures the dispatch pipeline, not the chip.

With ``--trace_dir`` the full-step section runs under ``jax.profiler.trace``;
the captured trace labels HLO with the library's `jax.named_scope`
annotations (ShampooStatistics / ShampooRootSolve / ShampooPrecondition /
PowerIteration / CoupledNewton / LOBPCGDeflation) for xprof/TensorBoard
(SURVEY §5's tracing contract).
"""

import contextlib
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Allow `python benchmarks/profile_step.py` without PYTHONPATH games: the
# interpreter puts benchmarks/ (the script dir) on sys.path, not the repo
# root that holds the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from precondition_tpu.ops import pth_root
from precondition_tpu.optim import shampoo

from benchmarks.kernel_breakdown import _rtt, _sync, _timeit_loop


def _maybe_trace():
  if "--trace_dir" in sys.argv:
    trace_dir = sys.argv[sys.argv.index("--trace_dir") + 1]
    return jax.profiler.trace(trace_dir)
  return contextlib.nullcontext()


def _step_ms(tx, params, grads, rtt, k=8, settle_steps=2):
  """Per-step ms of ``tx.update`` as a device-side loop after settling.

  ``settle_steps`` runs the update outside the timed loop first so
  count-dependent behavior (initial solves, warmup switches) lands in a
  steady state before measurement.

  ``params``/``grads`` are threaded as jit ARGUMENTS, never closure
  captures: closed-over arrays bake into the program as constants, and a
  58.7M-param tree of constants blew the serialized executable up to
  2.9 GB (~15 min to ship through the TPU tunnel per cache load) and the
  compile into the tens of minutes.  As arguments the same program is
  ~40 MB (observed on the bench harness, which always did it this way).
  The iteration count is traced too, so settling and every timing window
  share ONE compiled program per optimizer (bench.py's `_steps_program`
  pattern), and the k-vs-1 subtraction cancels the tunnel round-trip.
  """

  def body(_, carry):
    st, g, p = carry
    _, st2 = tx.update(g, st, p)
    return (st2, g, p)

  run = jax.jit(
      lambda st, kk, g, p: lax.fori_loop(0, kk, body, (st, g, p))[0])
  state = run(tx.init(params), settle_steps, grads, params)
  _sync(jax.tree.leaves(state))

  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    _sync(run(state, k, grads, params))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(run(state, 1, grads, params))
    t_one = time.perf_counter() - t0
    best = min(best, max(t_many - t_one, 1e-9) / (k - 1))
  return best * 1e3


def main():
  rng = np.random.RandomState(0)
  rtt = _rtt()
  small = bool(os.environ.get("PROFILE_SMALL"))  # CPU smoke of the harness
  n, m = (24, 16) if small else (712, 128)  # bench fixture: blocks x size

  artifact = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "STEP_BREAKDOWN_TPU.json")

  # --sections a,b,c re-measures only the named keys, merging into the
  # existing artifact (every timing program's iteration count is traced,
  # so re-runs are persistent-cache hits, not recompiles).
  only = None
  if "--sections" in sys.argv:
    only = set(sys.argv[sys.argv.index("--sections") + 1].split(","))
  out = {"tunnel_rtt_ms": round(rtt * 1e3, 1)}
  if only and os.path.exists(artifact) and not small:
    with open(artifact) as f:
      prev = json.load(f)
    prev.update(out)
    out = prev

  def _want(key):
    return only is None or key in only

  def _record(key, val):
    """Record one measurement and checkpoint the artifact immediately.

    Each section behind this point costs minutes of XLA compile through
    the TPU tunnel; an external timeout mid-run must not lose the
    sections already measured (the lesson of the round-2 bench artifact).
    """
    out[key] = val
    if not small:  # recorded artifact only for the real fixture
      with open(artifact, "w") as f:
        json.dump(out, f, indent=1)

  stats = jnp.asarray(rng.randn(n, m, m), jnp.float32)
  stats = jnp.einsum("nij,nkj->nik", stats, stats) / m  # PSD batch
  pads = jnp.full((n,), m, jnp.int32)

  def solve_body(_, carry):
    r, _ = pth_root.batched_inverse_pth_root(stats + 1e-30 * carry, 4, pads)
    return r

  if _want("newton_solve_ms"):
    t_solve = _timeit_loop(solve_body, jnp.zeros_like(stats), k=4, rtt=rtt)
    _record("newton_solve_ms", round(t_solve * 1e3, 2))
    print(f"newton solve [{n},{m},{m}]: {out['newton_solve_ms']:.2f} ms")

  def eigh_body(_, carry):
    r, _ = pth_root.batched_inverse_pth_root(
        stats + 1e-30 * carry, 4, pads, eigh=True)
    return r

  if _want("eigh_solve_ms"):
    t_eigh = _timeit_loop(eigh_body, jnp.zeros_like(stats), k=4, rtt=rtt)
    _record("eigh_solve_ms", round(t_eigh * 1e3, 2))
    print(f"eigh solve: {out['eigh_solve_ms']:.2f} ms")

  # Statistics contraction (gram updates) on the full fixture batch.
  g = jnp.asarray(rng.randn(n, m, m), jnp.float32)
  s0 = jnp.zeros((n, m, m), jnp.float32)

  def gram_body(_, s):
    # Carry coupling prevents XLA hoisting the loop-invariant einsum out
    # of the timed fori_loop; k keeps the loop well above the ~30 ms
    # tunnel RTT being subtracted (see kernel_breakdown.py).
    gg = g * (1.0 + 1e-30 * s)
    return 0.999 * s + 0.001 * jnp.einsum(
        "nij,nkj->nik", gg, gg, precision=lax.Precision.HIGHEST)

  if _want("gram_update_ms"):
    t_gram = _timeit_loop(gram_body, s0, k=256, rtt=rtt)
    _record("gram_update_ms", round(t_gram * 1e3, 3))
    print(f"gram update [{n},{m},{m}]: {out['gram_update_ms']:.3f} ms")

  # Full optimizer step vs its solve-free and stats-free ablations.
  import bench
  if small:
    params = {"w": jnp.asarray(rng.randn(32, 48), jnp.float32),
              "b": jnp.asarray(rng.randn(48), jnp.float32)}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape) * 0.01, jnp.float32),
        params)
  else:
    # Device-side PRNG materialization (see bench.device_fixture): skips
    # the ~470 MB params+grads transfer through the TPU tunnel.
    params, grads = bench.device_fixture(False)

  if _want("full_step_ms"):
    tx = shampoo.distributed_shampoo(
        **bench.HYPERS, graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False)
    with _maybe_trace():  # named_scope-labelled xprof capture of the step
      _record("full_step_ms", round(_step_ms(tx, params, grads, rtt), 2))
    print(f"full step: {out['full_step_ms']:.2f} ms")

  if _want("full_step_warmstart_ms"):
    tx_warm = shampoo.distributed_shampoo(
        **bench.HYPERS, graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False, reuse_preconditioner=True)
    _record("full_step_warmstart_ms",
            round(_step_ms(tx_warm, params, grads, rtt), 2))
    print(f"full step (warm-started solves): "
          f"{out['full_step_warmstart_ms']:.2f} ms")

  # Production steady state: solve every 10 steps with warm re-solves
  # (reference guidance `distributed_shampoo.py:1915-1922`).  settle=20
  # aligns the timed window on a solve-step boundary; k=31 then spans
  # counts 20..50 vs 20, i.e. exactly 30 steps containing 3 solves —
  # the honest 1-in-10 amortized step.
  if _want("steady_step_ms"):
    tx_steady = shampoo.distributed_shampoo(
        **{**bench.HYPERS, "preconditioning_compute_steps": 10},
        graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False, reuse_preconditioner=True)
    _record("steady_step_ms",
            round(_step_ms(tx_steady, params, grads, rtt, k=31,
                           settle_steps=20), 3))
    print(f"steady step (interval 10, warm): "
          f"{out['steady_step_ms']:.3f} ms")

  # Solve gated off: preconditioning_compute_steps huge, settled past the
  # count=0 solve. What remains is stats EMA + grafting + transform.
  if _want("step_without_solve_ms"):
    tx2 = shampoo.distributed_shampoo(
        **{**bench.HYPERS, "preconditioning_compute_steps": 1000},
        graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False)
    _record("step_without_solve_ms",
            round(_step_ms(tx2, params, grads, rtt, k=32), 2))
    print(f"step without solve: {out['step_without_solve_ms']:.2f} ms")

  # Stats also gated off: grafting + transform + bookkeeping only.
  if _want("step_transform_only_ms"):
    # k=256: this program is sub-ms per step; at k=8 the timing window
    # sat under the tunnel RTT and recorded a literal 0.0.
    tx3 = shampoo.distributed_shampoo(
        **{**bench.HYPERS, "preconditioning_compute_steps": 1000,
           "statistics_compute_steps": 1000},
        graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False)
    _record("step_transform_only_ms",
            round(_step_ms(tx3, params, grads, rtt, k=256), 3))
    print(f"step transform-only: {out['step_transform_only_ms']:.3f} ms")

  # Quantized optimizer state (best_effort_memory_usage_reduction: int8
  # momenta, int16+diagonal statistics/roots — the reference's entire
  # motivation for the quantized path,
  # `distributed_shampoo.py:3012-3281`): step time on TPU plus the exact
  # optimizer-state HBM footprint vs the f32 state.
  if _want("quantized_step_ms"):
    txq = shampoo.distributed_shampoo(
        **bench.HYPERS, graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False,
        best_effort_memory_usage_reduction=True)
    _record("quantized_step_ms", round(_step_ms(txq, params, grads, rtt), 2))

    def _state_mb(tx_):
      shapes = jax.eval_shape(tx_.init, params)
      return sum(
          int(np.prod(l.shape)) * l.dtype.itemsize
          for l in jax.tree.leaves(shapes)) / 1e6

    txf = shampoo.distributed_shampoo(
        **bench.HYPERS, graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False)
    _record("quantized_state_mb", round(_state_mb(txq), 1))
    _record("f32_state_mb", round(_state_mb(txf), 1))
    print(f"quantized step: {out['quantized_step_ms']:.2f} ms; state "
          f"{out['quantized_state_mb']:.0f} MB vs f32 "
          f"{out['f32_state_mb']:.0f} MB")

  # Secondary fixtures: block-256 Shampoo (the "increase block size with
  # compute budget" knob) and the tearfree stack on the same tree.
  if _want("full_step_block256_ms"):
    tx4 = shampoo.distributed_shampoo(
        **{**bench.HYPERS, "block_size": 256},
        graft_type=shampoo.GraftingType.RMSPROP,
        generate_training_metrics=False)
    _record("full_step_block256_ms",
            round(_step_ms(tx4, params, grads, rtt), 2))
    print(f"full step block 256: {out['full_step_block256_ms']:.2f} ms")

  from precondition_tpu.tearfree import optimizer as tearfree_opt
  from precondition_tpu.tearfree import second_order, shampoo as tf_shampoo

  def _tearfree_tx(backend):
    return tearfree_opt.tearfree(
        learning_rate=0.1,
        options=tearfree_opt.TearfreeOptions(
            second_order_options=second_order.Options(
                shampoo_options=tf_shampoo.Options(
                    block_size=128, update_preconditioners_freq=1,
                    update_statistics_freq=1, solver_backend=backend))))

  # Default backend ("auto": the filtered projector x Newton root on TPU,
  # eigh elsewhere) — the number a tearfree user gets out of the box.
  if _want("tearfree_step_ms"):
    _record("tearfree_step_ms",
            round(_step_ms(_tearfree_tx("auto"), params, grads, rtt), 2))
    print(f"tearfree step (default/auto): {out['tearfree_step_ms']:.2f} ms")

  # Explicit eigh: the upstream-parity factorization backend.
  if _want("tearfree_step_eigh_ms"):
    _record("tearfree_step_eigh_ms",
            round(_step_ms(_tearfree_tx("eigh"), params, grads, rtt), 2))
    print(f"tearfree step (eigh solver): "
          f"{out['tearfree_step_eigh_ms']:.2f} ms")

  # Same stack with the opt-in coupled-Newton blocked-root solver
  # (tearfree/shampoo.py Options.solver_backend='newton'): quantifies the
  # eigh -> Newton swap at the step level, not just the solver microbench.
  if _want("tearfree_step_newton_ms"):
    _record("tearfree_step_newton_ms",
            round(_step_ms(_tearfree_tx("newton"), params, grads, rtt), 2))
    print(f"tearfree step (newton solver): "
          f"{out['tearfree_step_newton_ms']:.2f} ms")

  _record("solve_share_ms", round(
      out["full_step_ms"] - out["step_without_solve_ms"], 2))
  _record("stats_share_ms", round(
      out["step_without_solve_ms"] - out["step_transform_only_ms"], 2))
  if out["stats_share_ms"] < 0:
    # Reproducible on TPU: gating the statistics off makes the step
    # SLOWER — the lazily-gated branch must pass every stacked [N,m,m]
    # statistics buffer through unchanged (an HBM copy XLA cannot elide
    # across the cond), which costs more than the fused gram EMA it
    # skips.  The true statistics cost is bounded by gram_update_ms per
    # uniform group; the negative difference is gating overhead, not a
    # negative share.
    _record("stats_share_note",
            "negative = lazy-cond pass-through copy of stacked stats "
            "outweighs the fused gram EMA; true stats cost ~ "
            "gram_update_ms per group")
  print(json.dumps(out))


if __name__ == "__main__":
  main()
