"""Headline benchmark: full Shampoo optimizer step vs the upstream reference.

Measures the wall-clock of one complete distributed-Shampoo update (stats
EMA + batched inverse-pth-roots + grafted/preconditioned transform) on a
transformer-shaped parameter tree with block_size 128 on whatever backend
is available (TPU under the driver).  The same fixture is run through
google-research/precondition's `distributed_shampoo` as the baseline;
``vs_baseline`` is the speedup (baseline_time / our_time, >1 = faster).

Two configurations:
  * headline: preconditioning every step (the hardest case; showcases the
    solver path end-to-end);
  * steady-state: ``preconditioning_compute_steps=10`` with warm-started
    re-solves (``reuse_preconditioner=True``) vs the same upstream
    ``preconditioning_compute_steps=10`` config — production Shampoo runs
    at 10-100 step solve intervals (reference guidance:
    `distributed_shampoo.py:1917-1928`).

Budget discipline (the round-2 artifact was lost to an external timeout):
every JAX call that can block — compiles above all; the fixture's programs
cost ~20 min of XLA compile through the TPU tunnel when the persistent
compile cache is cold — runs on a worker thread while the main thread
enforces ``BENCH_DEADLINE`` seconds (default 840).  Results are recorded
incrementally; on deadline or SIGTERM the best-known partial result is
printed and the process exits.  Phases run in strict priority order
(headline pair, steady-state pair, optional warm-start lever) so a
truncated run still lands the headline.

Prints exactly one JSON line.
"""

import concurrent.futures
import json
import os
import signal
import sys
import threading
import time

import numpy as np

import jax

# Persist compiled executables across runs: the fixture's programs (ours +
# the upstream baseline's traced-exponent while_loops) cost ~20 min of XLA
# compile through the TPU tunnel but milliseconds to reload from cache.
# The cache directory persists in the workspace (gitignored — entries are
# hundreds of MB and keyed to the exact jax build) so a driver bench after
# a validation run starts warm; it is NOT load-bearing: the deadline
# machinery below keeps a cold run inside the budget by truncating phases.
if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

# ----------------------------------------------------------------- budget --
_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", 840))
_FINALIZE_MARGIN_S = 8.0
_RESULT = {}  # best-known partial result; finalized exactly once
_EMITTED = threading.Lock()


def _remaining() -> float:
  return _DEADLINE_S - (time.monotonic() - _T0)


def _finalize(code=0):
  """Print the single JSON line (once) and hard-exit."""
  if not _EMITTED.acquire(blocking=False):  # someone else is printing
    time.sleep(30)
    os._exit(code)
  _RESULT.setdefault("vs_baseline", None)
  _RESULT["elapsed_s"] = round(time.monotonic() - _T0, 1)
  print(json.dumps(_RESULT))
  sys.stdout.flush()
  os._exit(code)


def _on_term(signum, frame):
  _RESULT["interrupted_by"] = f"signal {signum}"
  _finalize(0)


# Installed from main(), NOT at import: other tools (benchmarks/
# profile_step.py) import this module for the fixture/hypers, and an
# import-time handler would hijack THEIR shutdown — observed: a timeout's
# SIGTERM to profile_step printed bench's JSON line and exited 0, masking
# the timeout.
_POOL = concurrent.futures.ThreadPoolExecutor(max_workers=1)


def _install_budget_handlers():
  signal.signal(signal.SIGTERM, _on_term)
  signal.signal(signal.SIGINT, _on_term)


def _guarded(label, fn, *args):
  """Run fn on the worker thread; emit-and-exit if the deadline lands.

  A blocked XLA compile is a C call that Python signal handlers cannot
  interrupt, so the deadline must be enforced from *outside* the call:
  the main thread waits with a timeout and finalizes the artifact if the
  work does not return in time.
  """
  fut = _POOL.submit(fn, *args)
  try:
    return fut.result(timeout=max(_remaining() - _FINALIZE_MARGIN_S, 1.0))
  except concurrent.futures.TimeoutError:
    _RESULT["truncated_in"] = label
    _finalize(0)


# ---------------------------------------------------------------- fixture --
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
    statistics_compute_steps=1,
)


def make_ours(solver_backend="auto", **kw):
  from precondition_tpu.optim import shampoo as ours

  return ours.distributed_shampoo(
      **HYPERS, graft_type=ours.GraftingType.RMSPROP,
      generate_training_metrics=False, solver_backend=solver_backend, **kw)


def make_baseline(**kw):
  ref_path = "/root/reference"
  if os.path.isdir(ref_path) and ref_path not in sys.path:
    sys.path.append(ref_path)
  sys.dont_write_bytecode = True
  from precondition import distributed_shampoo as ref

  return ref.distributed_shampoo(
      **HYPERS, graft_type=ref.GraftingType.RMSPROP,
      generate_training_metrics=False, **kw)


# The five candidate configurations, in bench phase order.
CANDIDATE_TXS = {
    "ours": lambda sb: make_ours(sb, preconditioning_compute_steps=1),
    "baseline": lambda sb: make_baseline(preconditioning_compute_steps=1),
    "ours_steady": lambda sb: make_ours(
        sb, preconditioning_compute_steps=10, reuse_preconditioner=True),
    "baseline_steady": lambda sb: make_baseline(
        preconditioning_compute_steps=10),
    "ours_warmstart": lambda sb: make_ours(
        sb, preconditioning_compute_steps=1, reuse_preconditioner=True),
}


def _prewarm_compiles(solver_backend):
  """Start AOT compiles of every candidate program on daemon threads.

  Cold-cache protection: each candidate's program costs ~15-25 min of XLA
  compile through the TPU tunnel, and the phases would otherwise pay them
  *serially* inside their prepare steps.  The compiles execute on the
  PJRT server, so firing all five up front overlaps them: a cold run pays
  ~max(compile) instead of the sum, and every finished compile lands in
  the persistent cache for the phase (or the next bench run) to reuse.
  Shapes come from `eval_shape`, so prewarm moves no data to the device;
  with a warm cache each thread is a cache hit in milliseconds.
  """
  def _one(name):
    try:
      tx = CANDIDATE_TXS[name](solver_backend)
      rng = np.random.RandomState(0)
      shapes = jax.eval_shape(lambda: _param_tree(rng))
      state = jax.eval_shape(tx.init, shapes)
      # k=8 is a concrete python int so it traces exactly like the
      # measurement call sites (weak-typed i32 -> identical cache key).
      _steps_program(tx).lower(state, 8, shapes, shapes).compile()
    except Exception:
      pass  # a failed prewarm only forfeits the overlap

  for name in CANDIDATE_TXS:
    threading.Thread(target=_one, args=(name,), daemon=True).start()


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
  host/tunnel effects appear once, and the k=iters vs k=1 difference
  cancels that once too.  ``k`` is a traced argument: every window size
  reuses the same compiled executable.
  """
  def run(state, k, grads, params):
    def body(_, st):
      _, st2 = tx.update(grads, st, params)
      return st2
    return jax.lax.fori_loop(0, k, body, state)

  return jax.jit(run)


class _Candidate:
  """A compiled optimizer-step program plus its settled state."""

  def __init__(self, name, tx, params, grads, settle_steps):
    self.name = name
    self.params, self.grads = params, grads
    self.run = _steps_program(tx)
    state = self.run(tx.init(params), settle_steps, grads, params)
    _fence(state)
    self.state = state

  def sample(self, iters):
    """One (t[k=iters] - t[k=1]) / (iters-1) per-step seconds sample."""
    t0 = time.perf_counter()
    _fence(self.run(self.state, iters, self.grads, self.params))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fence(self.run(self.state, 1, self.grads, self.params))
    t_one = time.perf_counter() - t0
    return max(t_many - t_one, 1e-9) / (iters - 1)


def _measure_pair(candidates, iters, rounds, record):
  """Min-of-interleaved-rounds per-step seconds for each candidate.

  The tunneled chip's throughput drifts on multi-second scales, so the
  candidates' rounds alternate (A B A B ...) instead of timing each one
  in its own window.  ``record(best)`` runs after every round so a
  deadline cut mid-measurement still emits the best-known numbers.
  """
  best = {c.name: float("inf") for c in candidates}
  for rnd in range(rounds):
    for c in candidates:
      best[c.name] = min(
          best[c.name],
          _guarded(f"measure:{c.name}:round{rnd}", c.sample, iters))
    record(best)
    # A further round refines the min; only start one if there is slack.
    if _remaining() < _FINALIZE_MARGIN_S + 15.0:
      return best
  return best


def main():
  _install_budget_handlers()
  # If the ambient TPU plugin's backend cannot initialize (tunnel outage),
  # fall back to CPU rather than crashing: a same-harness CPU comparison
  # still yields an honest vs_baseline (both sides run on the same
  # backend), just slower to produce.
  def _probe_platform():
    try:
      return jax.devices()[0].platform
    except Exception:
      jax.config.update("jax_platforms", "cpu")
      return jax.devices()[0].platform

  platform = _guarded("device_probe", _probe_platform)
  cpu = platform == "cpu"

  rng = np.random.RandomState(0)
  params = _param_tree(rng, small=cpu)
  grads = jax.tree.map(
      lambda p: jnp.asarray(rng.randn(*p.shape) * 0.01, jnp.float32), params)

  # Probe-compile the fused Pallas solver on a tiny batch before trusting
  # it for the headline: a Mosaic lowering regression would otherwise
  # fail the whole artifact, and the XLA path is a correct (slower)
  # stand-in.
  solver_backend = "auto"
  if platform == "tpu":
    def _probe_pallas():
      from precondition_tpu.ops.pallas import newton_root

      probe = jnp.eye(128, dtype=jnp.float32)[None] * 2.0
      jax.jit(lambda s: newton_root.batched_inverse_pth_root_pallas(
          s, 4, jnp.full((1,), 128, jnp.int32)))(probe)[0].block_until_ready()
    try:
      _guarded("pallas_probe", _probe_pallas)
    except Exception:
      solver_backend = "xla"

  _RESULT.update({
      # Renamed from r01's "...17M..." (the tree is 58.7M params) and
      # re-measured with the in-program loop harness: r01's 62.974 ms was
      # tunnel enqueue rate, not chip time — values are not comparable
      # across rounds; `vs_baseline` (same-harness, interleaved) is.
      "metric": ("shampoo_step_time_2M_block128_cpufallback" if cpu
                 else "shampoo_step_time_58M_block128"),
      "value": None,
      "unit": "ms",
      "vs_baseline": None,
      "platform": platform,
      "deadline_s": _DEADLINE_S,
  })

  def _make_ours(**kw):
    return make_ours(solver_backend, **kw)

  def _make_baseline(**kw):
    return make_baseline(**kw)

  # Overlap all five candidate compiles from the start (no-op when warm).
  # TPU only: prewarm uses the full-size fixture, whose lowered programs
  # the LLVM CPU backend cannot even allocate (see `_param_tree`).
  if not cpu:
    _prewarm_compiles(solver_backend)

  # CPU fallback: fewer in-program iterations/rounds so the run finishes
  # within the budget (the relative comparison stays fair).
  head_iters, head_rounds = (3, 2) if cpu else (8, 4)

  # ---- Phase 1: headline pair (solve every step, cold solver path). ----
  # Metrics are off on both sides for an apples-to-apples comparison.
  pair = [_guarded(
      "prepare:ours",
      lambda: _Candidate("ours", _make_ours(preconditioning_compute_steps=1),
                         params, grads, settle_steps=3))]
  try:
    baseline_tx = _make_baseline(preconditioning_compute_steps=1)
  except Exception:
    baseline_tx = None
  if baseline_tx is not None:
    pair.append(_guarded(
        "prepare:baseline",
        lambda: _Candidate("baseline", baseline_tx, params, grads,
                           settle_steps=3)))

  def _record_headline(best):
    _RESULT["value"] = round(best["ours"] * 1e3, 3)
    if "baseline" in best and np.isfinite(best["baseline"]):
      _RESULT["baseline_ms"] = round(best["baseline"] * 1e3, 3)
      _RESULT["vs_baseline"] = round(best["baseline"] / best["ours"], 3)

  _measure_pair(pair, head_iters, head_rounds, _record_headline)

  # ---- Phase 2: steady-state pair (solve every 10 steps, warm). --------
  # Window of 10 consecutive counts contains exactly one solve regardless
  # of the settled state's phase, so iters=11 measures the amortized
  # steady-state step honestly.  settle_steps=21 passes >= 2 solve cycles
  # so `reuse_preconditioner` warm starts see genuinely warm roots.
  steady_iters, steady_rounds = (11, 1) if cpu else (11, 3)
  if _remaining() > _FINALIZE_MARGIN_S + 30.0:
    # A failure in an optional phase must not cost the already-recorded
    # headline: record the error and emit what exists.
    try:
      steady = [_guarded(
          "prepare:ours_steady",
          lambda: _Candidate(
              "ours_steady",
              _make_ours(preconditioning_compute_steps=10,
                         reuse_preconditioner=True),
              params, grads, settle_steps=21))]
      if baseline_tx is not None:
        steady.append(_guarded(
            "prepare:baseline_steady",
            lambda: _Candidate(
                "baseline_steady",
                _make_baseline(preconditioning_compute_steps=10),
                params, grads, settle_steps=21)))

      def _record_steady(best):
        _RESULT["steady_ms"] = round(best["ours_steady"] * 1e3, 3)
        if ("baseline_steady" in best
            and np.isfinite(best["baseline_steady"])):
          _RESULT["steady_baseline_ms"] = round(
              best["baseline_steady"] * 1e3, 3)
          _RESULT["steady_vs_baseline"] = round(
              best["baseline_steady"] / best["ours_steady"], 3)
        _RESULT["steady_note"] = (
            "preconditioning_compute_steps=10, ours with "
            "reuse_preconditioner warm re-solves; constant-gradient "
            "fixture (statistics settle, so warm starts are near best "
            "case)")

      _measure_pair(steady, steady_iters, steady_rounds, _record_steady)
    except Exception as e:
      _RESULT["steady_error"] = repr(e)[:300]

  # ---- Phase 3 (optional): warm-start lever at solve-every-step. -------
  # Skipped by default on CPU and when the budget is tight; set
  # BENCH_WARMSTART=0 to disable outright.
  if (os.environ.get("BENCH_WARMSTART", "1") != "0" and not cpu
      and _remaining() > _FINALIZE_MARGIN_S + 30.0):
    try:
      warm = [_guarded(
          "prepare:ours_warmstart",
          lambda: _Candidate(
              "ours_warmstart",
              _make_ours(preconditioning_compute_steps=1,
                         reuse_preconditioner=True),
              params, grads, settle_steps=3))]

      def _record_warm(best):
        _RESULT["warmstart_bestcase_ms"] = round(
            best["ours_warmstart"] * 1e3, 3)
        _RESULT["warmstart_note"] = (
            "reuse_preconditioner at solve-every-step on the settled "
            "constant-gradient fixture: statistics barely drift between "
            "solves, so this is the lever's best case, not a typical "
            "training speedup")

      _measure_pair(warm, head_iters, max(head_rounds - 2, 1), _record_warm)
    except Exception as e:
      _RESULT["warmstart_error"] = repr(e)[:300]

  # Per-kernel roofline numbers: measuring them live adds ~15 min of XLA
  # compile through the TPU tunnel, so attach the recorded artifact from
  # `benchmarks/kernel_breakdown.py` (committed after real TPU runs).
  try:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "KERNELS_TPU.json")
    if os.path.exists(path):
      with open(path) as f:
        _RESULT["breakdown_recorded"] = json.load(f)
  except Exception as e:  # never lose the headline to a breakdown bug
    _RESULT["breakdown_error"] = repr(e)[:200]
  _finalize(0)


if __name__ == "__main__":
  try:
    main()
  except Exception as e:  # never die without the one JSON line
    _RESULT["error"] = repr(e)[:500]
    _finalize(0)
