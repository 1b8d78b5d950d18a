"""Headline benchmark: full Shampoo optimizer step vs the upstream reference.

Measures the wall-clock of one complete distributed-Shampoo update (stats
EMA + batched inverse-pth-roots + grafted/preconditioned transform) on a
transformer-shaped parameter tree with block_size 128 on whatever backend
is available (TPU under the driver).  The same fixture is run through
google-research/precondition's `distributed_shampoo` as the baseline;
``vs_baseline`` is the speedup (baseline_time / our_time, >1 = faster).

Configurations:
  * headline: preconditioning every step (the hardest case; showcases the
    solver path end-to-end);
  * steady-state: ``preconditioning_compute_steps=10`` with warm-started
    re-solves (``reuse_preconditioner=True``) vs the same upstream
    ``preconditioning_compute_steps=10`` config — production Shampoo runs
    at 10-100 step solve intervals (reference guidance:
    `distributed_shampoo.py:1917-1928`).

Budget discipline — the rounds 2 and 3 driver artifacts were both lost to
cold-cache XLA compiles (one full-fixture program costs ~13-25 min through
the remote-TPU tunnel; the driver deadline is 840 s), and a rehearsal of
an "overlap the compiles" design starved anyway: the PJRT server
SERIALIZES compiles and blocks other RPCs behind them (five concurrent
full-fixture compiles completed at cumulative 753/1472/1796/2528/3305 s).
So the harness runs in strict priority order with nothing ever queued
behind a compile the current phase does not need:

  1. Compile + measure the REDUCED fixture pair (persistent-cache hits in
     seconds when warm; ~4 min of serialized server compile cold) and
     emit it as the headline (``fixture: "reduced"``) — the artifact now
     cannot be null.
  2. Only then submit the FULL fixture pair; if it lands (instant when
     warm, impossible cold) measure it and upgrade the headline
     (``fixture: "full"``; the reduced numbers move to ``reduced_*``).
  3. Optional steady-state / warm-start phases afterwards.

Every blocking step runs behind a deadline guard; results are recorded
incrementally; on deadline or SIGTERM the best-known partial result is
printed.  `benchmarks/warm_bench_cache.py --verify` asserts (as the last
TPU act of a round) that every program here is a warm cache hit.

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
# the upstream baseline's traced-exponent while_loops) cost ~15-25 min of
# XLA compile through the TPU tunnel but seconds to reload from cache.
# The cache directory persists in the workspace (gitignored — entries are
# tens of MB and keyed to the exact jax build) so a driver bench after a
# validation run starts warm; it is NOT load-bearing: the reduced-fixture
# path below keeps a cold run inside the budget.
if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The ambient TPU environment's sitecustomize registers the axon plugin
# in every interpreter; an explicit JAX_PLATFORMS=cpu (CI, tunnel outage)
# only wins if ALSO pinned through jax.config after import.
if os.environ.get("JAX_PLATFORMS") == "cpu":
  jax.config.update("jax_platforms", "cpu")

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
# profile_step.py, warm_bench_cache.py) import this module for the
# fixture/hypers, and an import-time handler would hijack THEIR shutdown.
_POOL = concurrent.futures.ThreadPoolExecutor(max_workers=1)
# Separate pool for AOT compiles so a stuck compile can never block the
# serialized guarded steps (and vice versa).
_COMPILE_POOL = concurrent.futures.ThreadPoolExecutor(max_workers=8)


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

  ``small`` (~2M params) is the reduced fixture: same block size, same
  tensor roles (embedding, attention, FFN, norm), every matrix still
  blocked at 128 — so the per-step program exercises the same code paths
  — but with a block census whose XLA compile measurably fits the driver
  budget cold.  It doubles as the CPU-fallback fixture: the upstream
  baseline's lowered program at full size is too large for LLVM's CPU
  backend (observed: thousands of 'LLVM compilation error: Cannot
  allocate memory' despite >100 GB free).
  """
  if os.environ.get("BENCH_TEST_TINY_FIXTURE"):
    # CI hook (tests/test_bench_harness.py): shrink both fixtures so the
    # warm/cold dispatch logic can be driven end-to-end on CPU in seconds.
    d, ff, vocab, layers = (8, 16, 32, 1) if small else (16, 32, 64, 1)
  else:
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


def device_fixture(small):
  """(params, grads) for one fixture size, materialized ON DEVICE.

  One jitted PRNG program instead of a host-side numpy tree: the full
  fixture is ~235 MB of params + 235 MB of grads, and shipping it
  through the TPU tunnel used to delay the full-fixture phase; the
  values are random fixture content, so generating them on-chip is
  equivalent and costs milliseconds.
  """
  rng = np.random.RandomState(0)
  tree_shapes = jax.eval_shape(lambda: _param_tree(rng, small=small))
  shapes, treedef = jax.tree.flatten(tree_shapes)

  @jax.jit
  def gen(key):
    keys = jax.random.split(key, 2 * len(shapes))
    params = [0.02 * jax.random.normal(k, s.shape, s.dtype)
              for k, s in zip(keys[:len(shapes)], shapes)]
    grads = [0.01 * jax.random.normal(k, s.shape, s.dtype)
             for k, s in zip(keys[len(shapes):], shapes)]
    return (jax.tree.unflatten(treedef, params),
            jax.tree.unflatten(treedef, grads))

  params, grads = gen(jax.random.PRNGKey(0))
  _fence(params)
  return params, grads


HYPERS = dict(
    learning_rate=0.1,
    block_size=128,
    beta1=0.9,
    beta2=0.999,
    matrix_epsilon=1e-6,
    start_preconditioning_step=0,
    statistics_compute_steps=1,
)


_IMPORT_LOCK = threading.Lock()


def _ensure_packages_imported():
  """Serialize the first full package inits across worker threads.

  ``precondition_tpu/__init__`` imports ``optim.shampoo``;  importing
  ``ops.pallas.newton_root`` initializes the same package.  When two
  worker threads perform these first-imports concurrently one can
  observe the other's partially initialized module and raise (observed
  in a TPU rehearsal: the Pallas probe's "circular import" ImportError
  flipped a healthy run onto the XLA solver path).  One serial init
  under a lock makes every later threaded import a sys.modules hit.
  The upstream package has the same ``__init__`` -> submodule shape, so
  it is pre-imported here too.
  """
  with _IMPORT_LOCK:
    import precondition_tpu  # noqa: F401
    from precondition_tpu.ops.pallas import newton_root  # noqa: F401

    ref_path = "/root/reference"
    if os.path.isdir(ref_path):
      if ref_path not in sys.path:
        sys.path.append(ref_path)
      sys.dont_write_bytecode = True
      try:
        import precondition  # noqa: F401
      except ImportError:
        pass


def make_ours(solver_backend="auto", **kw):
  _ensure_packages_imported()
  from precondition_tpu.optim import shampoo as ours

  return ours.distributed_shampoo(
      **HYPERS, graft_type=ours.GraftingType.RMSPROP,
      generate_training_metrics=False, solver_backend=solver_backend, **kw)


def make_baseline(**kw):
  _ensure_packages_imported()
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


def _init_program(tx):
  """Jitted optimizer init: one compiled program instead of hundreds of
  eager per-block ops, each a tunnel round trip."""
  return jax.jit(tx.init)


def aot_compile(name, solver_backend, small):
  """Trace + AOT-compile one candidate's init and k-step programs.

  `eval_shape` keeps it device-data-free; the compiles execute on the
  PJRT server and land in the persistent cache.  Shared by bench.py's
  compile futures and benchmarks/warm_bench_cache.py (identical jaxprs
  -> identical keys).

  Returns ``(tx, compiled_init, compiled_run)`` — the EXECUTABLES, not
  just the transform: a fresh ``jax.jit`` in the measurement phase would
  re-lower and re-load the (multi-hundred-MB for the upstream baseline)
  serialized executable through the tunnel a second time, which is what
  ate the round-5 rehearsal's full-fixture budget (prepare:baseline
  >600 s after the compiles had already "landed").  ``_Candidate`` calls
  these compiled objects directly; ``k`` is a traced argument, so one
  executable serves every window size.
  """
  if os.environ.get("BENCH_TEST_SLOW_COMPILE") == "full" and not small:
    # CI hook: simulate a cold-cache full-fixture compile that cannot
    # finish inside the driver budget (the round-2/3 failure mode).
    time.sleep(10_000)
  tx = CANDIDATE_TXS[name](solver_backend)
  rng = np.random.RandomState(0)
  shapes = jax.eval_shape(lambda: _param_tree(rng, small=small))
  state_shapes = jax.eval_shape(tx.init, shapes)
  compiled_init = _init_program(tx).lower(shapes).compile()
  # k=8 is a concrete python int so it traces exactly like the
  # measurement call sites (weak-typed i32 -> identical cache key).
  compiled_run = _steps_program(tx).lower(
      state_shapes, 8, shapes, shapes).compile()
  return tx, compiled_init, compiled_run


class _CompileFleet:
  """Background AOT compiles of candidate programs, one future each.

  Futures are keyed ``(name, small)``.  Failures are recorded into the
  artifact (`compile_errors`) instead of being swallowed: a
  systematically broken compile (e.g. baseline import error) must leave
  a trace.
  """

  def __init__(self, solver_backend):
    self.solver_backend = solver_backend
    self.futures = {}

  def submit(self, name, small):
    key = (name, small)
    if key not in self.futures:
      self.futures[key] = _COMPILE_POOL.submit(
          aot_compile, name, self.solver_backend, small)
    return self.futures[key]

  def wait(self, keys, timeout):
    """Wait up to `timeout` for `keys`; returns {key: ok|failed|pending}.

    A 'failed' compile is terminal (waiting longer cannot help) and its
    error is recorded into the artifact; 'pending' may still land.
    """
    futs = [self.futures[k] for k in keys]
    concurrent.futures.wait(futs, timeout=max(timeout, 0.0))
    status = {}
    for key, fut in zip(keys, futs):
      if not fut.done():
        status[key] = "pending"
      elif fut.exception() is not None:
        status[key] = "failed"
        _RESULT.setdefault("compile_errors", {})[
            f"{key[0]}{':reduced' if key[1] else ''}"] = repr(
                fut.exception())[:200]
      else:
        status[key] = "ok"
    return status

  def ready(self, key):
    fut = self.futures.get(key)
    return fut is not None and fut.done() and fut.exception() is None

  def result(self, key):
    return self.futures[key].result()


class _Candidate:
  """A compiled optimizer-step program plus its settled state."""

  def __init__(self, name, compiled, params, grads, settle_steps):
    if hasattr(compiled, "update"):
      # Raw GradientTransformation (tests / ad-hoc use): jit on the spot.
      compiled_init = _init_program(compiled)
      compiled_run = _steps_program(compiled)
    else:
      # The AOT executables from the compile fleet, reused directly — a
      # fresh jit here would pay the serialized-executable load through
      # the tunnel a second time (see `aot_compile`).
      _tx, compiled_init, compiled_run = compiled
    self.name = name
    self.params, self.grads = params, grads
    self.run = compiled_run
    state = self.run(compiled_init(params), settle_steps, grads, params)
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


def _prepare_pair(fleet, fixture_small, params, grads, settle_steps, tag=""):
  """Build settled ours/baseline candidates from finished compile futures."""
  pair = [_guarded(
      f"prepare:ours{tag}",
      lambda: _Candidate("ours", fleet.result(("ours", fixture_small)),
                         params, grads, settle_steps))]
  if fleet.ready(("baseline", fixture_small)):
    pair.append(_guarded(
        f"prepare:baseline{tag}",
        lambda: _Candidate("baseline",
                           fleet.result(("baseline", fixture_small)),
                           params, grads, settle_steps)))
  return pair


def _measure_headline(fleet, small, params, grads, iters, rounds, reduced):
  """Phase 1 on one fixture; records value/vs_baseline (or reduced_*)."""
  pair = _prepare_pair(fleet, small, params, grads, settle_steps=3,
                       tag=":reduced" if reduced else "")

  def _record(best):
    if reduced:
      _RESULT["metric"] = "shampoo_step_time_2M_block128_reduced"
      _RESULT["fixture"] = "reduced"
    else:
      _RESULT["metric"] = "shampoo_step_time_58M_block128"
      _RESULT["fixture"] = "full"
      if _RESULT.get("value") is not None and "reduced_ms" not in _RESULT:
        # Promote earlier reduced numbers out of the headline keys.
        _RESULT["reduced_ms"] = _RESULT["value"]
        if _RESULT.get("vs_baseline") is not None:
          _RESULT["reduced_vs_baseline"] = _RESULT["vs_baseline"]
          _RESULT["vs_baseline"] = None
    _RESULT["value"] = round(best["ours"] * 1e3, 3)
    if "baseline" in best and np.isfinite(best["baseline"]):
      _RESULT["baseline_ms"] = round(best["baseline"] * 1e3, 3)
      _RESULT["vs_baseline"] = round(best["baseline"] / best["ours"], 3)
    elif reduced:
      _RESULT["vs_baseline"] = None

  _measure_pair(pair, iters, rounds, _record)


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
  # The tiny CI fixture drives the full TPU-path dispatch logic on CPU.
  cpu = platform == "cpu" and not os.environ.get("BENCH_TEST_TINY_FIXTURE")

  _fixture = device_fixture

  _RESULT.update({
      # r01's "...17M..." name was a misnomer (the tree is 58.7M params)
      # and its 62.974 ms was tunnel enqueue rate, not chip time — values
      # are not comparable across rounds; `vs_baseline` (same-harness,
      # interleaved) is.
      "metric": ("shampoo_step_time_2M_block128_cpufallback" if cpu
                 else "shampoo_step_time_58M_block128"),
      "value": None,
      "unit": "ms",
      "vs_baseline": None,
      "platform": platform,
      "deadline_s": _DEADLINE_S,
  })

  # ---- CPU fallback: single reduced pair, measured directly. ------------
  if cpu:
    fleet = _CompileFleet("auto")
    fleet.submit("ours", True)
    fleet.submit("baseline", True)
    fleet.wait([("ours", True), ("baseline", True)],
               timeout=_remaining() - _FINALIZE_MARGIN_S - 60.0)
    _RESULT["fixture"] = "cpu_reduced"
    params, grads = _fixture(True)
    pair = _prepare_pair(fleet, True, params, grads, settle_steps=3)

    def _rec(best):
      _RESULT["value"] = round(best["ours"] * 1e3, 3)
      if "baseline" in best and np.isfinite(best["baseline"]):
        _RESULT["baseline_ms"] = round(best["baseline"] * 1e3, 3)
        _RESULT["vs_baseline"] = round(best["baseline"] / best["ours"], 3)

    _measure_pair(pair, 3, 2, _rec)
    _attach_recorded_breakdown()
    _finalize(0)

  # ---- TPU path: strict priority order. ----------------------------------
  # The PJRT server SERIALIZES compiles and blocks other RPCs (executable
  # loads, even device ops) behind an in-flight compile (measured: five
  # concurrent full-fixture "overlapped" compiles completed at cumulative
  # 753/1472/1796/2528/3305 s — pure FIFO; and a bench rehearsal starved
  # its reduced-fixture prepare behind the full compiles until the
  # deadline).  So nothing may ever be queued behind a compile the
  # current phase does not need:
  #   1. compile + measure the REDUCED pair (seconds when warm, ~4 min
  #      cold) -> the headline is now secured;
  #   2. only then submit the FULL pair; upgrade if it lands (instant
  #      when the persistent cache is warm, impossible cold — one full
  #      program is ~13 min of serialized server compile);
  #   3. optional steady/warm-start phases only after that.
  def _mark(label):
    _RESULT.setdefault("timeline_s", {})[label] = round(
        time.monotonic() - _T0, 1)

  fleet = _CompileFleet("auto")

  def _probe_pallas():
    _ensure_packages_imported()
    from precondition_tpu.ops.pallas import newton_root

    probe = jnp.eye(128, dtype=jnp.float32)[None] * 2.0
    jax.jit(lambda s: newton_root.batched_inverse_pth_root_pallas(
        s, 4, jnp.full((1,), 128, jnp.int32)))(probe)[0].block_until_ready()

  probe_fut = _COMPILE_POOL.submit(_probe_pallas)
  red_keys = [("ours", True), ("baseline", True)]
  for name, small in red_keys:
    fleet.submit(name, small)

  def _pair_ready(status, small):
    # Ours compiled ok and baseline settled either way (a *failed*
    # baseline compile is terminal — measure ours alone).
    return (status[("ours", small)] == "ok"
            and status[("baseline", small)] != "pending")

  status = fleet.wait(
      red_keys, timeout=_remaining() - _FINALIZE_MARGIN_S - 75.0)
  _mark("reduced_compiles_done")
  if probe_fut.done() and probe_fut.exception() is not None:
    # Pallas broken: rebuild the 'ours' programs on the XLA solver path.
    _RESULT["pallas_probe_error"] = repr(probe_fut.exception())[:200]
    fleet = _CompileFleet("xla")
    for name, small in red_keys:
      fleet.submit(name, small)
    status = fleet.wait(
        red_keys, timeout=_remaining() - _FINALIZE_MARGIN_S - 75.0)
    _mark("reduced_compiles_done_xla")

  if _pair_ready(status, True):
    params_red, grads_red = _fixture(True)
    _measure_headline(fleet, True, params_red, grads_red,
                      iters=8, rounds=2, reduced=True)
    _mark("reduced_measured")

  # ---- Full-fixture upgrade: submit only now (see serialization note).
  head_keys = [("ours", False), ("baseline", False)]
  warm = False
  if _remaining() > _FINALIZE_MARGIN_S + 150.0:
    for name, small in head_keys:
      fleet.submit(name, small)
    warm = _pair_ready(fleet.wait(
        head_keys, timeout=_remaining() - _FINALIZE_MARGIN_S - 110.0), False)
    _mark("full_compiles_done" if warm else "full_compiles_timeout")
  _RESULT["cold_cache"] = not warm

  params = grads = None
  if warm:
    # Materialized only now: the full tree is ~235 MB through the same
    # tunnel the compile RPCs ride.
    params, grads = _fixture(False)
    _measure_headline(fleet, False, params, grads,
                      iters=8, rounds=4, reduced=False)
    _mark("full_measured")

  # ---- Phase 2: steady-state pair (solve every 10 steps, warm). --------
  # Window of 10 consecutive counts contains exactly one solve regardless
  # of the settled state's phase, so iters=11 measures the amortized
  # steady-state step honestly.  settle_steps=21 passes >= 2 solve cycles
  # so `reuse_preconditioner` warm starts see genuinely warm roots.
  # Compiles submitted only now: on a warm cache they are instant cache
  # hits, and on a cold run they would otherwise contend with the
  # headline's server-side compiles.
  if warm and _remaining() > _FINALIZE_MARGIN_S + 60.0:
    try:
      steady_keys = [("ours_steady", False), ("baseline_steady", False)]
      for name, small in steady_keys:
        fleet.submit(name, small)
      fleet.wait(steady_keys,
                 timeout=_remaining() - _FINALIZE_MARGIN_S - 50.0)
      if fleet.ready(("ours_steady", False)):
        steady = [_guarded(
            "prepare:ours_steady",
            lambda: _Candidate("ours_steady",
                               fleet.result(("ours_steady", False)),
                               params, grads, settle_steps=21))]
        if fleet.ready(("baseline_steady", False)):
          steady.append(_guarded(
              "prepare:baseline_steady",
              lambda: _Candidate("baseline_steady",
                                 fleet.result(("baseline_steady", False)),
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

        _measure_pair(steady, 11, 3, _record_steady)
    except Exception as e:
      _RESULT["steady_error"] = repr(e)[:300]

  # ---- Phase 3 (optional): warm-start lever at solve-every-step. -------
  if (os.environ.get("BENCH_WARMSTART", "1") != "0" and warm
      and _remaining() > _FINALIZE_MARGIN_S + 60.0):
    try:
      fleet.submit("ours_warmstart", False)
      fleet.wait([("ours_warmstart", False)],
                 timeout=_remaining() - _FINALIZE_MARGIN_S - 40.0)
      if fleet.ready(("ours_warmstart", False)):
        warm_pair = [_guarded(
            "prepare:ours_warmstart",
            lambda: _Candidate("ours_warmstart",
                               fleet.result(("ours_warmstart", False)),
                               params, grads, settle_steps=3))]

        def _record_warm(best):
          _RESULT["warmstart_bestcase_ms"] = round(
              best["ours_warmstart"] * 1e3, 3)
          _RESULT["warmstart_note"] = (
              "reuse_preconditioner at solve-every-step on the settled "
              "constant-gradient fixture: statistics barely drift between "
              "solves, so this is the lever's best case, not a typical "
              "training speedup")

        _measure_pair(warm_pair, 8, 2, _record_warm)
    except Exception as e:
      _RESULT["warmstart_error"] = repr(e)[:300]

  _attach_recorded_breakdown()
  _finalize(0)


def _attach_recorded_breakdown():
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


if __name__ == "__main__":
  try:
    main()
  except Exception as e:  # never die without the one JSON line
    _RESULT["error"] = repr(e)[:500]
    _finalize(0)
