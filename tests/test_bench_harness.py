"""Guards for the driver-facing bench harness (bench.py).

bench.py's full fixture is TPU-scale; these tests exercise the timing
machinery itself on a tiny problem so harness regressions (fence
semantics, loop program, interleave bookkeeping, deadline truncation)
fail in CI rather than in the driver's end-of-round TPU run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import bench
from precondition_tpu.optim import shampoo


def _tiny():
  params = {"w": jnp.asarray(np.random.RandomState(0).randn(32, 24),
                             jnp.float32)}
  grads = jax.tree.map(lambda p: p * 0.01, params)
  tx = shampoo.distributed_shampoo(
      learning_rate=0.1, block_size=8, start_preconditioning_step=0,
      generate_training_metrics=False)
  return tx, params, grads


class TestBenchHarness:

  def test_measure_pair_returns_positive_per_step(self):
    tx, params, grads = _tiny()
    cands = [bench._Candidate("a", tx, params, grads, settle_steps=2),
             bench._Candidate("b", tx, params, grads, settle_steps=2)]
    recorded = []
    best = bench._measure_pair(cands, iters=3, rounds=2,
                               record=lambda b: recorded.append(dict(b)))
    assert set(best) == {"a", "b"}
    for v in best.values():
      assert 0 < v < 60
    # record() must fire after every round so a deadline cut still emits
    # the best-known numbers.
    assert len(recorded) >= 1
    assert set(recorded[0]) == {"a", "b"}

  def test_steps_program_advances_count(self):
    tx, params, grads = _tiny()
    run = bench._steps_program(tx)
    state = run(tx.init(params), 5, grads, params)
    assert int(state.count) == 5

  def test_candidate_sample_reuses_compiled_program(self):
    # k is a traced argument: every window size must reuse one executable.
    tx, params, grads = _tiny()
    cand = bench._Candidate("a", tx, params, grads, settle_steps=2)
    s1 = cand.sample(3)
    s2 = cand.sample(5)
    assert s1 > 0 and s2 > 0

  def test_fence_completes_on_pytree(self):
    tx, params, grads = _tiny()
    state = tx.init(params)
    bench._fence(state)  # must not raise on nested state pytrees

  def test_guarded_passes_through_results_and_errors(self):
    assert bench._guarded("ok", lambda: 42) == 42
    try:
      bench._guarded("boom", lambda: 1 / 0)
      raise AssertionError("expected ZeroDivisionError")
    except ZeroDivisionError:
      pass

  def test_param_tree_shape_is_stable(self):
    # The recorded metric's fixture: keep it byte-identical across rounds
    # so vs_baseline stays comparable. (~58.7M params; the metric name's
    # "17M" is historical.)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree.leaves(bench._param_tree(
                np.random.RandomState(0))))
    assert n == 58_724_352


class TestKernelRegressionTripwire:
  """benchmarks/check_regression.py: the perf tripwire's compare logic."""

  def test_within_tolerance_passes(self):
    from benchmarks import check_regression as cr
    committed = {"xla_cold_ms": 10.0, "pallas_cold_ms": 8.0}
    fresh = {"xla_cold_ms": 11.5, "pallas_cold_ms": 9.0,
             "pallas_cold_err_max": 1e-6}
    assert cr.compare(fresh, committed, tolerance=1.3) == []

  def test_slowdown_and_error_flagged(self):
    from benchmarks import check_regression as cr
    committed = {"xla_cold_ms": 10.0}
    fresh = {"xla_cold_ms": 14.0, "pallas_cold_err_max": 1e-2}
    problems = cr.compare(fresh, committed, tolerance=1.3)
    assert len(problems) == 2
    assert any("xla_cold_ms" in p for p in problems)
    assert any("err_max" in p for p in problems)

  def test_missing_keys_ignored(self):
    from benchmarks import check_regression as cr
    # A new artifact gaining keys (or an old one lacking them) must not
    # crash the tripwire.
    assert cr.compare({"new_key_ms": 5.0}, {"xla_cold_ms": 1.0}, 1.3) == []
