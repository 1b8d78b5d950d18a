"""Why is the in-step solve share ~58 ms when the solver microbench is ~11?

STEP_BREAKDOWN_TPU.json: full_step_ms - step_without_solve_ms = 58.5 ms.
KERNELS_TPU.json: the same-size [712,128,128] p=4 Pallas solve on a
random-Wishart batch is 11.1 ms (plus ~7 ms power iteration).  This
probe settles the REAL optimizer for a few steps on the bench fixture,
extracts the actual EMA statistics from the optimizer state, and runs
the standalone solver on them — separating "the in-step solve runs on
much harder matrices" (iteration counts / retry rounds explode on
near-low-rank early-training statistics) from "the step's solve
plumbing adds overhead".

Writes SOLVE_GAP_PROBE.json at the repo root.

Run on TPU:  python benchmarks/solve_gap_probe.py
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
  os.makedirs("/root/repo/.jax_cache", exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from precondition_tpu.ops import pth_root
from precondition_tpu.ops.pallas import newton_root
from precondition_tpu.optim import shampoo

from benchmarks.kernel_breakdown import _rtt, _sync, _timeit_loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "SOLVE_GAP_PROBE.json")


def main():
  import bench

  rng = np.random.RandomState(0)
  rtt = _rtt()
  out = {"tunnel_rtt_ms": round(rtt * 1e3, 1)}

  params = bench._param_tree(rng)
  grads = jax.tree.map(
      lambda p: jnp.asarray(rng.randn(*p.shape) * 0.01, jnp.float32), params)
  tx = shampoo.distributed_shampoo(
      **bench.HYPERS, graft_type=shampoo.GraftingType.RMSPROP,
      generate_training_metrics=False)

  # Same jit structure as profile_step._step_ms -> persistent-cache hit.
  def body(_, carry):
    st, g, p = carry
    _, st2 = tx.update(g, st, p)
    return (st2, g, p)

  run = jax.jit(
      lambda st, kk, g, p: lax.fori_loop(0, kk, body, (st, g, p))[0])
  t0 = time.time()
  state = run(tx.init(params), 5, grads, params)
  _sync(jax.tree.leaves(state))
  print(f"settled 5 steps in {time.time() - t0:.0f}s", flush=True)

  # Extract every [128,128] statistics factor from the state.
  leaves = jax.tree_util.tree_flatten_with_path(state)[0]
  stats_mats = []
  for path, leaf in leaves:
    names = [getattr(k, "name", getattr(k, "key", "")) for k in path]
    if "statistics" in names and getattr(leaf, "shape", ()) == (128, 128):
      stats_mats.append(leaf)
  stacked = jnp.stack(stats_mats)
  n = stacked.shape[0]
  out["n_settled_stats"] = n
  pads = jnp.full((n,), 128, jnp.int32)
  print(f"extracted {n} settled [128,128] statistics", flush=True)

  def _checkpoint():
    with open(OUT, "w") as f:
      json.dump(out, f, indent=1)

  def _probe(tag, batch):
    """Time + metrics of the production solver path on `batch`.

    The batch is threaded as a jit ARGUMENT everywhere: closed over, it
    bakes into the program as a ~400 MB constant and the remote compile
    rejects the request body (HTTP 413) — the same trap
    profile_step._step_ms documents for the parameter tree.
    """
    def ext_ev(s):
      return jax.vmap(
          lambda mat, d: pth_root.power_iteration(
              mat, padding_start=d, error_tolerance=1e-6,
              relative_tolerance=True)[1])(s, pads)

    def solve(s):
      return newton_root.batched_inverse_pth_root_pallas(
          s, 4, pads, max_evs=ext_ev(s))

    roots, met = jax.jit(solve)(batch)
    _sync(roots)
    out[f"{tag}_iters_mean"] = round(float(jnp.mean(met.iterations)), 1)
    out[f"{tag}_iters_max"] = round(float(jnp.max(met.iterations)), 1)
    out[f"{tag}_retries_mean"] = round(float(jnp.mean(met.retries)), 2)
    out[f"{tag}_retries_max"] = round(float(jnp.max(met.retries)), 1)
    out[f"{tag}_err_max"] = float(jnp.max(met.error))
    _checkpoint()

    chain = 4
    run = jax.jit(lambda b: lax.fori_loop(
        0, chain,
        lambda _, c: solve(b * (1.0 + 1e-30 * c))[0],
        jnp.zeros_like(b)))
    _sync(run(batch))
    best = float("inf")
    for _ in range(3):
      t0 = time.perf_counter()
      _sync(run(batch))
      best = min(best, time.perf_counter() - t0)
    out[f"{tag}_solve_ms"] = round(max(best - rtt, 1e-9) / chain * 1e3, 2)
    _checkpoint()
    print(f"{tag}: {out[f'{tag}_solve_ms']} ms, iters mean "
          f"{out[f'{tag}_iters_mean']} max {out[f'{tag}_iters_max']}, "
          f"retries mean {out[f'{tag}_retries_mean']}", flush=True)

  # The settled real statistics (the matrices the step actually solves).
  _probe("settled", stacked)

  # Control: random Wishart batch of the same size (the microbench's
  # distribution), through the identical program.
  g = jnp.asarray(np.random.RandomState(1).randn(n, 128, 128), jnp.float32)
  wishart = jnp.einsum("nij,nkj->nik", g, g) / 128
  _probe("wishart", wishart)

  # Power-iteration share and the loose-tolerance experiment: the top
  # eigenvalue only SCALES the relative ridge (epsilon * max_ev), so a
  # ~1% estimate suffices mathematically — the warm path already runs at
  # 1e-2.  Measure the cold PI at both tolerances, and the solve fed by
  # loose eigenvalues, to decide the production cold policy.
  def _pi(tol):
    def f(s):
      return jax.vmap(
          lambda mat, d: pth_root.power_iteration(
              mat, padding_start=d, error_tolerance=tol,
              relative_tolerance=True)[1])(s, pads)
    return f

  for tag, tol in (("pi_tight", 1e-6), ("pi_loose", 1e-2)):
    run = jax.jit(lambda b, t=tol: lax.fori_loop(
        0, 8, lambda _, c: _pi(t)(b * (1.0 + 1e-30 * c[:, None, None])),
        jnp.zeros((n,), jnp.float32)))
    _sync(run(stacked))
    best = float("inf")
    for _ in range(3):
      t0 = time.perf_counter()
      _sync(run(stacked))
      best = min(best, time.perf_counter() - t0)
    out[f"{tag}_ms"] = round(max(best - rtt, 1e-9) / 8 * 1e3, 2)
    _checkpoint()
    print(f"{tag}: {out[f'{tag}_ms']} ms", flush=True)

  evs_tight = jax.jit(_pi(1e-6))(stacked)
  evs_loose = jax.jit(_pi(1e-2))(stacked)
  out["pi_loose_rel_err_max"] = float(jnp.max(
      jnp.abs(evs_loose - evs_tight) / jnp.maximum(evs_tight, 1e-30)))

  def solve_with(s, evs):
    return newton_root.batched_inverse_pth_root_pallas(
        s, 4, pads, max_evs=evs)

  r_loose, met_loose = jax.jit(solve_with)(stacked, evs_loose)
  _sync(r_loose)
  out["solve_looseev_iters_mean"] = round(
      float(jnp.mean(met_loose.iterations)), 1)
  out["solve_looseev_err_max"] = float(jnp.max(met_loose.error))
  _checkpoint()

  # Conditioning summary of the settled stats (host, float64).
  sample = np.asarray(stacked[:64], np.float64)
  evs = np.linalg.eigvalsh(sample)
  cond = evs[:, -1] / np.maximum(evs[:, 0], 1e-30)
  out["settled_cond_median"] = float(np.median(cond))
  out["settled_cond_p90"] = float(np.percentile(cond, 90))
  out["settled_negfrac"] = float((evs[:, 0] < 0).mean())

  with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
  print(json.dumps(out, indent=1))


if __name__ == "__main__":
  main()
