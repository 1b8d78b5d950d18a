"""Pre-warm the persistent XLA compile cache for bench.py's programs.

Each of bench.py's five candidate programs costs ~15-25 minutes of XLA
compile through the remote-TPU tunnel when the cache is cold, but
milliseconds to reload — the round-2 driver benchmark was lost entirely
to cold compiles.  This tool AOT-compiles (``.lower().compile()``) the
exact programs bench.py will run, in parallel worker threads (the
compiles execute server-side, so they overlap), so a subsequent
``python bench.py`` is compile-free.

Programs are built through bench.py's own ``_steps_program`` /
``_param_tree`` / ``HYPERS`` so the traced jaxprs — and therefore the
cache keys — are identical to the benchmark's.

Usage:  python benchmarks/warm_bench_cache.py [ours baseline ours_steady
        baseline_steady ours_warmstart]   (default: all five)
"""

import concurrent.futures
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

CANDIDATES = bench.CANDIDATE_TXS


def _warm(name):
  t0 = time.time()
  tx = CANDIDATES[name]("auto")
  rng = np.random.RandomState(0)
  # eval_shape the fixture builder: only avals are needed, and
  # materializing the 58.7M-param tree would push ~235 MB through the
  # device tunnel per worker.
  params_s = jax.eval_shape(lambda: bench._param_tree(rng))
  grads = params_s
  state = jax.eval_shape(tx.init, params_s)
  run = bench._steps_program(tx)
  # k is passed as a concrete python int so it traces exactly like
  # bench.py's call sites (weak-typed i32 scalar -> identical cache key).
  run.lower(state, 8, grads, params_s).compile()
  print(f"[warm] {name}: compiled in {time.time() - t0:.0f}s", flush=True)


def main():
  names = sys.argv[1:] or list(CANDIDATES)
  with concurrent.futures.ThreadPoolExecutor(len(names)) as pool:
    futs = {pool.submit(_warm, n): n for n in names}
    for fut in concurrent.futures.as_completed(futs):
      name = futs[fut]
      try:
        fut.result()
      except Exception as e:
        print(f"[warm] {name}: FAILED {e!r:.300}", flush=True)


if __name__ == "__main__":
  main()
