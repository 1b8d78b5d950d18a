"""Decompose the Shampoo step time: statistics vs root solve vs transform.

Run on TPU:  python benchmarks/profile_step.py [--trace_dir /tmp/xprof]

With ``--trace_dir`` the timed sections run under ``jax.profiler.trace``;
the captured trace labels HLO with the library's `jax.named_scope`
annotations (ShampooStatistics / ShampooRootSolve / ShampooPrecondition /
PowerIteration / CoupledNewton / LOBPCGDeflation) for xprof/TensorBoard
(SURVEY §5's tracing contract).
"""

import contextlib
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from precondition_tpu.ops import pth_root
from precondition_tpu.optim import shampoo


def _maybe_trace():
  if "--trace_dir" in sys.argv:
    trace_dir = sys.argv[sys.argv.index("--trace_dir") + 1]
    return jax.profiler.trace(trace_dir)
  return contextlib.nullcontext()


def timeit(fn, *args, iters=8, warmup=1):
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters * 1e3, out


def main():
  rng = np.random.RandomState(0)
  # The bench fixture's statistics load: transformer-ish, block 128.
  sys_sizes = {"d": 1024, "ff": 4096, "vocab": 8192, "layers": 4}
  # Count blocks: see bench.py _param_tree.
  n, m = 712, 128

  stats = jnp.asarray(rng.randn(n, m, m), jnp.float32)
  stats = jnp.einsum("nij,nkj->nik", stats, stats) / m  # PSD batch
  exps = jnp.full((n,), 4, jnp.int32)
  pads = jnp.full((n,), m, jnp.int32)

  solve = jax.jit(lambda s, e, p: pth_root.batched_inverse_pth_root(s, e, p))
  t_solve, (roots, metrics) = timeit(solve, stats, exps, pads)
  print(f"newton solve [{n},{m},{m}]: {t_solve:.2f} ms "
        f"(max err {float(jnp.max(metrics.error)):.2e}, "
        f"max iters {float(jnp.max(metrics.iterations)):.0f}, "
        f"max retries {float(jnp.max(metrics.retries)):.0f})")

  solve_eigh = jax.jit(lambda s, e, p: pth_root.batched_inverse_pth_root(
      s, e, p, eigh=True))
  t_eigh, _ = timeit(solve_eigh, stats, exps, pads)
  print(f"eigh solve: {t_eigh:.2f} ms")

  # Precision ablation on the Newton path.
  solve_default = jax.jit(lambda s, e, p: pth_root.batched_inverse_pth_root(
      s, e, p, precision=lax.Precision.DEFAULT))
  t_def, (_, m_def) = timeit(solve_default, stats, exps, pads)
  print(f"newton DEFAULT precision: {t_def:.2f} ms "
        f"(max err {float(jnp.max(m_def.error)):.2e})")

  # Statistics contraction (gram updates) for one 1024x4096 param blocked
  # at 128: 8*32=256 blocks x 2 axes.
  g = jnp.asarray(rng.randn(256, 128, 128), jnp.float32)
  s0 = jnp.zeros((256, 128, 128), jnp.float32)

  @jax.jit
  def gram(s, g):
    return 0.999 * s + 0.001 * jnp.einsum(
        "nij,nkj->nik", g, g, precision=lax.Precision.HIGHEST)

  t_gram, _ = timeit(gram, s0, g)
  print(f"gram update [256,128,128]: {t_gram:.3f} ms")

  # Full optimizer step for reference.
  import bench
  params = bench._param_tree(rng)
  grads = jax.tree.map(
      lambda p: jnp.asarray(rng.randn(*p.shape) * 0.01, jnp.float32), params)
  tx = shampoo.distributed_shampoo(
      **bench.HYPERS, graft_type=shampoo.GraftingType.RMSPROP)
  state = tx.init(params)
  update = jax.jit(tx.update)
  u, s2 = update(grads, state, params)
  jax.block_until_ready(u)
  with _maybe_trace():  # named_scope-labelled xprof capture of the step
    t0 = time.perf_counter()
    for _ in range(8):
      u, s2 = update(grads, state, params)
    jax.block_until_ready(u)
  print(f"full step: {(time.perf_counter()-t0)/8*1e3:.2f} ms")

  # Step with solve gated off (preconditioning_compute_steps large).
  tx2 = shampoo.distributed_shampoo(
      **{**bench.HYPERS, "preconditioning_compute_steps": 1000},
      graft_type=shampoo.GraftingType.RMSPROP)
  state2 = tx2.init(params)
  update2 = jax.jit(tx2.update)
  u, s3 = update2(grads, state2, params)  # count=0 solves; later steps skip
  u, s3 = update2(grads, s3, params)
  jax.block_until_ready(u)
  t0 = time.perf_counter()
  for _ in range(8):
    u, s4 = update2(grads, s3, params)
  jax.block_until_ready(u)
  print(f"step without solve: {(time.perf_counter()-t0)/8*1e3:.2f} ms")


if __name__ == "__main__":
  main()
