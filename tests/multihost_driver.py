"""Two-process GSPMD driver: full Shampoo train step across 'hosts'.

Launched by `tests/test_multihost.py` as two subprocesses, each holding 4
virtual CPU devices, joined through `jax.distributed` (Gloo over TCP) into
one 8-device mesh.  This validates the real multi-host path — global
arrays from per-host shards, cross-process collectives inside the jitted
step — which single-process virtual-device tests cannot.

Usage: python tests/multihost_driver.py <process_id> <coordinator_port>
"""

import os
import sys


def main():
  proc_id = int(sys.argv[1])
  port = int(sys.argv[2])
  os.environ["JAX_PLATFORMS"] = "cpu"
  flags = os.environ.get("XLA_FLAGS", "")
  if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

  import jax

  jax.config.update("jax_platforms", "cpu")
  jax.distributed.initialize(
      coordinator_address=f"127.0.0.1:{port}",
      num_processes=2, process_id=proc_id)
  assert jax.device_count() == 8, jax.device_count()
  assert jax.local_device_count() == 4, jax.local_device_count()

  import numpy as np
  import jax.numpy as jnp
  from jax.experimental import multihost_utils
  from jax.sharding import NamedSharding, PartitionSpec as P

  from precondition_tpu.models import transformer
  from precondition_tpu.optim import shampoo
  from precondition_tpu.parallel import mesh as mesh_lib
  from precondition_tpu.train import loop as train_loop

  mesh = mesh_lib.make_mesh((4, 2), ("data", "model"),
                            devices=jax.devices())

  cfg = transformer.TransformerConfig(
      vocab_size=64, d_model=32, n_heads=2, n_layers=1, d_ff=64,
      max_seq_len=16, remat=False)
  # Same seed on both hosts -> identical host-local params; globalize as
  # replicated (the multihost contract: replicated == same on all hosts).
  host_params = jax.tree.map(
      np.asarray, transformer.init_params(jax.random.PRNGKey(0), cfg))
  params = multihost_utils.host_local_array_to_global_array(
      host_params, mesh, jax.tree.map(lambda _: P(), host_params))

  tx = shampoo.distributed_shampoo(
      learning_rate=0.01, block_size=16, start_preconditioning_step=0,
      graft_type=shampoo.GraftingType.RMSPROP,
      statistics_partition_spec=NamedSharding(mesh, P(("data", "model"))),
      preconditioner_partition_spec=NamedSharding(mesh, P(("data", "model"))),
      num_devices_for_pjit=8)

  loss = lambda p, b: transformer.loss_fn(p, b, cfg)
  params = mesh_lib.shard_params(params, mesh, transformer.TP_RULES)
  opt_state = jax.jit(
      tx.init, out_shardings=NamedSharding(mesh, P()))(params)
  step = train_loop.make_sharded_train_step(
      loss, tx, mesh, transformer.TP_RULES)

  # Each host contributes its half of the global batch (8 rows total).
  rng = np.random.RandomState(proc_id)
  local_tokens = rng.randint(0, 64, size=(4, 17)).astype(np.int32)
  batch = {
      "tokens": multihost_utils.host_local_array_to_global_array(
          local_tokens, mesh, P("data")),
  }
  loss_val, params, opt_state = step(params, opt_state, batch)
  # The loss is replicated: every process holds an addressable replica.
  loss_host = float(np.asarray(loss_val.addressable_data(0)))
  assert np.isfinite(loss_host), loss_host
  print(f"MULTIHOST OK {proc_id} {loss_host:.6f}", flush=True)

  # Phase 2: ZeRO-style optimizer-state sharding across the two hosts.
  # The InitFnState contract: state built inside jit with the global
  # [N, m, m] statistics sharded over the whole mesh.
  ztx = shampoo.distributed_shampoo(
      learning_rate=0.01, block_size=16, start_preconditioning_step=0,
      graft_type=shampoo.GraftingType.RMSPROP,
      shard_optimizer_states=True, num_devices_for_pjit=8,
      statistics_partition_spec=NamedSharding(mesh, P(("data", "model"))),
      preconditioner_partition_spec=NamedSharding(mesh, P(("data", "model"))))
  init_fns = ztx.init(jax.tree.map(np.zeros_like, host_params))
  zstate = jax.jit(init_fns.init_fn)(params)
  grads = jax.jit(jax.grad(lambda p, b: loss(p, b)))(params, batch)
  zupdates, zstate = jax.jit(ztx.update)(grads, zstate, params)
  znorm = float(np.asarray(
      jax.jit(lambda t: sum(jnp.sum(x * x) for x in jax.tree.leaves(t)),
              out_shardings=NamedSharding(mesh, P()))(
                  zupdates).addressable_data(0)))
  assert np.isfinite(znorm), znorm
  print(f"MULTIHOST ZERO OK {proc_id} {znorm:.6f}", flush=True)


if __name__ == "__main__":
  main()
