"""Ahead-of-time compile validation without target hardware.

Equivalent of the reference's `cross_compile.py` (which uses the internal
`jax.mock_backend` with an 8x8 TPU topology) built on public APIs: a forced
multi-device CPU topology plus `jit(...).lower(...).compile()` validates
that a sharded program traces, partitions, and compiles for an N-device
mesh before touching real chips.

Usage:
  python -m precondition_tpu.utils.aot  # compile-checks the flagship step
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple


def force_host_devices(n: int = 8) -> None:
  """Must run before jax initialises: virtualise n CPU devices."""
  os.environ["JAX_PLATFORMS"] = "cpu"
  flags = os.environ.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n}").strip()


def aot_compile(fn: Callable, *example_args,
                mesh=None, in_shardings=None, out_shardings=None):
  """Lower + compile ``fn`` for the given mesh; returns the compiled obj.

  Raises at compile time if the program cannot be partitioned — the same
  signal the reference's cross-compile gives, without hardware.
  """
  import jax

  kwargs = {}
  if in_shardings is not None:
    kwargs["in_shardings"] = in_shardings
  if out_shardings is not None:
    kwargs["out_shardings"] = out_shardings
  jitted = jax.jit(fn, **kwargs)
  lowered = jitted.lower(*example_args)
  return lowered.compile()


def compile_report(compiled) -> dict:
  """Cost/memory summary of a compiled executable."""
  report = {}
  try:
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
      analysis = analysis[0]
    report["flops"] = analysis.get("flops")
    report["bytes_accessed"] = analysis.get("bytes accessed")
  except Exception:  # pylint: disable=broad-except
    pass
  try:
    mem = compiled.memory_analysis()
    report["argument_size_bytes"] = getattr(mem, "argument_size_in_bytes", None)
    report["output_size_bytes"] = getattr(mem, "output_size_in_bytes", None)
    report["temp_size_bytes"] = getattr(mem, "temp_size_in_bytes", None)
  except Exception:  # pylint: disable=broad-except
    pass
  return report


def main():
  force_host_devices(8)
  import __graft_entry__  # noqa: E402  (repo-root driver entry)

  __graft_entry__.dryrun_multichip(8)
  print("aot: 8-device sharded train step compiled and executed")


if __name__ == "__main__":
  main()
