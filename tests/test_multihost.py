"""Real multi-process GSPMD: the sharded Shampoo step across two 'hosts'.

Spawns two python processes (4 virtual CPU devices each) joined through
`jax.distributed` into one 8-device mesh and runs the full dp x tp train
step with the shard_map-distributed root solve.  The reference never
tests beyond one device; this exercises actual cross-process collectives
(SURVEY §2.5 multi-host row).
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

DRIVER = pathlib.Path(__file__).resolve().parent / "multihost_driver.py"


def _free_port():
  with socket.socket() as s:
    s.bind(("127.0.0.1", 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_step():
  port = _free_port()
  env = {k: v for k, v in os.environ.items()
         if k not in ("XLA_FLAGS",)}  # driver sets its own device count
  # The driver imports precondition_tpu; put the repo root on PYTHONPATH
  # without dropping entries the environment needs (e.g. backend plugins).
  repo_root = str(DRIVER.parent.parent)
  env["PYTHONPATH"] = os.pathsep.join(
      [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
  procs = [
      subprocess.Popen(
          [sys.executable, str(DRIVER), str(i), str(port)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          env=env)
      for i in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=600)
      outs.append(out)
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
  losses, znorms = [], []
  for out in outs:
    line = [l for l in out.splitlines() if l.startswith("MULTIHOST OK")]
    assert line, out[-2000:]
    losses.append(float(line[0].split()[-1]))
    zline = [l for l in out.splitlines()
             if l.startswith("MULTIHOST ZERO OK")]
    assert zline, out[-2000:]
    znorms.append(float(zline[0].split()[-1]))
  # Both hosts must observe the same global loss / update norm.
  assert losses[0] == pytest.approx(losses[1], rel=1e-6), losses
  assert znorms[0] == pytest.approx(znorms[1], rel=1e-6), znorms
