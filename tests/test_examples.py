"""Smoke-run the committed examples so they cannot rot.

Each example is executed as a subprocess on the CPU backend (the scripts
carry their own CPU escape hatches); pass criterion is a zero exit and the
expected final output line.  Kept cheap: the examples themselves use small
fixtures and < 100 steps.
"""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run(script, extra_env=None, timeout=600):
  env = dict(os.environ)
  env["EXAMPLES_CPU"] = "1"
  # Examples import precondition_tpu; make the repo root importable even when
  # the package is not pip-installed in the environment running the tests.
  repo_root = str(EXAMPLES.parent)
  env["PYTHONPATH"] = os.pathsep.join(
      p for p in (repo_root, env.get("PYTHONPATH")) if p)
  env.update(extra_env or {})
  proc = subprocess.run(
      [sys.executable, str(EXAMPLES / script)],
      capture_output=True, text=True, timeout=timeout, env=env)
  assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
  return proc.stdout


@pytest.mark.slow
def test_quickstart():
  out = _run("quickstart.py")
  assert "max root error:" in out


@pytest.mark.slow
def test_tearfree_sketchy():
  out = _run("tearfree_sketchy.py")
  assert "loss" in out


@pytest.mark.slow
def test_spmd_transformer():
  out = _run("spmd_transformer.py", timeout=900)
  assert "loss" in out
