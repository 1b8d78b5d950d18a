"""Perf tripwire: diff fresh benchmark numbers against committed artifacts.

Compares the working-tree ``KERNELS_TPU.json`` (re-measured by
`kernel_breakdown.py`) and ``STEP_BREAKDOWN_TPU.json`` (re-measured by
`profile_step.py`) against the last committed versions
(``git show HEAD:<artifact>``) and fails loudly when any timed kernel or
step phase regressed beyond tolerance — so a regression is caught by
`tpu_revalidate.sh` minutes after the change, not by the driver's
end-of-round bench.

Usage:  python benchmarks/check_regression.py [--tolerance 1.3]
Exit codes: 0 ok, 1 regression, 2 missing artifacts.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = "KERNELS_TPU.json"
STEP_ARTIFACT = "STEP_BREAKDOWN_TPU.json"

# Keys where HIGHER is worse (milliseconds).  GF/s keys are derived from
# these plus measured iteration counts, so the ms set is sufficient.
_MS_KEYS = (
    "stats_gemm_ms",
    "xla_cold_ms", "xla_warm_ms",
    "pallas_cold_ms", "pallas_warm_ms",
    "pallas_cold_ext_ms", "pallas_warm_ext_ms",
    "xla_powerit_ms",
    "xla_cold_m1024_ms", "xla_warm_m1024_ms",
    # Block-size sweep rows (benchmarks/blocksize_sweep.py).
    "m256_xla_cold_ms", "m256_xla_warm_ms",
    "m256_pallas_cold_ms", "m256_pallas_warm_ms",
    "m512_xla_cold_ms", "m512_xla_warm_ms",
    "m512_pallas_cold_ms", "m512_pallas_warm_ms",
)
# Correctness guards: residuals must stay at solver tolerance.
_ERR_KEYS = ("xla_cold_err_max", "pallas_cold_err_max",
             "pallas_warm_err_max",
             "m256_pallas_cold_err_max", "m512_pallas_cold_err_max")
_ERR_CEILING = 1e-4

# Step-phase keys from profile_step.py (STEP_BREAKDOWN_TPU.json): a
# step-LEVEL regression (orchestration, fusion, layout) can hide behind
# healthy kernel microbenches, so both artifacts are tripwired.
_STEP_MS_KEYS = (
    "newton_solve_ms", "eigh_solve_ms", "gram_update_ms",
    "full_step_ms", "full_step_warmstart_ms",
    "step_without_solve_ms", "step_transform_only_ms",
    "steady_step_ms",
    "quantized_step_reduced_ms", "f32_step_reduced_ms",
    "full_step_block256_ms",
    "tearfree_step_ms", "tearfree_step_eigh_ms", "tearfree_step_newton_ms",
)


def committed_artifact(name=ARTIFACT):
  try:
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"HEAD:{name}"],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout)
  except (subprocess.CalledProcessError, json.JSONDecodeError):
    return None


def compare(fresh, committed, tolerance, ms_keys=_MS_KEYS,
            err_keys=_ERR_KEYS):
  """Returns a list of human-readable regression strings."""
  problems = []
  for key in ms_keys:
    if key not in fresh or key not in committed:
      continue
    old, new = float(committed[key]), float(fresh[key])
    if old <= 0.0:
      # A committed 0.0 is a past measurement-granularity artifact (a
      # timing window that ran under the tunnel RTT), not a baseline a
      # real number can "regress" from.
      continue
    if old > 0 and new > tolerance * old:
      problems.append(
          f"{key}: {new:.3f} ms vs committed {old:.3f} ms "
          f"({new / old:.2f}x, tolerance {tolerance}x)")
  for key in err_keys:
    if key in fresh and float(fresh[key]) > _ERR_CEILING:
      problems.append(
          f"{key}: {float(fresh[key]):.2e} above the {_ERR_CEILING:.0e} "
          "solver-tolerance ceiling")
  return problems


def _check_one(name, ms_keys, err_keys, tolerance):
  """Returns (exit_code, problems) for one artifact pair."""
  path = os.path.join(REPO, name)
  if not os.path.exists(path):
    print(f"no fresh {name}; skipping "
          "(run kernel_breakdown.py / profile_step.py to produce it)")
    return 2, []
  with open(path) as f:
    fresh = json.load(f)
  committed = committed_artifact(name)
  if committed is None:
    print(f"no committed {name} to compare against; skipping")
    return 0, []
  problems = compare(fresh, committed, tolerance, ms_keys, err_keys)
  if problems:
    print(f"PERF REGRESSION in {name}:")
    for p in problems:
      print("  " + p)
    return 1, problems
  checked = [k for k in ms_keys if k in fresh and k in committed]
  print(f"{name} ok ({len(checked)} timings within "
        f"{tolerance}x of committed)")
  return 0, []


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--tolerance", type=float, default=1.3,
                  help="allowed slowdown ratio before failing (default "
                       "1.3: the tunneled chip drifts ~10-20%% run to "
                       "run; a real kernel regression is >30%%)")
  args = ap.parse_args(argv)

  rc_kernels, _ = _check_one(ARTIFACT, _MS_KEYS, _ERR_KEYS, args.tolerance)
  rc_steps, _ = _check_one(STEP_ARTIFACT, _STEP_MS_KEYS, (), args.tolerance)
  if 1 in (rc_kernels, rc_steps):
    return 1
  return max(rc_kernels, rc_steps)


if __name__ == "__main__":
  sys.exit(main())
