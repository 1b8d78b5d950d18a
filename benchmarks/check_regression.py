"""Perf tripwire: diff fresh kernel numbers against the committed artifact.

Compares the working-tree ``KERNELS_TPU.json`` (typically just re-measured
by `kernel_breakdown.py`) against the last committed version
(``git show HEAD:KERNELS_TPU.json``) and fails loudly when any timed
kernel regressed beyond tolerance — so a solver regression is caught by
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

# Keys where HIGHER is worse (milliseconds).  GF/s keys are derived from
# these plus measured iteration counts, so the ms set is sufficient.
_MS_KEYS = (
    "stats_gemm_ms",
    "xla_cold_ms", "xla_warm_ms",
    "pallas_cold_ms", "pallas_warm_ms",
    "pallas_cold_ext_ms", "pallas_warm_ext_ms",
    "xla_powerit_ms",
    "xla_cold_m1024_ms", "xla_warm_m1024_ms",
)
# Correctness guards: residuals must stay at solver tolerance.
_ERR_KEYS = ("xla_cold_err_max", "pallas_cold_err_max",
             "pallas_warm_err_max")
_ERR_CEILING = 1e-4


def committed_artifact():
  try:
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"HEAD:{ARTIFACT}"],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout)
  except (subprocess.CalledProcessError, json.JSONDecodeError):
    return None


def compare(fresh, committed, tolerance):
  """Returns a list of human-readable regression strings."""
  problems = []
  for key in _MS_KEYS:
    if key not in fresh or key not in committed:
      continue
    old, new = float(committed[key]), float(fresh[key])
    if old > 0 and new > tolerance * old:
      problems.append(
          f"{key}: {new:.3f} ms vs committed {old:.3f} ms "
          f"({new / old:.2f}x, tolerance {tolerance}x)")
  for key in _ERR_KEYS:
    if key in fresh and float(fresh[key]) > _ERR_CEILING:
      problems.append(
          f"{key}: {float(fresh[key]):.2e} above the {_ERR_CEILING:.0e} "
          "solver-tolerance ceiling")
  return problems


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--tolerance", type=float, default=1.3,
                  help="allowed slowdown ratio before failing (default "
                       "1.3: the tunneled chip drifts ~10-20%% run to "
                       "run; a real kernel regression is >30%%)")
  args = ap.parse_args(argv)

  path = os.path.join(REPO, ARTIFACT)
  if not os.path.exists(path):
    print(f"no fresh {ARTIFACT}; run benchmarks/kernel_breakdown.py first")
    return 2
  with open(path) as f:
    fresh = json.load(f)
  committed = committed_artifact()
  if committed is None:
    print(f"no committed {ARTIFACT} to compare against; skipping")
    return 0
  problems = compare(fresh, committed, args.tolerance)
  if problems:
    print("KERNEL PERF REGRESSION:")
    for p in problems:
      print("  " + p)
    return 1
  checked = [k for k in _MS_KEYS if k in fresh and k in committed]
  print(f"kernel perf ok ({len(checked)} timings within "
        f"{args.tolerance}x of committed)")
  return 0


if __name__ == "__main__":
  sys.exit(main())
