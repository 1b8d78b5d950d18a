#!/bin/bash
# Post-change TPU validation + measurement sequence (run on a live chip).
# Order matters: numerics gate first, then kernel rooflines, then the
# step-phase breakdown, then the headline bench (slowest, uses the
# compile cache the earlier steps warm).  Logs land in /tmp/tpu_reval/.
set -u
OUT=/tmp/tpu_reval
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 0. probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU unavailable; aborting"; exit 1; }

echo "== 1. numerics check (ladder/warm-start gates) =="
timeout 1800 python benchmarks/tpu_numerics_check.py \
    2>&1 | tee "$OUT/numerics.log"
NUM_RC=${PIPESTATUS[0]}
if [ "$NUM_RC" != 0 ]; then
  echo "NUMERICS CHECK FAILED (rc=$NUM_RC) — consider defaulting" \
       "coarse_precision=None in ops/pallas/newton_root.py before" \
       "re-measuring. Continuing to collect data."
fi

echo "== 2. kernel rooflines -> KERNELS_TPU.json =="
timeout 2400 python benchmarks/kernel_breakdown.py \
    2>&1 | tee "$OUT/kernels.log"

echo "== 2b. regression tripwire vs committed KERNELS_TPU.json =="
python benchmarks/check_regression.py 2>&1 | tee "$OUT/regression.log"
REG_RC=${PIPESTATUS[0]}
if [ "$REG_RC" = 1 ]; then
  echo "KERNEL REGRESSION — fix before re-measuring/committing." \
       "Continuing to collect data for diagnosis."
fi

echo "== 3. step-phase breakdown -> STEP_BREAKDOWN_TPU.json =="
timeout 3600 python benchmarks/profile_step.py \
    2>&1 | tee "$OUT/profile.log"

echo "== 4. headline bench =="
timeout 3600 python bench.py 2>&1 | tee "$OUT/bench.log"

echo "== done; review $OUT, update README/PARITY, commit the JSONs =="
