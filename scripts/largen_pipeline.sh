#!/bin/bash
# On-chip large-N (BH-regime) surrogate pipeline exercise — VERDICT r4 #1.
#
# Runs the full datagen -> train -> evaluate composition at BH-regime N on
# the attached TPU, with the PRODUCTION architecture (hidden 256, 6 layers,
# k=40), scaled down in sims/steps/epochs so wall clock is compile-bound,
# not training-bound.  Two scales:
#   N=2085 — just above every blocked-kernel cutoff (KNN_DENSE_MAX=2048,
#            PALLAS_MIN_N=2048), odd-N fused-kernel padding; mirrors the
#            CPU composition test (tests/test_cli.py::test_large_n_composition)
#            on real hardware.
#   N=5000 — the reference's own BH benchmark scale
#            (/root/reference/scripts/benchmark_bh_temp.py).
#
# Usage: bash scripts/largen_pipeline.sh [workdir]
set -e
cd "$(dirname "$0")/.."
WORK=${1:-runs_largen}
REPO=$(pwd)

run_scale() {
  local N=$1 SIMS=$2 STEPS=$3 EPOCHS=$4 BATCH=$5 TESTS=$6
  local DIR="$WORK/n$N"
  mkdir -p "$DIR"
  cd "$DIR"
  echo "=== N=$N: datagen ($SIMS sims x $STEPS steps, lzf) ==="
  t0=$SECONDS
  python "$REPO/scripts/generate_data.py" \
      --particles "$N" --simulations "$SIMS" --steps "$STEPS" \
      --sequence-length 5 --compression lzf --watchdog 2400 -o ./data
  echo "STAGE_WALL datagen n=$N $((SECONDS-t0)) s"
  echo "=== N=$N: train ($EPOCHS epochs, b$BATCH, production arch) ==="
  t0=$SECONDS
  python "$REPO/scripts/train_model.py" \
      --epochs "$EPOCHS" --batch-size "$BATCH" --k-neighbors 40 \
      --physics-loss --watchdog 2400 -d ./data -o ./models
  echo "STAGE_WALL train n=$N $((SECONDS-t0)) s"
  echo "=== N=$N: evaluate ($TESTS test sims) ==="
  t0=$SECONDS
  python "$REPO/scripts/evaluate.py" \
      --n-test-sims "$TESTS" --particles "$N" --steps "$STEPS" \
      --watchdog 2400
  echo "STAGE_WALL evaluate n=$N $((SECONDS-t0)) s"
  python - <<EOF
import json
with open("results/evaluation_results.json") as f:
    r = json.load(f)
m = r["average_metrics"]
print(f"LARGEN_RESULT n=$N posRMSE={m['position_rmse']:.3f} "
      f"velRMSE={m['velocity_rmse']:.3f} "
      f"energy_err={m.get('target_energy_error')}")
EOF
  cd "$REPO"
}

# N=2085: 6 sims x 120 steps -> ~116 windows/sim; 3 epochs; eval = 114-step rollouts
run_scale 2085 6 120 3 4 2
# N=5000: 3 sims x 60 steps; 2 epochs; eval = 54-step rollouts
run_scale 5000 3 60 2 2 1

echo "DONE"
