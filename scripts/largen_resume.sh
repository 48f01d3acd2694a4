#!/bin/bash
# Continuation of scripts/largen_pipeline.sh after a session interruption:
# n2085 datagen+train already complete in runs_largen/n2085; re-run its
# evaluate stage, then run the full N=5000 scale.
set -e
cd "$(dirname "$0")/.."
WORK=${1:-runs_largen}
REPO=$(pwd)

cd "$WORK/n2085"
echo "=== N=2085: evaluate (2 test sims) [resumed] ==="
t0=$SECONDS
python "$REPO/scripts/evaluate.py" \
    --n-test-sims 2 --particles 2085 --steps 120 --watchdog 2400
echo "STAGE_WALL evaluate n=2085 $((SECONDS-t0)) s"
python - <<EOF
import json
with open("results/evaluation_results.json") as f:
    r = json.load(f)
m = r["average_metrics"]
print(f"LARGEN_RESULT n=2085 posRMSE={m['position_rmse']:.3f} "
      f"velRMSE={m['velocity_rmse']:.3f} "
      f"energy_err={m.get('target_energy_error')}")
EOF
cd "$REPO"

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

# N=5000: 3 sims x 60 steps; 2 epochs; eval = 54-step rollouts
run_scale 5000 3 60 2 2 1

echo "DONE"
