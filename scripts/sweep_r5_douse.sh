#!/usr/bin/env bash
# Round-5 seed-robustness batch: dousing-potential shaping at 128² modf.
#
# The r4 record (docs/learning_at_scale.md §5) showed dist-shaping creates
# an "approach valley" that only 1/3 seeds escaped; the douse-potential term
# (shape_douse_coef) adds the missing dousing-side signal.  This batch
# trains 3 full-budget seeds with the douse term, saves params, and runs
# the greedy-argmax eval + probes for each — the seed-robustness datum.
#
# Single-client TPU: run alone. ~20 min/seed train + ~3 min eval.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs docs/assets

COMMON=(--size 128 --num-envs 32 --iters 1500 --bf16
        --ca-repeat-mode modf --gamma 0.999
        --shape-tree-coef 20 --shape-dist-coef 2 --shape-douse-coef 20
        --centroid-features)

for SEED in 7 8 9; do
  TAG="adv128_modf_douse_r5_s${SEED}"
  echo "=== train seed ${SEED} ($(date -u +%H:%M:%S)) ==="
  python scripts/train_curve.py "${COMMON[@]}" --seed "${SEED}" \
      --tag "${TAG}" --save-params "outputs/${TAG}.pkl"
  echo "=== eval seed ${SEED} ==="
  PROBES=""
  [ "${SEED}" = 7 ] && PROBES="--probes"   # probes are seed-independent
  python scripts/eval_policy.py --params "outputs/${TAG}.pkl" \
      --envs 16 --steps 20000 ${PROBES} \
      | tee "outputs/eval_${TAG}.jsonl"
done
echo "=== batch done ($(date -u +%H:%M:%S)) ==="
