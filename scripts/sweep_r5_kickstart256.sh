#!/usr/bin/env bash
# Round-5 stretch: the kickstart pipeline (BC warm-start -> critic warmup ->
# annealed kickstart CE) at 256² modf — the scale VERDICT r3 set as the
# stretch goal.  Same levers as sweep_r5_kickstart.sh; the greedy-fire
# demonstrator is proven at 256² (eval -0.48, scripts/exp_policy_ceiling.py),
# so BC has a target; the question is whether the pipeline transfers with
# the 4x larger lattice and longer credit horizons.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs docs/assets

COMMON=(--size 256 --num-envs 32 --iters 1500 --bf16
        --ca-repeat-mode modf --gamma 0.999
        --shape-tree-coef 20 --shape-dist-coef 2 --shape-douse-coef 20
        --centroid-features
        --bc-iters 300 --critic-warmup-iters 150
        --kickstart-coef 1.0 --kickstart-decay 900)

for SEED in "$@"; do
  TAG="adv256_modf_ks_r5_s${SEED}"
  echo "=== train seed ${SEED} ($(date -u +%H:%M:%S)) ==="
  python scripts/train_curve.py "${COMMON[@]}" --seed "${SEED}" \
      --tag "${TAG}" --save-params "outputs/${TAG}.pkl"
  echo "=== eval seed ${SEED} ==="
  python scripts/eval_policy.py --params "outputs/${TAG}.pkl" \
      --envs 16 --steps 20000 ${PROBES:-} \
      | tee "outputs/eval_${TAG}.jsonl"
done
echo "=== batch done ($(date -u +%H:%M:%S)) ==="
