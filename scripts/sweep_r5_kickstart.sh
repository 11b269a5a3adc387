#!/usr/bin/env bash
# Round-5 kickstart batch: BC warm-start -> critic warmup -> annealed
# kickstart-CE PPO at 128² modf, 3 seeds.
#
# Rationale (docs/learning_at_scale.md §5): BC alone reaches eval ≈ -694
# reliably in ~5 min, but naive BC+PPO destroys the clone (fresh-critic
# advantage noise + entropy pull).  The r5 levers close that hole:
# --critic-warmup-iters freezes torso+actor while the critic learns the
# clone's values; --kickstart-coef adds an annealed CE toward the greedy
# demonstrator on the move/shoot heads.  Question: does the pipeline make
# >= BC-level control SEED-ROBUST (where pure PPO+shaping is 1/3 seeds)?
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs docs/assets

COMMON=(--size 128 --num-envs 32 --iters 1500 --bf16
        --ca-repeat-mode modf --gamma 0.999
        --shape-tree-coef 20 --shape-dist-coef 2 --shape-douse-coef 20
        --centroid-features
        --bc-iters 300 --critic-warmup-iters 150
        --kickstart-coef 1.0 --kickstart-decay 900)

for SEED in 7 8 9; do
  TAG="adv128_modf_ks_r5_s${SEED}"
  echo "=== train seed ${SEED} ($(date -u +%H:%M:%S)) ==="
  python scripts/train_curve.py "${COMMON[@]}" --seed "${SEED}" \
      --tag "${TAG}" --save-params "outputs/${TAG}.pkl"
  echo "=== eval seed ${SEED} ==="
  python scripts/eval_policy.py --params "outputs/${TAG}.pkl" \
      --envs 16 --steps 20000 \
      | tee "outputs/eval_${TAG}.jsonl"
done
echo "=== batch done ($(date -u +%H:%M:%S)) ==="
