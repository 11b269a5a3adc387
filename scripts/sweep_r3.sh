#!/bin/bash
# Round-3 recorded training runs (VERDICT r2 items 4 & 5), sequential on the
# one TPU chip.  Each leg writes docs/assets/ppo_curve_<tag>.{json,svg}.
set -x
cd /root/repo
mkdir -p outputs/sweep_r3

run() {
  tag=$1; shift
  echo "=== leg $tag: $* ==="
  python scripts/train_curve.py --bf16 --tag "$tag" "$@" \
    > "outputs/sweep_r3/$tag.log" 2>&1
  tail -2 "outputs/sweep_r3/$tag.log"
}

# (5) fused-CA training overlay at 64^2: same seed/config, XLA vs Pallas CA.
run adv64_xla_r3    --size 64 --num-envs 32 --iters 2000 --seed 7
run adv64_pallas_r3 --size 64 --num-envs 32 --iters 2000 --seed 7 --pallas-ca

# (5) 256^2 end-to-end training SPS probes, XLA vs Pallas CA (short).
run adv256_sps_xla    --size 256 --num-envs 32 --iters 60 --seed 7
run adv256_sps_pallas --size 256 --num-envs 32 --iters 60 --seed 7 --pallas-ca

# (4) 256^2 learning sweep at the reference's default budget (1e7 steps
# per leg = 2440 iters x 32 envs x 128 steps), through the fused CA.
run adv256_lr1e3  --size 256 --num-envs 32 --iters 2440 --seed 7 \
    --pallas-ca --lr 1e-3
run adv256_ent05  --size 256 --num-envs 32 --iters 2440 --seed 7 \
    --pallas-ca --ent-coef 0.05
run adv256_sm4    --size 256 --num-envs 32 --iters 2440 --seed 7 \
    --pallas-ca --speed-multiplier 4
run adv256_combo  --size 256 --num-envs 32 --iters 2440 --seed 7 \
    --pallas-ca --lr 1e-3 --ent-coef 0.05 --speed-multiplier 2

echo "SWEEP DONE"
