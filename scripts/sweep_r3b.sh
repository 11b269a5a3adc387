#!/bin/bash
# Round-3 follow-up legs (after sweep_r3.sh): the fused-CA training overlay
# must run at >=128 columns (the Pallas Alexandridis kernel's tile gate —
# 64^2 silently falls back to XLA, making the first overlay attempt vacuous),
# and the 256^2 XLA SPS probe re-runs without CPU contention.
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

# fused-CA learning-curve overlay at 128^2 (kernel-supported): same seed &
# config, XLA vs Pallas CA -> distributional-equivalence comparison.
run adv128_xla    --size 128 --num-envs 32 --iters 1500 --seed 7
run adv128_pallas --size 128 --num-envs 32 --iters 1500 --seed 7 --pallas-ca

# fair end-to-end training SPS probes at 256^2 (no background CPU load).
run adv256_sps_xla2    --size 256 --num-envs 32 --iters 60 --seed 7
run adv256_sps_pallas2 --size 256 --num-envs 32 --iters 60 --seed 7 --pallas-ca

echo "SWEEP B DONE"
