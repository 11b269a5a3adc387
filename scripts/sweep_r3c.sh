#!/bin/bash
# Round-3 TPU queue after sweep_r3b: kernel-stencil A/B, policy-ceiling
# probes for the 256^2 learning analysis, then the CORRECTED curriculum leg
# (the first sm4 leg ran before speed_multiplier actually scaled the time
# model — see QUIRKS #12 — so it was a default-timing replication).
set -x
cd /root/repo
mkdir -p outputs/sweep_r3

# (1) windy stencil variant timing: banded / boolean / f32-FMA / SWAR.
timeout 1200 python scripts/exp_ca_variants.py \
  > outputs/sweep_r3/exp_ca_variants.log 2>&1
tail -8 outputs/sweep_r3/exp_ca_variants.log

# (2) headline bench A/B: boolean vs SWAR stencil (advanced metric skipped;
# it does not touch the windy kernel).
GYMCA_BENCH_ADV=0 GYMCA_BENCH_STENCIL=boolean timeout 1800 python bench.py \
  > outputs/sweep_r3/bench_boolean.json 2> outputs/sweep_r3/bench_boolean.log
GYMCA_BENCH_ADV=0 GYMCA_BENCH_STENCIL=swar timeout 1800 python bench.py \
  > outputs/sweep_r3/bench_swar.json 2> outputs/sweep_r3/bench_swar.log
tail -1 outputs/sweep_r3/bench_boolean.json
tail -1 outputs/sweep_r3/bench_swar.json

# (3) policy-ceiling probes at 256^2 (learning-analysis evidence): what can
# an idle / random / greedy hand policy achieve, at default and 4x agent
# speed?
timeout 1800 python scripts/exp_policy_ceiling.py --size 256 --envs 8 \
  --steps 6000 > outputs/sweep_r3/policy_ceiling_sm1.log 2>&1
tail -4 outputs/sweep_r3/policy_ceiling_sm1.log
timeout 1800 python scripts/exp_policy_ceiling.py --size 256 --envs 8 \
  --steps 6000 --speed-multiplier 4 \
  > outputs/sweep_r3/policy_ceiling_sm4.log 2>&1
tail -4 outputs/sweep_r3/policy_ceiling_sm4.log

# (4) corrected curriculum leg: 4x agent speed, fused CA, default budget.
python scripts/train_curve.py --bf16 --tag adv256_sm4fix --size 256 \
  --num-envs 32 --iters 2440 --seed 7 --pallas-ca --speed-multiplier 4 \
  > outputs/sweep_r3/adv256_sm4fix.log 2>&1
tail -2 outputs/sweep_r3/adv256_sm4fix.log

# (5) combo re-run (the first attempt hung on a TPU dispatch at iter 820
# and was killed): lr + entropy + REAL 2x agent speed together.
python scripts/train_curve.py --bf16 --tag adv256_combo --size 256 \
  --num-envs 32 --iters 2440 --seed 7 --pallas-ca --lr 1e-3 \
  --ent-coef 0.05 --speed-multiplier 2 \
  > outputs/sweep_r3/adv256_combo.log 2>&1
tail -2 outputs/sweep_r3/adv256_combo.log

echo "SWEEP C DONE"
