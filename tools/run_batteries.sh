#!/bin/sh
# Full-table 10-seed batteries (experiments/battery.py) on the TPU.
# One job at a time (single chip).  battery.py defaults to the reference's
# batch 10000 (code/main.py:74): datasets with N_tr <= 10000 run the
# full-batch scan, protein/naval engage the minibatch-SVI battery path —
# the jsonl rows record which ("batch": "full" | 10000).
set -x
cd /root/repo
for d in boston concrete energy kin8nm power wine_red wine_white naval protein; do
  for m in SVGP TGP; do
    timeout 1800 python experiments/battery.py --model $m --dataset $d \
        --num_inducing 100 --seeds 1-10 --epochs 15000 \
        --out results_battery.jsonl
  done
done
echo BATTERIES_DONE
