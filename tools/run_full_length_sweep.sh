#!/bin/bash
# Full-generator stability sweep (round-5): every generator arch in
# flows/generators.py trains full-length at least once — one seed, boston
# M=5, 15000 epochs, fp32 — and its outcome (NLL/RMSE or divergence)
# lands in results_full_length.jsonl (round-4 verdict prescription 7).
# Step* archs run their per-seed identity-fit initializer; rand_* archs are
# the reference's randomly-initialised single flows (flows.py:494-573).
# pipefail: the fallback record after || depends on python's status, not
# tail's — without it a diverging arch would leave NO line in the jsonl
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-results_full_length.jsonl}

ARCHS=(
  # plain generators + chains (identity-at-init)
  "SAL:2" "ArcSL:1" "BoxCoxL:1" "InverseBoxCoxL:1" "Affine:1"
  "SAL_BCL:1" "SAL_InvBCL:1" "SAL_AL:1" "BCL_AL:1" "InvBCL_AL:1"
  # step archs (identity-fit initializer)
  "StepTanhL:1:3" "StepSAL:1:3" "StepArcSL:1:3"
  "StepBoxCoxL:1:3" "StepInverseBoxCoxL:1:3" "StepAllL:2"
  # randomly-initialised single flows (reference flows.py:494-573)
  "rand_affine:1" "rand_arcsinh:1" "rand_inverse_arcsinh:1"
  "rand_sinh_arcsinh:1" "rand_inverse_sinh_arcsinh:1"
  "rand_tukey_right:1" "rand_exp:1" "rand_softplus:1"
  "rand_inverse_boxcox:1"
)

for arch in "${ARCHS[@]}"; do
  echo ">>> full-length $arch" >&2
  timeout 1200 python experiments/battery.py --model TGP --arch "$arch" \
      --dataset boston --num_inducing 5 --seeds 1 --epochs 15000 \
      --precision fp32 --out "$OUT" 2>>"$OUT.err" | tail -3 >&2 \
    || echo "{\"model\": \"TGP\", \"dataset\": \"boston\", \"M\": 5, \"arch\": \"$arch\", \"epochs\": 15000, \"status\": \"crash_or_timeout\"}" >> "$OUT"
done
echo "full-length sweep done -> $OUT" >&2
