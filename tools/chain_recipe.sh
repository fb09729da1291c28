#!/usr/bin/env bash
# Known-good 3-phase synthetic training chain + numerics ablation.
#
# This is the recipe that produced the round-3/round-5 bench checkpoints
# (held-out mAP ~0.33-0.34; reference recipe analog: README.md:129-145,
# train.py:271-314 in /root/reference). It previously lived at
# /tmp/chain_r5b.sh and was lost to a machine re-image — checked in so the
# chain is one command when hardware persists. Wall clock ~2.5 h on one
# v5e chip (phase 1 is the expensive joint phase, ~1 s/step: backbone
# fwd+bwd needs feature grads, so the RPN runs the XLA scan; phases 2-3
# use the fused Pallas-VJP frozen-backbone path at ~86 ms/step).
#
# IMPORTANT (ABLATION_r5.jsonl): skipping phase 1 and training frozen from
# a random backbone collapses to all-BG (mAP 0.0). The joint phase is
# load-bearing.
#
# Usage:  bash tools/chain_recipe.sh [OUTDIR=/root/.cache/bench_weights5_v2]
# Second-recipe probe (VERDICT r4 #5): add a 4th JOINT low-lr phase:
#   bash tools/chain_recipe.sh OUTDIR --second-recipe
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/root/.cache/bench_weights5_v2}"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

# Phase 1: joint (backbone + heads), 6k @ 5e-3. Saves .partial every 1000.
python tools/make_bench_weights.py --out "${OUT}_p1" --steps 6000 \
    --lr 5e-3 --train-backbone --eval-images 64 --save-every 1000
# Phase 2: frozen backbone, 6k @ 2e-3 (fast Pallas-VJP path).
python tools/make_bench_weights.py --out "${OUT}_p2" --steps 6000 \
    --lr 2e-3 --load "${OUT}_p1" --eval-images 64 --save-every 1000
# Phase 3: frozen backbone, 8k @ 1e-3.
python tools/make_bench_weights.py --out "$OUT" --steps 8000 \
    --lr 1e-3 --load "${OUT}_p2" --eval-images 128 --save-every 1000

if [[ "${2:-}" == "--second-recipe" ]]; then
    # VERDICT r4 #5: one joint RPN+detector fine-tune phase on top of the
    # converged frozen recipe (the untried second recipe family).
    python tools/make_bench_weights.py --out "${OUT}_joint4" --steps 3000 \
        --lr 5e-4 --train-backbone --load "$OUT" --eval-images 128 \
        --save-every 500
fi

# Numerics ablation at the trained operating point (PARITY.md table).
python tools/ablate_bf16.py --load "$OUT" --images 256 \
    --variants fp32,state32,state32_xla,bf16 --out ABLATION_chain.jsonl
