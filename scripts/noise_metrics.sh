#!/usr/bin/env bash
# Batch noise-robustness sweeps (reference noise_metrics.sh equivalent).
set -euo pipefail
CKPT_DIR="${CKPT_DIR:-checkpoints}"
cd "$(dirname "$0")/.."

for model in model_Cityscapes_SNN_Trpn8_Tdet12 model_Cityscapes_NoSNN; do
  snn_flags=""
  if [[ "$model" == *SNN_Trpn* ]]; then
    snn_flags="--rpn-snn --detector-snn -t-rpn 8 -t-det 12"
  fi
  echo "### gaussian sweep: $model"
  python cli/noise_calculations.py -d cityscapes $snn_flags \
      --load-model "$CKPT_DIR/$model.pth" --save-name "$model"
  echo "### rain sweep: $model"
  python cli/noise_calculations.py -d cityscapes $snn_flags \
      --load-model "$CKPT_DIR/$model.pth" --save-name "$model" --rain-noise
done
