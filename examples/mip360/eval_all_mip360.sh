#!/bin/bash
# Train + render + metrics for all 7 Mip360 scenes in two configs
# (reference counterpart: eval_all_mip360.sh + render_and_metrics.sh).
set -e
DATA=${1:?dataset root}
OUT=${2:-output/mip360}
for SCENE in stump bicycle kitchen room counter garden bonsai; do
  bash examples/mip360/1chip_1b.sh "$DATA" "$SCENE" "$OUT"
  bash examples/mip360/Nchip_4b.sh "$DATA" "$SCENE" "$OUT"
  for RUN in "${SCENE}_1chip_1b" "${SCENE}_Nchip_4b"; do
    python scripts/render.py -m "$OUT/$RUN" --skip_train
    python scripts/metrics.py -m "$OUT/$RUN"
  done
done
python scripts/analyze.py --model_paths "$OUT"/*
