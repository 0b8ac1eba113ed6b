#!/bin/bash
# Drive the FULL on-disk dataset pipeline on the structured scene: export a
# real COLMAP dataset (sparse/0/*.bin + PNGs, scripts/
# export_structured_dataset.py), then train through scripts/train.py -s —
# the CLI -> COLMAP parse -> reader -> resolution rules -> llffhold split ->
# trainer seam every reference mip360 script exercises
# (/root/reference/examples/mip360/1g_1b.sh:14-44 with -s <dataset>).
# All other on-chip protocols use --synthetic*; this one proves the
# dataset-file path end to end, so a real Mip360 download needs nothing new.
set -e
DS=${DS:-output/structured_colmap_ds}
ITERS=${ITERS:-500}
if [ ! -f "$DS/sparse/0/images.bin" ]; then
  python scripts/export_structured_dataset.py --out "$DS" \
    --size 1280x832 --cams 72 --points 100000 --seed 0
fi
python scripts/train.py -s "$DS" --eval --llffhold 8 \
  --iterations "$ITERS" --bsz 1 --seed 4 \
  --test_iterations 250 "$ITERS" --save_iterations "$ITERS" \
  --log_interval 100 \
  --model_path output/structured_colmap
