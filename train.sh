#!/bin/bash
# Launches SE3DS-TPU training (fixes the reference's --workdir/--model_dir
# flag mismatch by accepting either).
python main.py \
  --gin_config=configs/lowres/lowres.gin \
  --mode=TRAIN \
  --model_dir="${1:-/tmp/se3ds_tpu_model}"
