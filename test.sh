#!/bin/bash
# Launches the continuous-eval job.
python main.py \
  --gin_config=configs/lowres/lowres.gin \
  --mode=TEST \
  --model_dir="${1:-/tmp/se3ds_tpu_model}"
