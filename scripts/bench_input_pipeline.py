"""Host input-pipeline throughput vs device demand (VERDICT r2 #8).

Measures the real training input path — native C++ TFRecord reader +
PNG decode (native/dataloader.cc) + the full augmentation/batch
transforms of R2RImageDataset.input_fn — on production-shaped records
(1024-high source panos, configs/lowres/lowres.gin:37-38) and reports
records/sec, alongside the device-side demand (batch * d_steps *
steps/sec of the benched train step) for comparison.

The result row lives in PERF.md ("Host pipeline vs device demand").

Usage: python scripts/bench_input_pipeline.py   (CPU-only; no jax)
Env: SE3DS_PIPE_HEIGHT (default 1024), SE3DS_PIPE_RECORDS (default 24),
     SE3DS_PIPE_SECONDS (default 20), SE3DS_PIPE_IMAGE_SIZE (default 128),
     SE3DS_PIPE_DIR (reuse/create the fixture in this dir instead of a
     fresh tempdir — fixture generation costs ~2 min, so A/B runs of the
     decode path should share one).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3ds_tpu.data import datasets as ds_lib  # noqa: E402
from se3ds_tpu.data import native_loader  # noqa: E402
from se3ds_tpu.data import synthetic  # noqa: E402


def main():
  height = int(os.environ.get('SE3DS_PIPE_HEIGHT', 1024))
  num_records = int(os.environ.get('SE3DS_PIPE_RECORDS', 24))
  seconds = float(os.environ.get('SE3DS_PIPE_SECONDS', 20))
  image_size = int(os.environ.get('SE3DS_PIPE_IMAGE_SIZE', 128))

  import tempfile
  workdir = os.environ.get('SE3DS_PIPE_DIR') or tempfile.mkdtemp(
      prefix='se3ds_pipe_')
  os.makedirs(workdir, exist_ok=True)
  path = os.path.join(workdir, f'train-{height}-{num_records}.tfrecord')
  if not os.path.exists(path):
    t0 = time.perf_counter()
    synthetic.write_image_fixture(path, num_examples=num_records,
                                  height=height)
    print(f'# fixture: {num_records} {height}-high records in '
          f'{time.perf_counter() - t0:.1f}s, '
          f'{os.path.getsize(path) / 1e6:.1f} MB')
  else:
    print(f'# fixture reused: {path} ({os.path.getsize(path) / 1e6:.1f} MB)')

  ds = ds_lib.R2RImageDataset(image_size=image_size,
                              preprocessed_image_height=height,
                              data_dir=workdir + '/')
  it = ds.input_fn(split='train', global_batch_size=8, shuffle=True,
                   shuffle_buffer_size=8, file_pattern=path, seed=0)

  # Warmup (thread spin-up + first decodes), then timed window.
  batch = next(it)
  assert batch['image'].shape[1] == image_size, batch['image'].shape
  n = 0
  t0 = time.perf_counter()
  while time.perf_counter() - t0 < seconds:
    batch = next(it)
    n += batch['image'].shape[0]
  elapsed = time.perf_counter() - t0
  records_per_sec = n / elapsed

  result = {
      'metric': f'host input pipeline records/sec ({height}-high panos '
                f'-> {image_size}x{image_size * 2}, native loader '
                f'{"ON" if native_loader.available() else "OFF"})',
      'value': round(records_per_sec, 2),
      'records': n,
      'seconds': round(elapsed, 1),
  }
  print(json.dumps(result))
  # Device demand at the measured round-2 train operating point
  # (PERF.md): 256x128 gen_dims-64 batch-32 runs 5.89 steps/sec; each
  # step consumes batch * d_step_per_g_step = 64 records -> 377
  # records/sec of 1024-high source panos.
  demand = 5.89 * 32 * 2
  print(json.dumps({
      'metric': 'device demand at 256x128/batch-32 train point',
      'value': round(demand, 1),
      'host_over_demand': round(records_per_sec / demand, 3)}))
  return records_per_sec


if __name__ == '__main__':
  main()
