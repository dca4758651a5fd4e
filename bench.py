"""SE3DS-TPU benchmark: 1024x512 panoramas/sec/chip on MP3D inference.

Runs the flagship inference pipeline (point-cloud memory splat -> RGB-D
generator forward, `SE3DSModel.__call__` equivalent) at 1024x512 with the
production model config (gen_dims=128, ResNet-101) and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no GPU throughput numbers
(BASELINE.md); we anchor `vs_baseline` to an estimated reference-GPU
throughput of 2.0 panoramas/sec (V100-class, TF2 graph mode, 512x1024
RedNet-101 forward + TF scatter splat). The driver's north star is >=5x
that anchor.

Env knobs:
  SE3DS_BENCH_SIZE   image height (default 512)
  SE3DS_BENCH_DTYPE  float32|bfloat16 (default bfloat16)
  SE3DS_BENCH_FRAMES memory capacity in frames (default 2)
  SE3DS_BENCH_ITERS  timed iterations (default 10)
  SE3DS_BENCH_GENDIMS generator dims (default 128)
"""

import json
import os
import sys
import time

GPU_BASELINE_PANOS_PER_SEC = 2.0


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 512))
  dtype = os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
  frames = int(os.environ.get('SE3DS_BENCH_FRAMES', 2))
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 10))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 128))

  from se3ds_tpu.models import inference, model_config

  config = model_config.SE3DSConfig(
      ckpt_path=None, image_height=size, gen_dims=gen_dims,
      resnet_version='101', memory_frames=frames, compute_dtype=dtype,
      splat_mode=os.environ.get('SE3DS_BENCH_SPLAT', 'fast'))
  model = inference.SE3DSModel(config)

  h, w = size, size * 2
  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  pos = np.zeros((1, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos)

  target = np.array([[0.8, 0.3, 0.0]], np.float32)

  # Warmup / compile. NOTE: on relay-backed TPU backends,
  # jax.block_until_ready does not synchronise; a host fetch is the only
  # reliable barrier, and the first fetch triggers the remote compile.
  out = model(target)
  _ = np.asarray(out.pred_rgb[0, 0, :4])

  # Measure the fetch round-trip latency on a materialised array.
  t0 = time.perf_counter()
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  fetch_latency = time.perf_counter() - t0

  t0 = time.perf_counter()
  for _ in range(iters):
    out = model(target)
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  elapsed = max(time.perf_counter() - t0 - fetch_latency, 1e-9)

  panos_per_sec = iters / elapsed
  result = {
      'metric': f'{w}x{h} panoramas/sec/chip (MP3D inference)',
      'value': round(panos_per_sec, 4),
      'unit': 'panoramas/sec',
      'vs_baseline': round(panos_per_sec / GPU_BASELINE_PANOS_PER_SEC, 4),
  }
  print(json.dumps(result))


if __name__ == '__main__':
  main()
