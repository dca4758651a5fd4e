"""Measures predict_poses (K poses of one scene, ONE program) against the
per-pose read-only loop at production shapes on the real chip.

The VLN augmentation inner loop (reference notebook cell 13) evaluates
many candidate viewpoints around one source pano; the reference
dispatches `model(position)` once per pose. `SE3DSModel.predict_poses`
runs all K splats of the shared cloud + one batch-K generator pass in a
single XLA program (se3ds_tpu/models/inference.py).

Timing follows bench.py's relay methodology: host fetch is the only
barrier; first fetch triggers the remote compile; fetch latency is
measured on a materialised array and subtracted.

Env: SE3DS_BENCH_SIZE (512), SE3DS_BENCH_GENDIMS (128), SE3DS_BENCH_K
(4), SE3DS_BENCH_ITERS (5).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  from se3ds_tpu.models import inference, model_config

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 512))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 128))
  k = int(os.environ.get('SE3DS_BENCH_K', 4))
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 5))

  config = model_config.SE3DSConfig(
      ckpt_path=None, image_height=size, gen_dims=gen_dims,
      resnet_version='101', memory_frames=2, compute_dtype='bfloat16')
  model = inference.SE3DSModel(config)

  h, w = size, size * 2
  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  poses = (rng.uniform(-1, 1, (k, 3)).astype(np.float32)
           * np.array([1, 1, 0.1], np.float32))

  def timed(fn, tag):
    out = fn()  # compile
    _ = np.asarray(out.pred_rgb[..., 0, 0, :3])
    t0 = time.perf_counter()
    _ = np.asarray(out.pred_rgb[..., 0, 0, :3])
    fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
      out = fn()
    _ = np.asarray(out.pred_rgb[..., 0, 0, :3])
    elapsed = max(time.perf_counter() - t0 - fetch, 1e-9)
    rate = iters * k / elapsed
    print(json.dumps({
        'metric': f'{w}x{h} {tag} poses/sec/chip (K={k} poses, one scene)',
        'value': round(rate, 4), 'unit': 'poses/sec'}))
    return rate

  def per_pose():
    for i in range(k):
      out = model(poses[i:i + 1])
    return out

  timed(lambda: model.predict_poses(poses), 'predict_poses')
  timed(per_pose, 'per-pose loop')


if __name__ == '__main__':
  main()
