"""Micro-benchmark: splat modes at production scale on the real TPU.

Compares 'scatter' (exact 3-pass), 'fast' (packed scatter), and 'pallas'
(streaming masked-reduction kernel) on a 1M-point cloud into a 1024x512
pano, with the relay-safe timing pattern (warmup fetch, measure fetch
latency, N enqueued iterations, one fetch, subtract).

Also asserts pallas == fast bit-identity ON DEVICE before timing.

Usage: python scripts/bench_splat_modes.py
Env: SE3DS_SPLAT_POINTS (default 1048576), SE3DS_SPLAT_ITERS (default 20).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from se3ds_tpu.ops import splat, splat_pallas  # noqa: E402

H, W = 512, 1024
DEPTH_SCALE = 20.0


def make_cloud(num_points, seed=0):
  rng = np.random.RandomState(seed)
  coords = rng.uniform(-6, 6, (1, 4, num_points)).astype(np.float32)
  coords[:, 3] = 1.0
  feats = rng.randint(-1, 256, (1, num_points, 3)).astype(np.float32)
  return jnp.asarray(coords), jnp.asarray(feats)


def bench(fn, coords, feats, iters):
  out = fn(coords, feats)
  _ = np.asarray(out[0][0, :2, :2])  # warmup fetch: real compile
  t0 = time.perf_counter()
  _ = np.asarray(out[0][0, :2, :2])
  fetch_latency = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(coords, feats)
  _ = np.asarray(out[0][0, :2, :2])
  total = time.perf_counter() - t0 - fetch_latency
  return total / iters


def main():
  num_points = int(os.environ.get('SE3DS_SPLAT_POINTS', 1 << 20))
  iters = int(os.environ.get('SE3DS_SPLAT_ITERS', 20))
  coords, feats = make_cloud(num_points)

  modes = {
      'scatter': jax.jit(lambda c, f: splat.project_to_feat(
          c, f, H, W, DEPTH_SCALE, -1.0)),
      'fast': jax.jit(lambda c, f: splat.project_to_feat_fast(
          c, f, H, W, DEPTH_SCALE, -1.0)),
      'fast_exact': jax.jit(lambda c, f: splat.project_to_feat_fast_exact(
          c, f, H, W, DEPTH_SCALE, -1.0)),
      'pallas': jax.jit(lambda c, f: splat_pallas.project_to_feat_pallas(
          c, f, H, W, DEPTH_SCALE, -1.0)),
      'sorted': jax.jit(lambda c, f: splat.project_to_feat_sorted(
          c, f, H, W, DEPTH_SCALE, -1.0)),
      'sorted_packed': jax.jit(
          lambda c, f: splat.project_to_feat_sorted_packed(
              c, f, H, W, DEPTH_SCALE, -1.0)),
      'pallas_exact': jax.jit(
          lambda c, f: splat_pallas.project_to_feat_pallas_exact(
              c, f, H, W, DEPTH_SCALE, -1.0)),
  }

  # On-device equivalence: pallas must be bit-identical to fast, and
  # pallas_exact to the exact scatter mode.
  df, ff = modes['fast'](coords, feats)
  dp, fp = modes['pallas'](coords, feats)
  assert np.array_equal(np.asarray(df), np.asarray(dp)), 'depth mismatch'
  assert np.array_equal(np.asarray(ff), np.asarray(fp)), 'feat mismatch'
  print(f'# pallas == fast bit-identical on device at {num_points} points')
  ds, fs = modes['scatter'](coords, feats)
  de, fe = modes['pallas_exact'](coords, feats)
  assert np.array_equal(np.asarray(ds), np.asarray(de)), 'exact depth mismatch'
  assert np.array_equal(np.asarray(fs), np.asarray(fe)), 'exact feat mismatch'
  print('# pallas_exact == scatter bit-identical on device')
  for exact_mode in ('sorted', 'sorted_packed'):
    dm, fm = modes[exact_mode](coords, feats)
    assert np.array_equal(np.asarray(ds), np.asarray(dm)), exact_mode
    assert np.array_equal(np.asarray(fs), np.asarray(fm)), exact_mode
    print(f'# {exact_mode} == scatter bit-identical on device')

  results = {}
  for name, fn in modes.items():
    ms = bench(fn, coords, feats, iters) * 1e3
    results[name] = round(ms, 3)
    print(json.dumps({'mode': name, 'ms_per_splat': results[name],
                      'points': num_points, 'image': f'{W}x{H}'}))
  return results


if __name__ == '__main__':
  main()
