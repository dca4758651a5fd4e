"""Quantifies the fast-splat deviation in the collision regime.

The inference default `splat_mode='fast'` (models/model_config.py) packs
an 8-bit inverted depth bucket with the feature bytes and resolves the
z-buffer with one scatter-max; its winner selection (shallowest
depth_scale/256 bucket, lexicographic byte-max tie-break) differs from the
reference's exact rule (min depth + 0.1 m window + per-channel max,
/root/reference/utils/point_cloud_utils.py:157-176). This script builds a
dense adversarial scene — two overlapping unprojected panoramas with
smooth room-like depth — and measures the pixel-level output delta
between 'fast' and the exact 'scatter' mode at a third pose.

Published numbers live in PERF.md ("Fast-splat deviation");
tests/test_splat_collision.py pins the bound.

Usage: JAX_PLATFORMS=cpu python scripts/measure_fast_splat_deviation.py
Env: SE3DS_DEV_HEIGHT (default 256), SE3DS_DEV_SEED.
"""

import os
import sys

import jax
import numpy as np

if __name__ == '__main__':
  if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3ds_tpu import constants  # noqa: E402
from se3ds_tpu.ops import geometry  # noqa: E402


def make_room_pano(height, seed, depth_scale, texture='random'):
  """Synthetic room-like RGB-D pano: smooth depth + RGB texture.

  texture='random' is ADVERSARIAL for the fast-splat comparison:
  colliding points carry uncorrelated colors, maximising the
  per-channel-max vs lexicographic-max disagreement. texture='smooth'
  models real imagery (spatially correlated colors), where colliding
  points from nearby surfaces carry similar colors.
  """
  rng = np.random.RandomState(seed)
  h, w = height, height * 2
  # Smooth depth field: a base radius modulated by low-frequency waves,
  # giving realistic multi-surface collisions after unprojection.
  yy, xx = np.meshgrid(np.linspace(0, np.pi, h),
                       np.linspace(0, 2 * np.pi, w), indexing='ij')
  radius_m = (2.5 + 0.8 * np.sin(3 * xx + rng.rand() * 6)
              + 0.5 * np.cos(2 * yy + rng.rand() * 6)
              + 0.15 * rng.rand(h, w))
  depth = np.clip(radius_m / depth_scale, 0.02, 0.95).astype(np.float32)
  if texture == 'random':
    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.int32)
  else:
    rgb = np.stack([
        127.5 + 127.4 * np.sin(f * xx + p * yy + rng.rand() * 6)
        for f, p in ((2, 1), (3, 2), (1, 3))], axis=-1).astype(np.int32)
  return rgb[None], depth[None]


def build_overlapping_cloud(height, seed, depth_scale, texture='random'):
  """Two panos 0.5 m apart, unprojected and concatenated (2*H*W points)."""
  positions = [np.zeros(3, np.float32),
               np.array([0.5, 0.2, 0.0], np.float32)]
  coords, feats = [], []
  for i, pos in enumerate(positions):
    rgb, depth = make_room_pano(height, seed + i, depth_scale, texture)
    xyz1, f = geometry.equirectangular_to_pointcloud(
        jnp.asarray(rgb), jnp.asarray(depth),
        void_class=constants.INVALID_RGB_VALUE, depth_scale=depth_scale)
    xyz1 = xyz1 + jnp.asarray(np.r_[pos, 0.0])[None, :, None]
    coords.append(xyz1)
    feats.append(f)
  return (jnp.concatenate(coords, axis=2),
          jnp.concatenate(feats, axis=1).astype(jnp.float32))


def measure(height=256, seed=0, depth_scale=20.0, texture='random'):
  coords, feats = build_overlapping_cloud(height, seed, depth_scale, texture)
  target = jnp.asarray([0.25, 0.1, 0.0, 0.0])[None, :, None]
  rel = coords - target
  h, w = height, height * 2

  out = {}
  for mode in ('scatter', 'fast', 'fast_exact'):
    d, f = geometry.project_feats_to_equirectangular(
        feats, rel, h, w, void_class=constants.INVALID_RGB_VALUE,
        depth_scale=depth_scale, splat_mode=mode)
    out[mode] = (np.asarray(d), np.asarray(f))

  d_exact, f_exact = out['scatter']
  valid = (d_exact < 1.0) & (d_exact > 0)
  n_valid = int(valid.sum())
  n_points = int(coords.shape[-1])
  stats = dict(
      height=height, seed=seed, texture=texture, points=n_points,
      valid_pixels=n_valid)
  for mode in ('fast', 'fast_exact'):
    d_m, f_m = out[mode]
    diff = np.abs(f_exact - f_m).max(axis=-1)
    n_any = int(((diff > 0) & valid).sum())
    n_gt2 = int(((diff > 2) & valid).sum())
    stats[mode] = dict(
        depth_buffer_exact=bool(np.array_equal(d_exact, d_m)),
        pct_pixels_any_diff=round(100.0 * n_any / max(n_valid, 1), 3),
        pct_pixels_diff_gt2=round(100.0 * n_gt2 / max(n_valid, 1), 3),
        max_abs_channel_diff=float(np.abs(f_exact - f_m)[valid].max()
                                   if n_valid else 0.0),
        mean_abs_channel_diff_on_valid=round(float(
            np.abs(f_exact - f_m)[valid].mean() if n_valid else 0.0), 3),
    )
  return stats


if __name__ == '__main__':
  height = int(os.environ.get('SE3DS_DEV_HEIGHT', 256))
  seeds = [int(os.environ.get('SE3DS_DEV_SEED', 0))] if (
      'SE3DS_DEV_SEED' in os.environ) else [0, 1, 2]
  import json
  for s in seeds:
    for texture in ('random', 'smooth'):
      print(json.dumps(measure(height=height, seed=s, texture=texture)))
