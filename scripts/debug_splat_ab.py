"""Minimal A/B: reference TF splat vs rebuild splat on the exact
frame-1 eval-rollout memory (pole-masked GT frame 0), isolating the
FID-parity guidance divergence from the generator/rollout.

Run: JAX_PLATFORMS=cpu python scripts/debug_splat_ab.py
"""

import os

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import test_fid_parity as P


def main():
  size = 64
  batches = P.make_batches(size)
  b = batches[0]
  h, w = size, size * 2
  ds = float(b['depth_scale'][0])

  import jax
  if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  from se3ds_tpu import constants
  from se3ds_tpu.ops import geometry

  # Frame-0 memory exactly as the rollout builds it.
  rgb0 = jnp.asarray(b['image'][:, 0])
  depth0 = jnp.asarray(b['depth'][:, 0])
  rgb0 = geometry.mask_pano(rgb0,
                            masked_region_value=constants.INVALID_RGB_VALUE)
  pc_rgb = jnp.clip((rgb0 * 255).astype(jnp.int32),
                    constants.INVALID_RGB_VALUE, 255)
  xyz1, feats = geometry.equirectangular_to_pointcloud(
      pc_rgb, depth0[..., 0], void_class=constants.INVALID_RGB_VALUE,
      depth_scale=ds)
  pos0 = jnp.asarray(b['position'][:, 0])
  pos1 = jnp.asarray(b['position'][:, 1])
  mem_coords = xyz1 + pos0[..., None]
  rel = mem_coords - pos1[..., None]

  rel_np = np.asarray(rel)
  feats_np = np.asarray(feats, np.float32)

  # --- ours, every mode (+ the reference-pixel-0 pollution emulator) ---
  from se3ds_tpu.ops import splat
  ours = {}
  for mode in ('sorted', 'scatter'):
    d, f = geometry.project_feats_to_equirectangular(
        jnp.asarray(feats_np), jnp.asarray(rel_np), h, w,
        void_class=constants.INVALID_RGB_VALUE, depth_scale=ds,
        splat_mode=mode)
    ours[mode] = (np.asarray(d), np.asarray(f))
    proj = geometry.equirect_view_coords(jnp.asarray(rel_np))
    dp, fp = splat.reference_pollute_pixel0(
        d, f, proj, jnp.asarray(feats_np), h, w,
        constants.INVALID_RGB_VALUE, ds)
    ours[mode + '+pollute'] = (np.asarray(dp), np.asarray(fp))

  # --- reference TF ---
  import tensorflow as tf
  from _ref_tf import import_reference_models
  import_reference_models()
  from se3ds.utils import pano_utils as ref_pano

  # --- memory-construction A/B: reference mask_pano + unprojection ---
  t_rgb0 = ref_pano.mask_pano(
      tf.constant(np.asarray(b['image'][:, 0])),
      masked_region_value=float(constants.INVALID_RGB_VALUE))
  print('mask_pano equal:',
        np.array_equal(np.asarray(t_rgb0), np.asarray(rgb0)))
  t_pc_rgb = tf.clip_by_value(
      tf.cast(t_rgb0 * 255, tf.int32), constants.INVALID_RGB_VALUE, 255)
  print('pc_rgb equal:',
        np.array_equal(np.asarray(t_pc_rgb), np.asarray(pc_rgb)))
  t_xyz1, t_feats = ref_pano.equirectangular_to_pointcloud(
      t_pc_rgb, tf.constant(np.asarray(b['depth'][:, 0, ..., 0])),
      constants.INVALID_RGB_VALUE, ds)
  print('xyz1 maxdiff:',
        float(np.abs(np.asarray(t_xyz1) - np.asarray(xyz1)).max()),
        'feats maxdiff:',
        float(np.abs(np.asarray(t_feats) - np.asarray(feats)).max()))

  t_rel = tf.constant(np.asarray(t_xyz1)) + tf.constant(
      np.asarray(pos0)[..., None]) - tf.constant(np.asarray(pos1)[..., None])
  rd, rf = ref_pano.project_feats_to_equirectangular(
      tf.cast(t_feats, tf.float32), t_rel, h, w,
      float(constants.INVALID_RGB_VALUE), ds)
  rd, rf = np.asarray(rd), np.asarray(rf)

  for mode, (od, of) in ours.items():
    dd = np.abs(rd - od)
    df = np.abs(rf - of).max(axis=-1)
    bad = (dd > 1e-6) | (df > 1e-6)
    print(f'{mode}: {int(bad.sum())} px differ '
          f'(depth max {dd.max():.4g}, feat max {df.max():.4g})')
    if bad.any():
      idx = np.argwhere(bad)
      print(f'  first 10: {idx[:10].tolist()}')
      # Structure: how many differing pixels are empty on one side?
      ref_empty = rd >= 1.0 - 1e-6
      our_empty = od >= 1.0 - 1e-6
      print(f'  ref-empty&our-not: {int((bad & ref_empty & ~our_empty).sum())}, '
            f'our-empty&ref-not: {int((bad & our_empty & ~ref_empty).sum())}, '
            f'both-nonempty: {int((bad & ~ref_empty & ~our_empty).sum())}, '
            f'both-empty: {int((bad & ref_empty & our_empty).sum())}')
      b0, r0, c0 = idx[0]
      print(f'  sample px {idx[0].tolist()}: ref d={rd[b0, r0, c0]:.6f} '
            f'f={rf[b0, r0, c0].tolist()} | our d={od[b0, r0, c0]:.6f} '
            f'f={of[b0, r0, c0].tolist()}')


if __name__ == '__main__':
  main()
