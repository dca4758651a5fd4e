"""Generates golden outputs from the TF reference implementation.

Runs the reference geometry stack (/root/reference, imported as `se3ds`)
on deterministic synthetic inputs and stores the results as
tests/golden/geometry.npz. Tests then compare the JAX implementation
against these arrays without needing TF at test time.

Usage: python scripts/make_golden.py
"""

import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference'


def _import_reference():
  """Imports the reference repo as package `se3ds` with tfa stubbed out."""
  # Stub tensorflow_addons (not installed; only needed for rotate/perspective
  # helpers which we do not golden-test through TF).
  tfa = types.ModuleType('tensorflow_addons')
  tfa_image = types.ModuleType('tensorflow_addons.image')
  tfa_image.interpolate_bilinear = None
  tfa_layers = types.ModuleType('tensorflow_addons.layers')
  tfa_layers.InstanceNormalization = None
  tfa.image = tfa_image
  tfa.layers = tfa_layers
  sys.modules['tensorflow_addons'] = tfa
  sys.modules['tensorflow_addons.image'] = tfa_image
  sys.modules['tensorflow_addons.layers'] = tfa_layers

  link_dir = tempfile.mkdtemp()
  os.symlink(REFERENCE, os.path.join(link_dir, 'se3ds'))
  sys.path.insert(0, link_dir)
  from se3ds.utils import pano_utils  # noqa: F401
  from se3ds.utils import point_cloud_utils  # noqa: F401
  return pano_utils, point_cloud_utils


def main():
  pano_utils, point_cloud_utils = _import_reference()
  import tensorflow as tf

  rng = np.random.RandomState(0)
  out = {}

  # --- equirectangular_pixel_rays ------------------------------------------
  for h in (3, 8, 16):
    out[f'pixel_rays_{h}'] = pano_utils.equirectangular_pixel_rays(h).numpy()

  # --- equirectangular_to_pointcloud ---------------------------------------
  B, H, W = 2, 8, 16
  depth = rng.uniform(0.0, 1.2, size=(B, H, W)).astype(np.float32)
  depth[0, 0, 0] = 0.0  # invalid cases
  depth[1, 3, 4] = 1.0
  rgb = rng.randint(0, 256, size=(B, H, W, 3)).astype(np.int32)
  sem = rng.randint(0, 42, size=(B, H, W)).astype(np.int32)
  out['e2p_depth_in'] = depth
  out['e2p_rgb_in'] = rgb
  out['e2p_sem_in'] = sem

  xyz1, feats = pano_utils.equirectangular_to_pointcloud(
      tf.constant(rgb), tf.constant(depth), void_class=-1.0,
      depth_scale=10.0, interpolation_method='bilinear')
  out['e2p_rgb_xyz1'] = xyz1.numpy()
  out['e2p_rgb_feats'] = feats.numpy()

  xyz1_s, feats_s = pano_utils.equirectangular_to_pointcloud(
      tf.constant(sem), tf.constant(depth), void_class=0,
      depth_scale=10.0, interpolation_method='nearest')
  out['e2p_sem_xyz1'] = xyz1_s.numpy()
  out['e2p_sem_feats'] = feats_s.numpy()

  # With size_mult != 1.
  xyz1_m, feats_m = pano_utils.equirectangular_to_pointcloud(
      tf.constant(rgb), tf.constant(depth), void_class=-1.0,
      depth_scale=10.0, size_mult=2.0, interpolation_method='bilinear')
  out['e2p_mult_xyz1'] = xyz1_m.numpy()
  out['e2p_mult_feats'] = feats_m.numpy()

  # --- project_to_feat ------------------------------------------------------
  M = 500
  coords = rng.uniform(-1.5, 1.5, size=(B, 4, M)).astype(np.float32)
  coords[:, 3, :] = 1.0
  coords[:, 2, :] = rng.uniform(-0.5, 12.0, size=(B, M)).astype(np.float32)
  pfeats = rng.randint(-1, 256, size=(B, M, 3)).astype(np.float32)
  out['ptf_coords'] = coords
  out['ptf_feats'] = pfeats
  pd, pf = point_cloud_utils.project_to_feat(
      tf.constant(coords), tf.constant(pfeats), height=6, width=12,
      depth_scale=10.0, input_void_class=-1.0)
  out['ptf_depth'] = pd.numpy()
  out['ptf_feat'] = pf.numpy()

  # Scalar feature variant.
  sfeats = rng.randint(0, 42, size=(B, M)).astype(np.float32)
  out['ptf_sfeats'] = sfeats
  pds, pfs = point_cloud_utils.project_to_feat(
      tf.constant(coords), tf.constant(sfeats), height=6, width=12,
      depth_scale=10.0, input_void_class=0.0)
  out['ptf_sdepth'] = pds.numpy()
  out['ptf_sfeat'] = pfs.numpy()

  # --- project_feats_to_equirectangular ------------------------------------
  M2 = 2048
  pts = rng.uniform(-8.0, 8.0, size=(B, 4, M2)).astype(np.float32)
  pts[:, 3, :] = 1.0
  rgbf = rng.randint(-1, 256, size=(B, M2, 3)).astype(np.float32)
  out['pfe_xyz1'] = pts
  out['pfe_feats'] = rgbf
  rd, rf = pano_utils.project_feats_to_equirectangular(
      tf.constant(rgbf), tf.constant(pts), height=8, width=16,
      void_class=-1.0, depth_scale=10.0)
  out['pfe_depth'] = rd.numpy()
  out['pfe_feat'] = rf.numpy()

  # --- round trip: unproject then reproject at identity pose ----------------
  rt_depth, rt_feat = pano_utils.project_feats_to_equirectangular(
      feats, xyz1, height=H, width=W, void_class=-1.0, depth_scale=10.0)
  out['rt_depth'] = rt_depth.numpy()
  out['rt_feat'] = rt_feat.numpy()

  # --- mask/crop pano -------------------------------------------------------
  pano = rng.uniform(0, 1, size=(2, 16, 32, 3)).astype(np.float32)
  out['pano_in'] = pano
  out['mask_pano'] = pano_utils.mask_pano(
      tf.constant(pano), masked_region_value=-1).numpy()
  out['crop_pano'] = pano_utils.crop_pano(tf.constant(pano)).numpy()

  # --- get_world_to_image_transform ----------------------------------------
  t = pano_utils.get_world_to_image_transform(
      (32.0, 64.0), tf.constant([0.8, 1.2]), rotations=tf.constant([0.3, -0.7]))
  out['w2i'] = t.numpy()

  golden_dir = os.path.join(REPO, 'tests', 'golden')
  os.makedirs(golden_dir, exist_ok=True)
  path = os.path.join(golden_dir, 'geometry.npz')
  np.savez_compressed(path, **out)
  print(f'wrote {path} with {len(out)} arrays')


if __name__ == '__main__':
  main()
