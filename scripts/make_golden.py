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


def _np_interpolate_bilinear(grid, query_points, indexing='ij'):
  """Independent numpy reimplementation of
  tensorflow_addons.image.interpolate_bilinear (tfa is not installed
  here): floors clamped to [0, size-2], alphas clamped to [0, 1],
  4-corner lerp. Written from the tfa source semantics so the reference's
  rotate/perspective helpers can run for golden generation."""
  grid = np.asarray(grid, np.float32)
  q = np.asarray(query_points, np.float32)
  n, h, w, _ = grid.shape
  if indexing == 'ij':
    qy, qx = q[..., 0], q[..., 1]
  else:
    qx, qy = q[..., 0], q[..., 1]

  def axis(qv, size):
    floor = np.clip(np.floor(qv), 0.0, size - 2)
    alpha = np.clip(qv - floor, 0.0, 1.0)
    return floor.astype(np.int64), alpha

  y0, ay = axis(qy, h)
  x0, ax = axis(qx, w)
  flat = grid.reshape(n, h * w, -1)

  def gather(yi, xi):
    return np.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

  tl, tr = gather(y0, x0), gather(y0, x0 + 1)
  bl, br = gather(y0 + 1, x0), gather(y0 + 1, x0 + 1)
  top = tl + (tr - tl) * ax[..., None]
  bottom = bl + (br - bl) * ax[..., None]
  return top + (bottom - top) * ay[..., None]


def _import_reference():
  """Imports the reference repo as package `se3ds` with tfa replaced by a
  numpy-backed shim (only interpolate_bilinear is needed by pano_utils)."""
  import tensorflow as tf

  def interpolate_bilinear(grid, query_points, indexing='ij'):
    return tf.constant(
        _np_interpolate_bilinear(np.asarray(grid), np.asarray(query_points),
                                 indexing))

  tfa = types.ModuleType('tensorflow_addons')
  tfa_image = types.ModuleType('tensorflow_addons.image')
  tfa_image.interpolate_bilinear = interpolate_bilinear
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

  # --- rotate_pano (pano_utils.py:306-341) ----------------------------------
  def rotmat(yaw, pitch, roll):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return (rz @ ry @ rx).astype(np.float32)

  rot_mats = np.stack([rotmat(0.4, -0.2, 0.1),
                       rotmat(-1.1, 0.3, 0.0)]).astype(np.float32)
  out['rotate_matrices'] = rot_mats
  out['rotate_pano'] = pano_utils.rotate_pano(
      tf.constant(pano), tf.constant(rot_mats)).numpy()

  # --- project_perspective_image (pano_utils.py:344-417) --------------------
  persp = rng.uniform(0, 1, size=(12, 16, 3)).astype(np.float32)
  out['persp_in'] = persp
  out['ppi_constant'] = pano_utils.project_perspective_image(
      tf.constant(persp), tf.constant([0.9, 1.2]), output_height=10,
      rotations=tf.constant([0.25, -0.6]), pad_mode='constant',
      pad_value=0.5).numpy()
  out['ppi_mean'] = pano_utils.project_perspective_image(
      tf.constant(persp), tf.constant([0.9, 1.2]), output_height=10,
      rotations=tf.constant([0.0, 0.0]), pad_mode='mean').numpy()
  out['ppi_round'] = pano_utils.project_perspective_image(
      tf.constant(persp), tf.constant([0.9, 1.2]), output_height=10,
      rotation_matrix=tf.constant(rot_mats[0]), pad_mode='constant',
      round_to_nearest=True).numpy()

  # --- get_perspective_from_equirectangular_image (pano_utils.py:443-476) ---
  intr = np.array([[10.0, 0.0, 7.5], [0.0, 10.0, 5.5], [0.0, 0.0, 1.0]],
                  np.float32)
  out['gpe_intrinsics'] = intr
  out['gpe_out'] = pano_utils.get_perspective_from_equirectangular_image(
      tf.constant(pano[0]), tf.constant(intr), tf.constant(rot_mats[1]),
      height=12, width=16).numpy()

  golden_dir = os.path.join(REPO, 'tests', 'golden')
  os.makedirs(golden_dir, exist_ok=True)
  path = os.path.join(golden_dir, 'geometry.npz')
  np.savez_compressed(path, **out)
  print(f'wrote {path} with {len(out)} arrays')


if __name__ == '__main__':
  main()
