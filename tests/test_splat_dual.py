"""Exactness of the shared-sort dual splat (splat_mode='dual_sorted').

`splat.project_dual_sorted_packed` sorts the semantic and RGB clouds
TOGETHER by (combined pixel id, depth) and resolves both guidance images
with one combining scatter; it must be bit-identical to the exact
'scatter' mode run per cloud (reference semantics,
/root/reference/utils/point_cloud_utils.py:90-183) for byte-valued
features. Scene: dense random clouds with heavy collisions, void
sentinels, and behind-camera points.
"""

import numpy as np

import jax.numpy as jnp

from se3ds_tpu import constants
from se3ds_tpu.models import inference
from se3ds_tpu.ops import geometry

H, W = 32, 64
DEPTH_SCALE = 20.0


def make_clouds(seed=0, m_sem=24576, m_rgb=18432):
  rng = np.random.RandomState(seed)
  # Coordinates in a tight shell => many points per pixel (collisions).
  sem_xyz = rng.uniform(-3, 3, (2, 4, m_sem)).astype(np.float32)
  sem_xyz[:, 3] = 1.0
  rgb_xyz = rng.uniform(-3, 3, (2, 4, m_rgb)).astype(np.float32)
  rgb_xyz[:, 3] = 1.0
  sem_feats = rng.randint(0, 42, (2, m_sem, 1)).astype(np.float32)
  rgb_feats = rng.randint(0, 256, (2, m_rgb, 3)).astype(np.float32)
  # Void points: class 0 for semantics; all-channel -1 for RGB.
  void_rgb = rng.rand(2, m_rgb) < 0.1
  rgb_feats = np.where(void_rgb[..., None],
                       np.float32(constants.INVALID_RGB_VALUE), rgb_feats)
  return (jnp.asarray(sem_xyz), jnp.asarray(sem_feats),
          jnp.asarray(rgb_xyz), jnp.asarray(rgb_feats))


def exact_pair(sem_xyz, sem_feats, rgb_xyz, rgb_feats):
  _, sem_img = geometry.project_feats_to_equirectangular(
      sem_feats, sem_xyz, H, W, constants.INVALID_SEM_VALUE, DEPTH_SCALE,
      splat_mode='scatter')
  depth, rgb_img = geometry.project_feats_to_equirectangular(
      rgb_feats, rgb_xyz, H, W, constants.INVALID_RGB_VALUE, DEPTH_SCALE,
      splat_mode='scatter')
  return depth, sem_img, rgb_img


def test_dual_sorted_bitwise_equals_exact_pair():
  args = make_clouds()
  d_ref, s_ref, r_ref = exact_pair(*args)
  d, s, r = geometry.project_dual_to_equirectangular(
      args[1], args[0], args[3], args[2], H, W,
      sem_void_class=constants.INVALID_SEM_VALUE,
      rgb_void_class=constants.INVALID_RGB_VALUE,
      depth_scale=DEPTH_SCALE)
  np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
  np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
  np.testing.assert_array_equal(np.asarray(r), np.asarray(r_ref))


def test_memory_project_dual_sorted_matches_exact():
  """memory_project(splat_mode='dual_sorted') reproduces the exact
  ('scatter') guidance bitwise — all four outputs, including the mask."""
  args = make_clouds(seed=3)
  mem = inference.MemoryState(
      coords=args[0], feats=args[1], rgb_coords=args[2], rgb=args[3],
      cursor=jnp.zeros((), jnp.int32))
  position = jnp.asarray([[0.3, -0.2, 0.05], [0.0, 0.4, -0.1]], jnp.float32)
  ref = inference.memory_project(mem, position, H, W, DEPTH_SCALE,
                                 splat_mode='scatter')
  dual = inference.memory_project(mem, position, H, W, DEPTH_SCALE,
                                  splat_mode='dual_sorted')
  for a, b in zip(dual, ref):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dual_sorted_rejects_meshless_contract_violations():
  import pytest
  args = make_clouds(seed=5)
  mem = inference.MemoryState(
      coords=args[0], feats=args[1], rgb_coords=args[2], rgb=args[3],
      cursor=jnp.zeros((), jnp.int32))
  position = jnp.zeros((2, 3), jnp.float32)
  with pytest.raises(ValueError, match='dual_sorted'):
    inference.memory_project(mem, position, H, W, DEPTH_SCALE,
                             splat_mode='dual_sorted',
                             project_semantics=False)
