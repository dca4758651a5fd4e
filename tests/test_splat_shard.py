"""Sharded splat == single-device splat, bitwise, on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se3ds_tpu.ops import geometry
from se3ds_tpu.parallel import mesh as mesh_lib
from se3ds_tpu.parallel import splat_shard


H, W = 32, 64


def _random_cloud(seed, num_points, channels=3, collision_heavy=False):
  rng = np.random.RandomState(seed)
  scale = 2.0 if collision_heavy else 8.0  # tight scene -> dense collisions
  coords = np.concatenate([
      rng.uniform(-scale, scale, (1, 3, num_points)),
      np.ones((1, 1, num_points))], axis=1).astype(np.float32)
  # Sprinkle void points and zero-depth points among the cloud.
  feats = rng.randint(0, 256, (1, num_points, channels)).astype(np.float32)
  void = rng.rand(1, num_points) < 0.1
  feats[void] = -1.0
  return jnp.asarray(coords), jnp.asarray(feats)


@pytest.fixture(scope='module')
def mesh8():
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 devices')
  return mesh_lib.create_mesh(num_data=8, num_spatial=1)


@pytest.mark.parametrize('splat_mode', ['fast', 'fast_exact', 'scatter'])
@pytest.mark.parametrize('collision_heavy', [False, True])
def test_sharded_bitwise_equal(mesh8, splat_mode, collision_heavy):
  coords, feats = _random_cloud(0, 4096, collision_heavy=collision_heavy)
  ref_depth, ref_feat = geometry.project_feats_to_equirectangular(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      splat_mode=splat_mode)
  depth, feat = splat_shard.project_feats_to_equirectangular_sharded(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      mesh=mesh8, splat_mode=splat_mode)
  np.testing.assert_array_equal(np.asarray(ref_depth), np.asarray(depth))
  np.testing.assert_array_equal(np.asarray(ref_feat), np.asarray(feat))


def test_sharded_non_divisible_points(mesh8):
  # M = 4097 is not divisible by 8: the void-pad path must not change
  # the output.
  coords, feats = _random_cloud(1, 4097)
  ref_depth, ref_feat = geometry.project_feats_to_equirectangular(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      splat_mode='fast')
  depth, feat = splat_shard.project_feats_to_equirectangular_sharded(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      mesh=mesh8, splat_mode='fast')
  np.testing.assert_array_equal(np.asarray(ref_depth), np.asarray(depth))
  np.testing.assert_array_equal(np.asarray(ref_feat), np.asarray(feat))


def test_sharded_scalar_feats(mesh8):
  # Semantic-style (N, M) scalar features.
  coords, feats = _random_cloud(2, 4096, channels=1)
  feats = feats[..., 0]
  ref_depth, ref_feat = geometry.project_feats_to_equirectangular(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      splat_mode='fast')
  depth, feat = splat_shard.project_feats_to_equirectangular_sharded(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      mesh=mesh8, splat_mode='fast')
  assert feat.shape == ref_feat.shape == (1, H, W)
  np.testing.assert_array_equal(np.asarray(ref_depth), np.asarray(depth))
  np.testing.assert_array_equal(np.asarray(ref_feat), np.asarray(feat))


def test_sharded_many_channels_falls_back_exact(mesh8):
  # channels > 3 cannot pack into u32: both the single-device fast mode
  # and the sharded one must fall back to exact semantics.
  coords, feats = _random_cloud(3, 2048, channels=5)
  ref_depth, ref_feat = geometry.project_feats_to_equirectangular(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      splat_mode='scatter')
  depth, feat = splat_shard.project_feats_to_equirectangular_sharded(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      mesh=mesh8, splat_mode='fast')
  np.testing.assert_array_equal(np.asarray(ref_depth), np.asarray(depth))
  np.testing.assert_array_equal(np.asarray(ref_feat), np.asarray(feat))


def test_sharded_under_jit(mesh8):
  # The sharded splat must compose with an outer jit (the inference path).
  coords, feats = _random_cloud(4, 4096)

  import functools
  fn = jax.jit(functools.partial(
      splat_shard.project_feats_to_equirectangular_sharded,
      height=H, width=W, void_class=-1.0, depth_scale=20.0,
      mesh=mesh8, splat_mode='fast'))
  depth, feat = fn(feats, coords)
  ref_depth, ref_feat = geometry.project_feats_to_equirectangular(
      feats, coords, H, W, void_class=-1.0, depth_scale=20.0,
      splat_mode='fast')
  # Under an outer jit XLA may fuse the elementwise projection math
  # differently (fma contraction), shifting depths by 1 ULP; the
  # scatter/combine itself stays exact, so features remain bit-equal.
  np.testing.assert_allclose(
      np.asarray(ref_depth), np.asarray(depth), rtol=0, atol=1e-6)
  np.testing.assert_array_equal(np.asarray(ref_feat), np.asarray(feat))
