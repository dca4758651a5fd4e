"""Golden-value tests for the geometry core against the TF reference.

Golden arrays are produced by scripts/make_golden.py, which runs the actual
reference implementation (/root/reference) on fixed synthetic inputs.
"""

import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

from se3ds_tpu import constants
from se3ds_tpu.ops import geometry, splat

GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), 'golden', 'geometry.npz'))


@pytest.mark.parametrize('h', [3, 8, 16])
def test_pixel_rays_golden(h):
  rays = geometry.equirectangular_pixel_rays(h)
  np.testing.assert_allclose(rays, GOLDEN[f'pixel_rays_{h}'], atol=1e-5)


def test_equirectangular_to_pointcloud_rgb_golden():
  xyz1, feats = geometry.equirectangular_to_pointcloud(
      jnp.asarray(GOLDEN['e2p_rgb_in']), jnp.asarray(GOLDEN['e2p_depth_in']),
      void_class=-1.0, depth_scale=10.0, interpolation_method='bilinear')
  np.testing.assert_allclose(xyz1, GOLDEN['e2p_rgb_xyz1'], atol=1e-4)
  np.testing.assert_allclose(feats, GOLDEN['e2p_rgb_feats'], atol=1e-4)


def test_equirectangular_to_pointcloud_sem_golden():
  xyz1, feats = geometry.equirectangular_to_pointcloud(
      jnp.asarray(GOLDEN['e2p_sem_in']), jnp.asarray(GOLDEN['e2p_depth_in']),
      void_class=0, depth_scale=10.0, interpolation_method='nearest')
  np.testing.assert_allclose(xyz1, GOLDEN['e2p_sem_xyz1'], atol=1e-4)
  np.testing.assert_array_equal(np.asarray(feats), GOLDEN['e2p_sem_feats'])


def test_equirectangular_to_pointcloud_size_mult_golden():
  xyz1, feats = geometry.equirectangular_to_pointcloud(
      jnp.asarray(GOLDEN['e2p_rgb_in']), jnp.asarray(GOLDEN['e2p_depth_in']),
      void_class=-1.0, depth_scale=10.0, size_mult=2.0,
      interpolation_method='bilinear')
  np.testing.assert_allclose(xyz1, GOLDEN['e2p_mult_xyz1'], atol=1e-3)
  np.testing.assert_allclose(feats, GOLDEN['e2p_mult_feats'], atol=1e-3)


def _corner_mask(shape_hw, batch):
  """Masks pixel (0, 0) of batch 0, where the reference scatters garbage
  from invalid points (see splat.py module docstring)."""
  m = np.ones((batch,) + shape_hw, bool)
  m[0, 0, 0] = False
  return m


@pytest.mark.parametrize('splat_fn', [splat.project_to_feat,
                                      splat.project_to_feat_sorted])
def test_project_to_feat_golden(splat_fn):
  pd, pf = splat_fn(
      jnp.asarray(GOLDEN['ptf_coords']), jnp.asarray(GOLDEN['ptf_feats']),
      height=6, width=12, depth_scale=10.0, input_void_class=-1.0)
  mask = _corner_mask((6, 12), 2)
  np.testing.assert_allclose(np.asarray(pd)[mask], GOLDEN['ptf_depth'][mask],
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(pf)[mask], GOLDEN['ptf_feat'][mask],
                             atol=1e-5)


@pytest.mark.parametrize('splat_fn', [splat.project_to_feat,
                                      splat.project_to_feat_sorted])
def test_project_to_feat_scalar_golden(splat_fn):
  pd, pf = splat_fn(
      jnp.asarray(GOLDEN['ptf_coords']), jnp.asarray(GOLDEN['ptf_sfeats']),
      height=6, width=12, depth_scale=10.0, input_void_class=0.0)
  mask = _corner_mask((6, 12), 2)
  np.testing.assert_allclose(np.asarray(pd)[mask], GOLDEN['ptf_sdepth'][mask],
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(pf)[mask], GOLDEN['ptf_sfeat'][mask],
                             atol=1e-5)


@pytest.mark.parametrize('use_sorted', [False, True])
def test_project_feats_to_equirectangular_golden(use_sorted):
  rd, rf = geometry.project_feats_to_equirectangular(
      jnp.asarray(GOLDEN['pfe_feats']), jnp.asarray(GOLDEN['pfe_xyz1']),
      height=8, width=16, void_class=-1.0, depth_scale=10.0,
      use_sorted_splat=use_sorted)
  mask = _corner_mask((8, 16), 2)
  np.testing.assert_allclose(np.asarray(rd)[mask], GOLDEN['pfe_depth'][mask],
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(rf)[mask], GOLDEN['pfe_feat'][mask],
                             atol=1e-4)


def test_roundtrip_golden():
  xyz1, feats = geometry.equirectangular_to_pointcloud(
      jnp.asarray(GOLDEN['e2p_rgb_in']), jnp.asarray(GOLDEN['e2p_depth_in']),
      void_class=-1.0, depth_scale=10.0, interpolation_method='bilinear')
  rd, rf = geometry.project_feats_to_equirectangular(
      feats, xyz1, height=8, width=16, void_class=-1.0, depth_scale=10.0)
  mask = _corner_mask((8, 16), 2)
  np.testing.assert_allclose(np.asarray(rd)[mask], GOLDEN['rt_depth'][mask],
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(rf)[mask], GOLDEN['rt_feat'][mask],
                             atol=1e-4)


def test_mask_pano_golden():
  out = geometry.mask_pano(jnp.asarray(GOLDEN['pano_in']),
                           masked_region_value=-1)
  np.testing.assert_allclose(out, GOLDEN['mask_pano'], atol=1e-6)


def test_crop_pano_golden():
  out = geometry.crop_pano(jnp.asarray(GOLDEN['pano_in']))
  np.testing.assert_allclose(out, GOLDEN['crop_pano'], atol=1e-6)


def test_world_to_image_transform_golden():
  t = geometry.get_world_to_image_transform(
      (32.0, 64.0), jnp.array([0.8, 1.2]), rotations=jnp.array([0.3, -0.7]))
  np.testing.assert_allclose(t, GOLDEN['w2i'], atol=1e-5)


def test_splat_variants_agree():
  """Dense and sorted splat must agree everywhere (both drop invalid pts)."""
  pd1, pf1 = splat.project_to_feat(
      jnp.asarray(GOLDEN['ptf_coords']), jnp.asarray(GOLDEN['ptf_feats']),
      height=6, width=12, depth_scale=10.0, input_void_class=-1.0)
  pd2, pf2 = splat.project_to_feat_sorted(
      jnp.asarray(GOLDEN['ptf_coords']), jnp.asarray(GOLDEN['ptf_feats']),
      height=6, width=12, depth_scale=10.0, input_void_class=-1.0)
  np.testing.assert_allclose(pd1, pd2, atol=1e-6)
  np.testing.assert_allclose(pf1, pf2, atol=1e-6)


def _dense_collision_cloud(num_points=6000, channels=3, seed=0,
                           byte_feats=True, scale=10.0):
  """Random cloud aimed at a tiny image: nearly every pixel's 0.1 m
  window holds several points, exercising run-min propagation, the raw
  vs clipped depth distinction (some depths beyond depth_scale), voids,
  and the per-channel window max."""
  rng = np.random.RandomState(seed)
  coords = rng.uniform(-4, 4, (2, 4, num_points)).astype(np.float32)
  coords[:, 3] = 1.0
  # Cluster depths so collision windows are dense; push some past scale.
  coords[:, 2] = np.abs(coords[:, 2]) * 0.2 + rng.choice(
      [0.5, 0.55, scale - 0.02, scale + 3.0], num_points)
  if byte_feats:
    feats = rng.randint(-1, 256, (2, num_points, channels)).astype(
        np.float32)
  else:
    feats = rng.uniform(-300.0, 300.0, (2, num_points, channels)).astype(
        np.float32)
    feats[rng.uniform(size=feats.shape[:2]) < 0.05] = -1.0  # voids
  return jnp.asarray(coords), jnp.asarray(feats)


@pytest.mark.parametrize('void', [0.0, 5.0])
def test_sorted_matches_scatter_bitwise_dense(void):
  """The rewritten log-step 'sorted' mode must be BIT-identical to the
  defining 'scatter' mode on a heavy-collision cloud with general f32
  feature values (not byte-representable)."""
  coords, feats = _dense_collision_cloud(byte_feats=False)
  pd1, pf1 = splat.project_to_feat(coords, feats, height=6, width=12,
                                   depth_scale=10.0, input_void_class=-1.0,
                                   output_void_class=void)
  pd2, pf2 = splat.project_to_feat_sorted(
      coords, feats, height=6, width=12, depth_scale=10.0,
      input_void_class=-1.0, output_void_class=void)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))


@pytest.mark.parametrize('channels', [1, 3])
@pytest.mark.parametrize('void', [0.0, 5.0])
def test_sorted_packed_matches_scatter_bitwise_dense(channels, void):
  """'sorted_packed' is exact (incl. the reference's per-channel window
  max) whenever feats are integer-valued bytes — all product data."""
  coords, feats = _dense_collision_cloud(byte_feats=True, channels=channels)
  pd1, pf1 = splat.project_to_feat(coords, feats, height=6, width=12,
                                   depth_scale=10.0, input_void_class=-1.0,
                                   output_void_class=void)
  pd2, pf2 = splat.project_to_feat_sorted_packed(
      coords, feats, height=6, width=12, depth_scale=10.0,
      input_void_class=-1.0, output_void_class=void)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))


def test_sorted_packed_scalar_and_empty():
  coords, feats = _dense_collision_cloud(channels=1)
  sfeats = feats[..., 0]
  pd1, pf1 = splat.project_to_feat(coords, sfeats, height=6, width=12,
                                   depth_scale=10.0, input_void_class=-1.0)
  pd2, pf2 = splat.project_to_feat_sorted_packed(
      coords, sfeats, height=6, width=12, depth_scale=10.0,
      input_void_class=-1.0)
  assert pf2.shape == (2, 6, 12)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))
  # Empty cloud: all-void image at depth 1.0 (= depth_scale scaled).
  empty_c = jnp.zeros((1, 4, 0), jnp.float32)
  empty_f = jnp.zeros((1, 0, 3), jnp.float32)
  pd, pf = splat.project_to_feat_sorted_packed(
      empty_c, empty_f, height=4, width=8, depth_scale=10.0,
      input_void_class=-1.0, output_void_class=2.0)
  np.testing.assert_array_equal(np.asarray(pd), np.ones((1, 4, 8)))
  np.testing.assert_array_equal(np.asarray(pf), np.full((1, 4, 8, 3), 2.0))


def test_sorted_packed_four_channels_falls_back():
  coords, feats = _dense_collision_cloud(channels=4)
  pd1, pf1 = splat.project_to_feat(coords, feats, height=6, width=12,
                                   depth_scale=10.0, input_void_class=-1.0)
  pd2, pf2 = splat.project_to_feat_sorted_packed(
      coords, feats, height=6, width=12, depth_scale=10.0,
      input_void_class=-1.0)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))


def test_rotate_pano_identity():
  pano = jnp.asarray(GOLDEN['pano_in'])
  eye = jnp.tile(jnp.eye(3)[None], (pano.shape[0], 1, 1))
  out = geometry.rotate_pano(pano, eye)
  # Pole rows collapse to atan2(0, 0) = 0 heading, and the wrap column
  # maps to heading ±pi ambiguously (both also true of the TF reference);
  # compare the interior only.
  np.testing.assert_allclose(out[:, 1:-1, 1:-1], pano[:, 1:-1, 1:-1],
                             atol=1e-3)


def test_perspective_roundtrip_shapes():
  img = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (24, 32, 3)),
                    jnp.float32)
  pano = geometry.project_perspective_image(
      img, jnp.array([0.8, 1.0]), output_height=16)
  assert pano.shape == (16, 32, 3)
  persp = geometry.get_perspective_from_equirectangular_image(
      pano, jnp.eye(3), jnp.eye(3), height=8, width=8)
  assert persp.shape == (8, 8, 3)


def test_fast_splat_matches_exact_without_collisions():
  """With depth gaps larger than both the 0.1 m window and the fast
  mode's 7.8 cm buckets, fast == exact."""
  rng = np.random.RandomState(7)
  B, M, H, W = 2, 300, 6, 12
  px = rng.randint(0, W, (B, M))
  py = rng.randint(0, H, (B, M))
  # Depths on a coarse grid (multiples of 1 m, >= 1) -> unique per pixel.
  depth = rng.randint(1, 19, (B, M)).astype(np.float32)
  # Make depths unique per pixel by adding per-point jitter on the metre
  # grid (duplicates collapse to the same bucket AND window -> still fine
  # as long as feats are identical; simpler: deduplicate pixels).
  flat = py * W + px
  for b in range(B):
    _, first = np.unique(flat[b], return_index=True)
    mask = np.zeros(M, bool)
    mask[first] = True
    depth[b, ~mask] = 0  # invalidate duplicates via depth=0
  x = (px + 0.5) / W * 2 - 1
  y = (py + 0.5) / H * 2 - 1
  coords = np.stack([x * depth, y * depth, depth, np.ones_like(depth)], 1)
  feats = rng.randint(0, 256, (B, M, 3)).astype(np.float32)

  pd1, pf1 = splat.project_to_feat(
      jnp.asarray(coords), jnp.asarray(feats), H, W,
      depth_scale=20.0, input_void_class=-1.0)
  pd2, pf2 = splat.project_to_feat_fast(
      jnp.asarray(coords), jnp.asarray(feats), H, W,
      depth_scale=20.0, input_void_class=-1.0)
  np.testing.assert_allclose(np.asarray(pd1), np.asarray(pd2), atol=1e-6)
  np.testing.assert_allclose(np.asarray(pf1), np.asarray(pf2), atol=1e-6)


def test_fast_splat_depth_always_exact():
  pd1, _ = splat.project_to_feat(
      jnp.asarray(GOLDEN['ptf_coords']), jnp.asarray(GOLDEN['ptf_feats']),
      height=6, width=12, depth_scale=10.0, input_void_class=-1.0)
  pd2, _ = splat.project_to_feat_fast(
      jnp.asarray(GOLDEN['ptf_coords']), jnp.asarray(GOLDEN['ptf_feats']),
      height=6, width=12, depth_scale=10.0, input_void_class=-1.0)
  np.testing.assert_allclose(np.asarray(pd1), np.asarray(pd2), atol=1e-6)


def test_pallas_splat_interpret_matches_fast():
  """The Pallas tiled-splat kernel (interpreter mode) is bit-identical to
  the packed-scatter fast path."""
  from se3ds_tpu.ops import splat_pallas
  rng = np.random.RandomState(11)
  coords = rng.uniform(-6, 6, (2, 4, 4000)).astype(np.float32)
  coords[:, 3] = 1.0
  feats = rng.randint(-1, 256, (2, 4000, 3)).astype(np.float32)
  pd1, pf1 = splat.project_to_feat_fast(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=20.0, input_void_class=-1.0)
  pd2, pf2 = splat_pallas.project_to_feat_pallas(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=20.0, input_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))


def test_pallas_splat_empty_cloud():
  """M == 0 must return the all-void image (a zero-step Pallas grid
  would leave the output buffers uninitialised; the wrapper falls back
  to the XLA path, whose empty scatter is a no-op on the init values)."""
  from se3ds_tpu.ops import splat_pallas
  coords = jnp.zeros((1, 4, 0), jnp.float32)
  feats = jnp.zeros((1, 0, 3), jnp.float32)
  pd, pf = splat_pallas.project_to_feat_pallas(
      coords, feats, 32, 64, depth_scale=20.0, input_void_class=-1.0,
      output_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd), np.ones((1, 32, 64)))
  np.testing.assert_array_equal(np.asarray(pf), np.full((1, 32, 64, 3), -1.0))


def test_pallas_exact_splat_interpret_matches_scatter():
  """The exact-window Pallas kernel (interpreter mode) is bit-identical
  to the exact 'scatter' mode on a dense collision-heavy cloud (~2
  points/pixel, depth_scale low enough to exercise clipping)."""
  from se3ds_tpu.ops import splat_pallas
  rng = np.random.RandomState(13)
  coords = rng.uniform(-6, 6, (2, 4, 4000)).astype(np.float32)
  coords[:, 3] = 1.0
  feats = rng.randint(-1, 256, (2, 4000, 3)).astype(np.float32)
  pd1, pf1 = splat.project_to_feat(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=5.0, input_void_class=-1.0)
  pd2, pf2 = splat_pallas.project_to_feat_pallas_exact(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=5.0, input_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))


def test_pallas_exact_splat_per_channel_max_window():
  """Collision window resolves with the reference's PER-CHANNEL max
  (channel-mixing), not a lexicographic tie-break: two in-window points
  with features (10, 200, 7) and (200, 10, 7) must yield (200, 200, 7);
  a point 0.2 m deeper stays outside the 0.1 m window."""
  from se3ds_tpu.ops import splat_pallas
  H, W = 8, 16
  px, py = 5, 3
  depths = np.array([2.0, 2.05, 2.2], np.float32)
  x = ((px + 0.5) / W * 2 - 1) * depths
  y = ((py + 0.5) / H * 2 - 1) * depths
  coords = np.stack([x, y, depths, np.ones_like(depths)], 0)[None]
  feats = np.array([[10, 200, 7], [200, 10, 7], [255, 255, 255]],
                   np.float32)[None]
  pd, pf = splat_pallas.project_to_feat_pallas_exact(
      jnp.asarray(coords), jnp.asarray(feats), H, W,
      depth_scale=20.0, input_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pf[0, py, px]), [200, 200, 7])
  np.testing.assert_allclose(np.asarray(pd[0, py, px]), 2.0 / 20.0,
                             atol=1e-6)
  pd1, pf1 = splat.project_to_feat(
      jnp.asarray(coords), jnp.asarray(feats), H, W,
      depth_scale=20.0, input_void_class=-1.0)
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf))
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd))


def test_pallas_splat_sparse_cloud_spans_row_blocks():
  """Sparse cloud (fewer points than image rows): a single sorted chunk
  spans MANY aligned row blocks, so one kernel invocation walks the
  whole multi-block range (the row-block loop's worst case — the dense
  tests above only ever span 2-3 rows per chunk). Both kernels must
  stay bit-identical to their XLA references."""
  from se3ds_tpu.ops import splat_pallas
  rng = np.random.RandomState(7)
  coords = rng.uniform(-6, 6, (1, 4, 90)).astype(np.float32)
  coords[:, 3] = 1.0
  feats = rng.randint(-1, 256, (1, 90, 3)).astype(np.float32)
  pd1, pf1 = splat.project_to_feat_fast(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=20.0, input_void_class=-1.0)
  pd2, pf2 = splat_pallas.project_to_feat_pallas(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=20.0, input_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))
  pd3, pf3 = splat.project_to_feat(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=20.0, input_void_class=-1.0)
  pd4, pf4 = splat_pallas.project_to_feat_pallas_exact(
      jnp.asarray(coords), jnp.asarray(feats), 32, 64,
      depth_scale=20.0, input_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd3), np.asarray(pd4))
  np.testing.assert_array_equal(np.asarray(pf3), np.asarray(pf4))


def test_pallas_exact_splat_scalar_feats_and_empty():
  """Scalar (semantic) feature path + the empty-cloud fallback."""
  from se3ds_tpu.ops import splat_pallas
  rng = np.random.RandomState(5)
  coords = rng.uniform(-4, 4, (1, 4, 2000)).astype(np.float32)
  coords[:, 3] = 1.0
  feats = rng.randint(0, 42, (1, 2000)).astype(np.float32)
  pd1, pf1 = splat.project_to_feat(
      jnp.asarray(coords), jnp.asarray(feats), 16, 32,
      depth_scale=10.0, input_void_class=0.0)
  pd2, pf2 = splat_pallas.project_to_feat_pallas_exact(
      jnp.asarray(coords), jnp.asarray(feats), 16, 32,
      depth_scale=10.0, input_void_class=0.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd1), np.asarray(pd2))
  np.testing.assert_array_equal(np.asarray(pf1), np.asarray(pf2))

  empty_c = jnp.zeros((1, 4, 0), jnp.float32)
  empty_f = jnp.zeros((1, 0, 3), jnp.float32)
  pd, pf = splat_pallas.project_to_feat_pallas_exact(
      empty_c, empty_f, 32, 64, depth_scale=20.0, input_void_class=-1.0,
      output_void_class=-1.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(pd), np.ones((1, 32, 64)))
  np.testing.assert_array_equal(np.asarray(pf), np.full((1, 32, 64, 3), -1.0))


def test_pinhole_intrinsics_analytic():
  """hfov=90deg -> focal 1/tan(45deg)=1 -> identity-scaled intrinsics
  (reference point_cloud_utils.py:23-29)."""
  k = np.asarray(geometry.get_intrinsic_matrix(math.pi / 2))
  np.testing.assert_allclose(k, np.eye(4), atol=1e-6)
  k60 = np.asarray(geometry.get_intrinsic_matrix(math.pi / 3))
  assert np.isclose(k60[0, 0], 1.0 / math.tan(math.pi / 6))


def test_pinhole_unprojection_analytic_plane():
  """A constant-depth image with hfov=90deg unprojects to the image-plane
  grid scaled by metric depth (inv(K) = I)."""
  h = w = 8
  depth01 = 0.25  # metric = 5 m at DEPTH_SCALE 20
  depth = jnp.full((1, h, w), depth01)
  feats = jnp.ones((1, h, w), jnp.float32)
  xyz1, ff = geometry.get_filtered_coords_and_feats(
      feats, depth, constants.DEPTH_SCALE, hfov=math.pi / 2)
  xyz1 = np.asarray(xyz1).reshape(4, h, w)
  metric = depth01 * constants.DEPTH_SCALE
  xs, ys = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
  np.testing.assert_allclose(xyz1[0], xs * metric, atol=1e-5)
  np.testing.assert_allclose(xyz1[1], ys * metric, atol=1e-5)
  np.testing.assert_allclose(xyz1[2], metric, atol=1e-5)
  np.testing.assert_allclose(np.asarray(ff), 1.0)


def test_pinhole_unprojection_filters_invalid_depth():
  """Invalid depth (<=0 or >= depth_scale) zeroes coords and feats
  (reference point_cloud_utils.py:70-84)."""
  h = w = 4
  depth = np.full((1, h, w), 0.5, np.float32)
  depth[0, 0, 0] = 0.0   # invalid: zero depth
  depth[0, 1, 1] = 1.0   # invalid: max depth
  feats = np.full((1, h, w, 3), 7.0, np.float32)
  xyz1, ff = geometry.get_filtered_coords_and_feats(
      jnp.asarray(feats), jnp.asarray(depth), constants.DEPTH_SCALE)
  xyz1 = np.asarray(xyz1).reshape(4, h, w)
  ff = np.asarray(ff).reshape(h, w, 3)
  assert np.all(xyz1[:, 0, 0] == 0)
  assert np.all(xyz1[:, 1, 1] == 0)
  assert np.all(ff[0, 0] == 0) and np.all(ff[1, 1] == 0)
  assert np.all(ff[2, 2] == 7.0)


@pytest.mark.parametrize('multi_channel', [False, True])
def test_pinhole_roundtrip_project(multi_channel):
  """Unproject -> z-buffer reproject round trip: shapes and ranges
  (reference point_cloud_utils_test.py:26-64)."""
  batch_size, image_size = 2, 32
  rng = np.random.RandomState(0)
  feat_shape = (batch_size, image_size, image_size)
  if multi_channel:
    feat_shape += (3,)
  feats = rng.randint(0, 42, feat_shape).astype(np.float32)
  depth = rng.uniform(0, 1, (batch_size, image_size, image_size)).astype(
      np.float32)
  xyz1, ff = geometry.get_filtered_coords_and_feats(
      jnp.asarray(feats), jnp.asarray(depth), constants.DEPTH_SCALE)
  assert xyz1.shape == (batch_size, 4, image_size * image_size)
  pd, pf = splat.project_to_feat(
      xyz1, ff, image_size, image_size, constants.DEPTH_SCALE,
      constants.INVALID_SEM_VALUE)
  assert pd.shape == (batch_size, image_size, image_size)
  assert pf.shape == feat_shape
  assert float(jnp.min(pd)) >= 0 and float(jnp.max(pd)) <= 1
  assert float(jnp.min(pf)) >= 0 and float(jnp.max(pf)) <= feats.max()


def test_rotate_pano_golden():
  """Golden-pinned vs the reference TF rotate_pano (pano_utils.py:306-341)
  on non-trivial rotation matrices."""
  if 'rotate_pano' not in GOLDEN:
    pytest.skip('golden npz predates rotate/perspective pins')
  pano = jnp.asarray(GOLDEN['pano_in'])
  mats = jnp.asarray(GOLDEN['rotate_matrices'])
  out = geometry.rotate_pano(pano, mats)
  # f32 arccos near the poles amplifies ~1e-7 ray error to ~1e-5 pixel
  # coordinates; 1e-4 on interpolated values is the honest f32 bound.
  np.testing.assert_allclose(np.asarray(out), GOLDEN['rotate_pano'],
                             atol=1e-4)


def test_project_perspective_image_golden():
  """Golden-pinned vs reference project_perspective_image
  (pano_utils.py:344-417): constant/mean padding, rotations,
  rotation_matrix, and round_to_nearest paths."""
  if 'ppi_constant' not in GOLDEN:
    pytest.skip('golden npz predates rotate/perspective pins')
  persp = jnp.asarray(GOLDEN['persp_in'])
  fov = jnp.array([0.9, 1.2])
  out_c = geometry.project_perspective_image(
      persp, fov, output_height=10, rotations=jnp.array([0.25, -0.6]),
      pad_mode='constant', pad_value=0.5)
  np.testing.assert_allclose(np.asarray(out_c), GOLDEN['ppi_constant'],
                             atol=1e-5)
  out_m = geometry.project_perspective_image(
      persp, fov, output_height=10, rotations=jnp.array([0.0, 0.0]),
      pad_mode='mean')
  np.testing.assert_allclose(np.asarray(out_m), GOLDEN['ppi_mean'],
                             atol=1e-5)
  out_r = geometry.project_perspective_image(
      persp, fov, output_height=10,
      rotation_matrix=jnp.asarray(GOLDEN['rotate_matrices'][0]),
      pad_mode='constant', round_to_nearest=True)
  np.testing.assert_allclose(np.asarray(out_r), GOLDEN['ppi_round'],
                             atol=1e-5)


def test_get_perspective_from_equirectangular_golden():
  """Golden-pinned vs reference get_perspective_from_equirectangular_image
  (pano_utils.py:443-476)."""
  if 'gpe_out' not in GOLDEN:
    pytest.skip('golden npz predates rotate/perspective pins')
  pano = jnp.asarray(GOLDEN['pano_in'][0])
  out = geometry.get_perspective_from_equirectangular_image(
      pano, jnp.asarray(GOLDEN['gpe_intrinsics']),
      jnp.asarray(GOLDEN['rotate_matrices'][1]), height=12, width=16)
  np.testing.assert_allclose(np.asarray(out), GOLDEN['gpe_out'], atol=1e-5)
