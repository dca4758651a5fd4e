"""Pins splat.reference_pollute_pixel0 against a straight-line numpy
replica of the reference scatter (point_cloud_utils.py:152-176).

The emulator is the bridge that lets the end-to-end FID-protocol parity
test (tests/test_fid_parity.py, TF subprocess) compare the product
splats — which deliberately DROP invalid points — against the live
reference, whose scatter writes invalid points AND depth-window losers
into flat index 0 (batch 0, pixel (0,0)). Bit-tightness vs the LIVE TF
reference is separately demonstrated by scripts/debug_splat_ab.py; this
TF-free test keeps the formula pinned in regular CI.
"""

import numpy as np
import jax.numpy as jnp

from se3ds_tpu import constants
from se3ds_tpu.ops import geometry, splat

VOID = float(constants.INVALID_RGB_VALUE)


def _numpy_reference_pixel0(proj, feats, h, w, void, ds):
  """Literal numpy transcription of the reference scatter's index-0
  behaviour (point_cloud_utils.py:129-176)."""
  n = proj.shape[0]
  depth = proj[:, 2, :]
  with np.errstate(divide='ignore', invalid='ignore'):
    view = np.where(depth[:, None] == 0, 0.0, proj[:, 0:2, :] / depth[:, None])
  px = ((view[:, 0] + 1) / 2 * w).astype(np.int32)
  py = ((view[:, 1] + 1) / 2 * h).astype(np.int32)
  valid = ((px >= 0) & (px < w) & (py >= 0) & (py < h) & (depth > 0)
           & np.all(feats != void, axis=-1))
  offs = (np.arange(n) * h * w)[:, None]
  flat = ((offs + py * w + px) * valid).reshape(-1)
  d = depth.reshape(-1).astype(np.float32)
  scat = np.full(n * h * w, ds, np.float32)
  np.minimum.at(scat, flat, d)
  mind = scat[flat]
  flat2 = flat * (d < mind + 0.1)
  f = feats.reshape(-1, feats.shape[-1]).astype(np.float32)
  sel = f[flat2 == 0]
  feat0 = np.maximum(0.0, sel.max(axis=0)) if sel.size else np.zeros(3)
  depth0 = np.clip(scat[0], 0, ds) / ds
  return depth0, feat0


def test_pollution_matches_numpy_reference_replica():
  rng = np.random.RandomState(0)
  n, h, w = 2, 8, 16
  m = 300
  ds = 20.0
  # Mixed cloud: valid points, void-feature points, behind-camera points,
  # out-of-bounds points — every index-0 contributor class.
  xyz1 = np.concatenate(
      [rng.uniform(-6, 6, (n, 3, m)).astype(np.float32),
       np.ones((n, 1, m), np.float32)], axis=1)
  feats = rng.randint(0, 256, (n, m, 3)).astype(np.float32)
  feats[:, ::7] = VOID  # void features
  xyz1[:, 2, ::11] = -xyz1[:, 2, ::11]  # some behind camera

  proj = np.asarray(geometry.equirect_view_coords(jnp.asarray(xyz1)))
  clean_d, clean_f = geometry.project_feats_to_equirectangular(
      jnp.asarray(feats), jnp.asarray(xyz1), h, w, void_class=VOID,
      depth_scale=ds, splat_mode='scatter')
  out_d, out_f = splat.reference_pollute_pixel0(
      clean_d, clean_f, jnp.asarray(proj), jnp.asarray(feats), h, w,
      VOID, ds)

  want_d, want_f = _numpy_reference_pixel0(proj, feats, h, w, VOID, ds)
  np.testing.assert_allclose(float(out_d[0, 0, 0]), want_d, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(out_f[0, 0, 0]), want_f, rtol=1e-6)
  # Everything else is untouched.
  assert np.array_equal(np.asarray(out_d)[0, 1:], np.asarray(clean_d)[0, 1:])
  assert np.array_equal(np.asarray(out_d)[1:], np.asarray(clean_d)[1:])
  assert np.array_equal(np.asarray(out_f)[1:], np.asarray(clean_f)[1:])


def test_pollution_no_points_at_index0_is_identity_fill():
  # All points valid and mapped away from pixel 0: index 0 keeps the
  # reference fill (depth 1.0 after normalisation, feats void 0).
  h, w = 4, 8
  xyz1 = np.zeros((1, 4, 5), np.float32)
  xyz1[:, 2] = 5.0  # straight ahead, lands mid-image
  xyz1[:, 3] = 1.0
  feats = np.full((1, 5, 3), 100.0, np.float32)
  proj = np.asarray(geometry.equirect_view_coords(jnp.asarray(xyz1)))
  clean_d = jnp.ones((1, h, w), jnp.float32)
  clean_f = jnp.zeros((1, h, w, 3), jnp.float32)
  out_d, out_f = splat.reference_pollute_pixel0(
      clean_d, clean_f, jnp.asarray(proj), jnp.asarray(feats), h, w,
      VOID, 20.0)
  assert float(out_d[0, 0, 0]) == 1.0
  assert np.all(np.asarray(out_f[0, 0, 0]) == 0.0)
