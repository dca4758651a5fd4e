"""Equirectangular panorama geometry for SE3DS, in pure JAX.

Coordinate conventions follow the reference (`/root/reference/utils/
pano_utils.py`): world frame is the R2R/Matterport frame (z up toward the
north pole of the pano; heading measured from the x-axis increasing toward
the y-axis), pixel rays use x-right / y-down / z-forward.

Everything here is elementwise/trig + one z-buffer splat; XLA fuses the
elementwise pipeline into the scatter producer so these functions compile
to a handful of kernels.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from se3ds_tpu import constants
from se3ds_tpu.ops import image as image_ops
from se3ds_tpu.ops import splat


def get_world_to_image_transform(
    image_shape,
    fov,
    camera_intrinsics: Optional[jnp.ndarray] = None,
    rotations: Optional[Tuple[float, float]] = None,
    rotation_matrix: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Returns a 3x3 world-to-image transform (reference pano_utils.py:26-89)."""
  if camera_intrinsics is None:
    height, width = image_shape
    fov_y, fov_x = fov[0], fov[1]
    fx = 0.5 * (width - 1.0) / jnp.tan(fov_x / 2)
    fy = 0.5 * (height - 1.0) / jnp.tan(fov_y / 2)
    camera_intrinsics = jnp.stack([
        jnp.stack([fx, jnp.zeros_like(fx), 0.5 * (width - 1)]),
        jnp.stack([jnp.zeros_like(fy), fy, 0.5 * (height - 1)]),
        jnp.array([0.0, 0.0, 1.0]),
    ])
  if rotations is not None:
    rot_pitch, rot_heading = rotations[0], rotations[1]
    rot_pitch = jnp.asarray(rot_pitch, jnp.float32)
    rot_heading = jnp.asarray(rot_heading, jnp.float32)
    one = jnp.ones_like(rot_pitch)
    zero = jnp.zeros_like(rot_pitch)
    pitch_rotation = jnp.stack([
        jnp.stack([one, zero, zero]),
        jnp.stack([zero, jnp.cos(-rot_pitch), -jnp.sin(-rot_pitch)]),
        jnp.stack([zero, jnp.sin(-rot_pitch), jnp.cos(-rot_pitch)]),
    ])
    heading_rotation = jnp.stack([
        jnp.stack([jnp.cos(-rot_heading), zero, jnp.sin(-rot_heading)]),
        jnp.stack([zero, one, zero]),
        jnp.stack([-jnp.sin(-rot_heading), zero, jnp.cos(-rot_heading)]),
    ])
    extrinsics = pitch_rotation @ heading_rotation
  elif rotation_matrix is not None:
    extrinsics = rotation_matrix
  else:
    extrinsics = jnp.eye(3)
  return camera_intrinsics @ extrinsics


def equirectangular_pixel_rays(output_height: int) -> jnp.ndarray:
  """Unit-sphere ray per pixel, x-right/y-down/z-forward.

  Mirrors reference pano_utils.py:92-114.

  Returns:
    (3, output_height * output_width) xyz on the unit ball per pixel.
  """
  output_width = int(output_height) * 2
  heading = jnp.linspace(-math.pi, math.pi, output_width)
  pitch = jnp.linspace(0.0, math.pi, output_height)
  heading, pitch = jnp.meshgrid(heading, pitch)
  xs = jnp.sin(pitch) * jnp.sin(heading)
  ys = -jnp.cos(pitch)
  zs = jnp.sin(pitch) * jnp.cos(heading)
  return jnp.stack([xs, ys, zs], axis=0).reshape(3, -1)


SPLAT_MODES = ('scatter', 'sorted', 'sorted_packed', 'fast', 'fast_exact',
               'pallas', 'pallas_exact')


def equirect_view_coords(xyz1: jnp.ndarray) -> jnp.ndarray:
  """Maps (N, 4, M) world points to equirect synthetic view coordinates.

  The elementwise half of the projection (reference pano_utils.py:117-146):
  xyz -> (heading, elevation, radius) -> image-plane coordinates whose
  perspective divide lands on pano pixels. Factored out so the sharded
  splat (parallel/splat_shard.py) can apply it per point shard.
  """
  dtype = xyz1.dtype
  x, y, z = xyz1[:, 0, :], xyz1[:, 1, :], xyz1[:, 2, :]
  rad = jnp.sqrt(x**2 + y**2 + z**2)
  # Heading from the x-axis rotating left, re-based to the left edge of the
  # pano rotating right, wrapped into (0, 2*pi].
  heading = jnp.arctan2(y, x)
  heading = 1.5 * math.pi - heading
  heading = heading + (2 * math.pi) * (heading <= 0).astype(dtype)
  heading = heading - (2 * math.pi) * (heading > (2 * math.pi)).astype(dtype)
  # divide_no_nan: elevation of the origin point maps to acos(0) = pi/2.
  cos_elev = jnp.where(rad == 0, 0.0, z / jnp.where(rad == 0, 1.0, rad))
  elevation = jnp.arccos(jnp.clip(cos_elev, -1.0, 1.0))

  proj_x = rad * ((heading / (2 * math.pi)) * 2 - 1)
  proj_y = rad * ((elevation / math.pi) * 2 - 1)
  proj_z = rad
  return jnp.stack([proj_x, proj_y, proj_z, jnp.ones_like(proj_x)],
                   axis=1).astype(dtype)


def project_feats_to_equirectangular(
    feats: jnp.ndarray,
    xyz1: jnp.ndarray,
    height: int,
    width: int,
    void_class: float,
    depth_scale: float,
    use_sorted_splat: bool = False,
    splat_mode: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Projects point-cloud features into an equirectangular image.

  Mirrors reference pano_utils.py:117-161: converts xyz into
  (heading, elevation, radius) and synthesises image-plane coordinates that
  the z-buffer splat consumes.

  Args:
    feats: (N, M) or (N, M, C) point features.
    xyz1: (N, 4, M) homogeneous point coordinates.
    height: Output pano height in pixels.
    width: Output pano width in pixels.
    void_class: Feature value marking an empty point.
    depth_scale: Maximum depth in metres.
    use_sorted_splat: Legacy alias for splat_mode='sorted'.
    splat_mode: 'scatter' (exact, default), 'sorted' (exact, sort-based),
      'sorted_packed' (exact for byte-valued feats — RGB / class ids —
      at near-'fast' cost, splat.project_to_feat_sorted_packed),
      'fast' (packed single-scatter; byte-quantised winner selection,
      see splat.project_to_feat_fast), 'fast_exact' (exact 0.1 m
      window + packed tie-break, splat.project_to_feat_fast_exact),
      'pallas' (Mosaic kernel, 'fast' semantics, auto-degrades), or
      'pallas_exact' (Mosaic kernel, bit-identical to 'scatter';
      degrades to 'scatter').

  Returns:
    reprojected_depth: (N, H, W) depth in [0, 1].
    reprojected_feats: (N, H, W[, C]) feature image.
  """
  proj_xyz1 = equirect_view_coords(xyz1)
  dtype = xyz1.dtype
  if splat_mode is None:
    splat_mode = 'sorted' if use_sorted_splat else 'scatter'
  if splat_mode == 'pallas':
    # Try the Mosaic kernel once per process; degrade to 'fast' if the
    # toolchain rejects it (see ops/splat_pallas.py STATUS) instead of
    # raising, so splat_mode='pallas' is always safe to request.
    from se3ds_tpu.ops import splat_pallas
    if splat_pallas.pallas_available():
      splat_fn = splat_pallas.project_to_feat_pallas
    else:
      splat_fn = splat.project_to_feat_fast
  elif splat_mode == 'pallas_exact':
    # Exact-semantics kernel; its degrade target is 'scatter', the exact
    # mode it reproduces bit-for-bit.
    from se3ds_tpu.ops import splat_pallas
    if splat_pallas.pallas_exact_available():
      splat_fn = splat_pallas.project_to_feat_pallas_exact
    else:
      splat_fn = splat.project_to_feat
  else:
    splat_fn = {
        'scatter': splat.project_to_feat,
        'sorted': splat.project_to_feat_sorted,
        'sorted_packed': splat.project_to_feat_sorted_packed,
        'fast': splat.project_to_feat_fast,
        'fast_exact': splat.project_to_feat_fast_exact,
    }[splat_mode]
  return splat_fn(proj_xyz1, feats.astype(dtype), height, width,
                  depth_scale=depth_scale, input_void_class=void_class)


def project_dual_to_equirectangular(
    sem_feats: jnp.ndarray,
    sem_xyz1: jnp.ndarray,
    rgb_feats: jnp.ndarray,
    rgb_xyz1: jnp.ndarray,
    height: int,
    width: int,
    sem_void_class: float,
    rgb_void_class: float,
    depth_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Shared-sort semantic+RGB equirectangular splat (one sort, two images).

  The dual-cloud sibling of `project_feats_to_equirectangular`: both
  clouds' view coordinates feed `splat.project_dual_sorted_packed`,
  which sorts the union once by (pixel, depth) and resolves both
  guidance images with one combining scatter. Exact semantics
  (bit-identical to splat_mode='scatter' per cloud for byte features).

  Returns (rgb_depth (N, H, W), sem_img (N, H, W, 1), rgb_img (N, H, W, 3)).
  """
  dtype = rgb_xyz1.dtype
  return splat.project_dual_sorted_packed(
      equirect_view_coords(sem_xyz1), sem_feats.astype(dtype),
      equirect_view_coords(rgb_xyz1), rgb_feats.astype(dtype),
      height, width, depth_scale=depth_scale,
      sem_void_class=sem_void_class, rgb_void_class=rgb_void_class)


def equirectangular_to_pointcloud(
    feats: jnp.ndarray,
    depth: jnp.ndarray,
    void_class: float,
    depth_scale: float,
    size_mult: float = 1.0,
    interpolation_method: str = 'nearest',
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Unprojects an equirectangular RGB-D image into a point cloud.

  Mirrors reference pano_utils.py:164-242. All H*W points are returned;
  points with invalid depth get feature value `void_class` and coordinate
  (0, 0, 0, 1), so downstream splats skip them without compaction (static
  shapes under jit).

  Args:
    feats: (N, H, W) or (N, H, W, C) features.
    depth: (N, H, W) depth in [0, 1].
    void_class: Feature value assigned to invalid points.
    depth_scale: Maximum depth in metres.
    size_mult: Upsampling factor producing denser clouds.
    interpolation_method: 'nearest' or 'bilinear' feature resampling.

  Returns:
    xyz1: (N, 4, H'*W') homogeneous coordinates.
    filtered_feats: (N, H'*W'[, C]) features.
  """
  if feats.ndim not in (3, 4):
    raise ValueError('feats should have shape (N, H, W) or (N, H, W, C),'
                     f' got {feats.shape} instead.')
  is_scalar_feat = feats.ndim == 3
  if is_scalar_feat:
    feats = feats[..., None]
  batch_size, height, width, channels = feats.shape
  assert width == 2 * height, 'Expected equirectangular input images'
  scaled_height = int(height * size_mult)
  scaled_width = int(width * size_mult)
  dtype = depth.dtype

  pano_depth = depth
  pano_feats = feats
  if (scaled_height, scaled_width) != (height, width):
    pano_depth = image_ops.resize(depth[..., None],
                                  (scaled_height, scaled_width),
                                  method='nearest')[..., 0]
    pano_feats = image_ops.resize(feats, (scaled_height, scaled_width),
                                  method=interpolation_method)
  elif interpolation_method != 'nearest':
    # tf.image.resize always runs in the reference and non-nearest methods
    # return float32; preserve that dtype contract.
    pano_feats = pano_feats.astype(jnp.float32)

  half_pixel_width = 0.5 * math.pi / scaled_height
  elevation = jnp.linspace(half_pixel_width, math.pi - half_pixel_width,
                           scaled_height).astype(dtype)
  # Heading from the x-axis, increasing toward the y-axis.
  heading = jnp.linspace(1.5 * math.pi - half_pixel_width,
                         -0.5 * math.pi + half_pixel_width,
                         scaled_width).astype(dtype)
  depth_mask = ((pano_depth > 0) & (pano_depth < 1.0)).astype(dtype)
  rad = (pano_depth * depth_scale) * depth_mask
  pano_feats = jnp.where(depth_mask[..., None] == 0,
                         jnp.asarray(void_class, pano_feats.dtype), pano_feats)

  x = rad * jnp.sin(elevation)[:, None] * jnp.cos(heading)[None, :]
  y = rad * jnp.sin(elevation)[:, None] * jnp.sin(heading)[None, :]
  z = rad * jnp.cos(elevation)[:, None]
  xyz1 = jnp.stack([
      x.reshape(batch_size, -1),
      y.reshape(batch_size, -1),
      z.reshape(batch_size, -1),
      jnp.ones((batch_size, scaled_height * scaled_width), dtype),
  ], axis=1)
  filtered_feats = pano_feats.reshape(batch_size, -1, channels)
  if is_scalar_feat:
    filtered_feats = filtered_feats[..., 0]
  return xyz1, filtered_feats


def mask_pano(pano: jnp.ndarray,
              proportion: float = 0.125,
              masked_region_value=0) -> jnp.ndarray:
  """Blanks the top/bottom `proportion` rows (reference pano_utils.py:245-265)."""
  height = pano.shape[1]
  masked_height = int(height * proportion)
  height_range = jnp.arange(height)
  mask = (height_range >= masked_height) & (height_range <=
                                            height - masked_height)
  mask = mask.astype(pano.dtype)[None, :, None, None]
  return mask * pano + (1 - mask) * masked_region_value


def crop_pano(pano: jnp.ndarray,
              proportion: float = 0.125,
              method: str = 'bilinear',
              resize_to_original: bool = False) -> jnp.ndarray:
  """Crops away the top/bottom `proportion` rows (pano_utils.py:268-303)."""
  if pano.ndim == 3:
    height, width, _ = pano.shape
    row_axis = 0
  elif pano.ndim == 4:
    _, height, width, _ = pano.shape
    row_axis = 1
  else:
    raise ValueError(
        f'pano should be of shape (N, H, W, C), got {pano.shape} instead.')
  masked_height = int(height * proportion)
  cropped = jax.lax.slice_in_dim(pano, masked_height,
                                 height - masked_height, axis=row_axis)
  if resize_to_original:
    cropped = image_ops.resize(cropped, (height, width), method=method,
                               antialias=True)
  return cropped.astype(pano.dtype)


def rotate_pano(pano: jnp.ndarray,
                matrix: jnp.ndarray,
                output_height: Optional[int] = None) -> jnp.ndarray:
  """Rotates equirectangular panoramas by 3x3 matrices (pano_utils.py:306-341)."""
  n, height, width, channels = pano.shape
  if width != height * 2:
    raise ValueError('Pano width must be twice height.')
  out_height = output_height if output_height is not None else height
  out_width = 2 * out_height

  pixel_rays = equirectangular_pixel_rays(out_height)
  # Full-f32 matmul: the default TPU bf16 precision costs ~1e-1 absolute
  # error after arccos; this matmul is tiny ((3,3)x(3,P)).
  rotated = jnp.einsum('nij,jm->nim', matrix, pixel_rays,
                       precision=jax.lax.Precision.HIGHEST)
  x, y, z = rotated[:, 0], rotated[:, 1], rotated[:, 2]
  pitch = jnp.arccos(jnp.clip(-y, -1.0, 1.0))
  heading = jnp.arctan2(x, z)

  heading_pixels = (heading / (2 * math.pi) + 0.5) * (width - 1)
  pitch_pixels = pitch / math.pi * (height - 1)
  coords = jnp.stack([pitch_pixels, heading_pixels], axis=-1)  # (N, P, 2) yx
  out = image_ops.interpolate_bilinear(pano, coords, indexing='ij')
  return out.reshape(n, out_height, out_width, channels)


def project_perspective_image(image: jnp.ndarray,
                              fov,
                              output_height: int,
                              camera_intrinsics=None,
                              rotations=None,
                              rotation_matrix=None,
                              pad_mode: str = 'constant',
                              pad_value: float = 0.0,
                              round_to_nearest: bool = False) -> jnp.ndarray:
  """Converts a perspective image to equirectangular (pano_utils.py:344-417)."""
  assert pad_mode in ('reflect', 'constant', 'mean'), pad_mode
  image = image[None]
  output_width = 2 * output_height

  world_coordinates = equirectangular_pixel_rays(output_height)
  image_shape = image.shape
  world_to_image = get_world_to_image_transform(
      (image_shape[1], image_shape[2]), fov,
      camera_intrinsics=camera_intrinsics, rotations=rotations,
      rotation_matrix=rotation_matrix)
  image_coordinates = jnp.matmul(
      world_to_image, world_coordinates,
      precision=jax.lax.Precision.HIGHEST).T  # (P, 3)
  xs_and_ys = image_coordinates[:, :2]
  zs = image_coordinates[:, 2:]
  image_coordinates = jnp.where(zs > 0, xs_and_ys / jnp.where(zs == 0, 1, zs),
                                -jnp.ones_like(xs_and_ys))
  if round_to_nearest:
    image_coordinates = jnp.round(image_coordinates)

  if pad_mode != 'reflect':
    constant_values = (jnp.mean(image) if pad_mode == 'mean'
                       else jnp.asarray(pad_value, image.dtype))
    image = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    mode='constant', constant_values=constant_values)
    image_coordinates = image_coordinates + 1.0
  out = image_ops.interpolate_bilinear(image, image_coordinates[None],
                                       indexing='xy')
  return out.reshape(output_height, output_width, -1)


def _xyz_to_lonlat(xyz: jnp.ndarray) -> jnp.ndarray:
  """World coordinates -> (longitude, latitude) (pano_utils.py:420-433)."""
  norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
  xyz_norm = xyz / norm
  x = xyz_norm[..., 0:1]
  y = xyz_norm[..., 1:2]
  z = xyz_norm[..., 2:]
  lon = jnp.arctan2(x, z)
  lat = jnp.arcsin(jnp.clip(y, -1.0, 1.0))
  return jnp.concatenate([lon, lat], axis=-1)


def _lonlat_to_uv(lonlat: jnp.ndarray, shape) -> jnp.ndarray:
  """(lon, lat) -> image uv coordinates (pano_utils.py:436-440)."""
  u = (lonlat[..., 0:1] / (2 * math.pi) + 0.5) * (shape[1] - 1)
  v = (lonlat[..., 1:] / math.pi + 0.5) * (shape[0] - 1)
  return jnp.concatenate([u, v], axis=-1)


def get_perspective_from_equirectangular_image(
    image: jnp.ndarray, camera_intrinsics: jnp.ndarray,
    rotation_matrix: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
  """Extracts a perspective view from a pano (pano_utils.py:443-476)."""
  eq_height, eq_width, channels = image.shape
  x, y = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
  z = jnp.ones_like(x)
  xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
  hi = jax.lax.Precision.HIGHEST
  xyz = jnp.matmul(
      jnp.matmul(xyz, jnp.linalg.inv(camera_intrinsics).T, precision=hi),
      rotation_matrix, precision=hi)
  lonlat = _xyz_to_lonlat(xyz)
  uv = _lonlat_to_uv(lonlat, shape=(eq_height, eq_width)).reshape(-1, 2)
  out = image_ops.interpolate_bilinear(
      image[None].astype(jnp.float32), uv[None], indexing='xy')
  return out.reshape(height, width, channels)


def get_intrinsic_matrix(hfov: float = constants.HFOV) -> jnp.ndarray:
  """Pinhole intrinsic matrix for a horizontal FOV
  (reference point_cloud_utils.py:23-29)."""
  f = 1.0 / math.tan(hfov / 2.0)
  return jnp.array([
      [f, 0.0, 0.0, 0.0],
      [0.0, f, 0.0, 0.0],
      [0.0, 0.0, 1.0, 0.0],
      [0.0, 0.0, 0.0, 1.0],
  ], jnp.float32)


def get_filtered_coords_and_feats(
    feats: jnp.ndarray,
    depth: jnp.ndarray,
    depth_scale: float,
    hfov: float = constants.HFOV,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Perspective pinhole unprojection: image plane -> camera-space point
  cloud (reference point_cloud_utils.py:32-87).

  Coordinates/features whose depth is invalid (<= 0 or >= depth_scale
  after rescaling) are zeroed; zero is assumed to be the void class.

  Args:
    feats: (N, H, W) or (N, H, W, C) feature values.
    depth: (N, H, W) depth in [0, 1].
    depth_scale: Maximum depth in metres.
    hfov: Horizontal field of view in radians (reference uses
      constants.HFOV).

  Returns:
    xyz: (N, 4, H*W) homogeneous coordinates in the camera frame.
    filtered_feats: (N, H*W[, C]) features, zeroed where depth is
      invalid; shape mirrors the input rank.
  """
  if feats.ndim not in (3, 4):
    raise ValueError('feats should have shape (N, H, W) or (N, H, W, C),'
                     f' got {feats.shape} instead.')
  is_scalar_feat = feats.ndim == 3
  if is_scalar_feat:
    feats = feats[..., None]
  batch_size, height, width = depth.shape
  channels = feats.shape[-1]

  # Image plane spans [-1, 1] in both axes (y points down in the array,
  # matching the reference's meshgrid, point_cloud_utils.py:59-64).
  xs, ys = jnp.meshgrid(jnp.linspace(-1.0, 1.0, width),
                        jnp.linspace(-1.0, 1.0, height))
  xs = jnp.tile(xs[None, None].astype(jnp.float32), [batch_size, 1, 1, 1])
  ys = jnp.tile(ys[None, None].astype(jnp.float32), [batch_size, 1, 1, 1])
  metric_depth = (depth * depth_scale)[:, None, :, :]
  ones = jnp.ones_like(metric_depth)
  xyz = jnp.concatenate(
      [xs * metric_depth, ys * metric_depth, metric_depth, ones], axis=1)

  flat_depth = metric_depth.reshape(batch_size, -1)
  depth_mask = (flat_depth > 0) & (flat_depth < depth_scale)

  filtered_feats = feats.reshape(batch_size, -1, channels)
  filtered_feats = (filtered_feats
                    * depth_mask[..., None].astype(filtered_feats.dtype))
  filtered_feats = filtered_feats.astype(jnp.float32)

  xyz = xyz.reshape(batch_size, 4, -1)
  xyz = xyz * depth_mask[:, None, :].astype(jnp.float32)
  xyz = jnp.matmul(jnp.linalg.inv(get_intrinsic_matrix(hfov)), xyz,
                   precision=jax.lax.Precision.HIGHEST)

  if is_scalar_feat:
    filtered_feats = filtered_feats[..., 0]
  return xyz, filtered_feats
