"""Image resampling primitives (TF-compatible semantics) in pure JAX.

`resize` reproduces `tf.image.resize` v2 behaviour (half-pixel centers,
no antialias by default); `interpolate_bilinear` reproduces
`tensorflow_addons.image.interpolate_bilinear` (used by the reference for
pano rotation and perspective warping, pano_utils.py:339,412,472).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize(images: jnp.ndarray,
           size: Tuple[int, int],
           method: str = 'bilinear',
           antialias: bool = False) -> jnp.ndarray:
  """Resizes (..., H, W, C) images to `size` with TF v2 conventions."""
  if method in ('bilinear', 'linear'):
    jax_method = 'linear'
  elif method == 'nearest':
    jax_method = 'nearest'
  elif method in ('bicubic', 'cubic'):
    jax_method = 'cubic'
  else:
    raise ValueError(f'Unsupported resize method: {method}')
  *batch, h, w, c = images.shape
  out_shape = tuple(batch) + (int(size[0]), int(size[1]), c)
  orig_dtype = images.dtype
  out = jax.image.resize(images.astype(jnp.float32), out_shape,
                         method=jax_method, antialias=antialias)
  if jax_method == 'nearest':
    out = out.astype(orig_dtype)
  return out


def interpolate_bilinear(grid: jnp.ndarray,
                         query_points: jnp.ndarray,
                         indexing: str = 'ij') -> jnp.ndarray:
  """Samples `grid` at float `query_points` with bilinear interpolation.

  Matches tensorflow_addons `interpolate_bilinear`: query coordinates are
  clamped so the 4-neighborhood stays in bounds.

  Args:
    grid: (N, H, W, C) image.
    query_points: (N, P, 2) float coordinates; ordering is (y, x) for
      indexing='ij' and (x, y) for indexing='xy'.
    indexing: 'ij' or 'xy'.

  Returns:
    (N, P, C) interpolated values.
  """
  if indexing not in ('ij', 'xy'):
    raise ValueError("indexing must be 'ij' or 'xy'")
  n, height, width, channels = grid.shape
  grid = grid.astype(jnp.float32)
  query_points = query_points.astype(jnp.float32)

  if indexing == 'ij':
    qy, qx = query_points[..., 0], query_points[..., 1]
  else:
    qx, qy = query_points[..., 0], query_points[..., 1]

  def axis_coords(q, size):
    max_floor = size - 2
    floor = jnp.clip(jnp.floor(q), 0.0, max_floor)
    alpha = jnp.clip(q - floor, 0.0, 1.0)
    return floor.astype(jnp.int32), alpha

  y0, ay = axis_coords(qy, height)
  x0, ax = axis_coords(qx, width)

  flat = grid.reshape(n, height * width, channels)
  def gather(yi, xi):
    idx = yi * width + xi  # (N, P)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)

  top_left = gather(y0, x0)
  top_right = gather(y0, x0 + 1)
  bottom_left = gather(y0 + 1, x0)
  bottom_right = gather(y0 + 1, x0 + 1)

  ax = ax[..., None]
  ay = ay[..., None]
  top = top_left + (top_right - top_left) * ax
  bottom = bottom_left + (bottom_right - bottom_left) * ax
  return top + (bottom - top) * ay
