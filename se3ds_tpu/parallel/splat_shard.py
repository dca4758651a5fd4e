"""Distributed z-buffer splat: the point-cloud memory sharded over a mesh.

The reference has no distributed inference path at all (its memory is a
single-device `tf.concat`, models.py:239-245). On TPU the natural scale
axis for long-trajectory synthesis is the *point cloud*: memory grows by
H*W points per frame, and the splat — the per-frame hot kernel
(PERF.md) — is an embarrassingly-parallel scatter followed by an
associative combine. This module shards the point axis M over a mesh
axis with `shard_map`; each device splats only its shard into a private
full-resolution z-buffer, and the buffers merge with `lax.pmin` (depth)
/ `lax.pmax` (packed or per-channel features) collectives riding ICI.

Because scatter-min/scatter-max are associative and commutative, the
sharded results are BIT-IDENTICAL to the single-device modes they mirror
(tests/test_splat_shard.py pins this on an 8-device mesh):

  'fast'       == ops.splat.project_to_feat_fast
  'fast_exact' == ops.splat.project_to_feat_fast_exact  (2-phase: global
                  depth buffer first, then the 0.1 m window filter runs
                  against the *global* minimum on every shard)
  'scatter'    == ops.splat.project_to_feat (exact reference semantics,
                  point_cloud_utils.py:90-183)

Communication per splat is O(H*W) buffer words per combine — independent
of M — so splat wall-clock approaches cost(M/n) + allreduce(H*W), giving
near-linear scaling in devices for memory-bound clouds (the combine at
1024x512 is 2-8 MB over ICI, microseconds on v5e).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from se3ds_tpu.ops import geometry
from se3ds_tpu.ops import splat

_TOL = splat.DEPTH_COLLISION_TOLERANCE


# The ONE definition of the per-point pixel/validity rule, shared with
# every single-device mode (see its docstring for the fidelity traps).
_pixel_coords = splat.pixel_coords


def _pack_bytes(feats, bias_bit):
  """Packs feature bytes as splat.py does ('fast': bias_bit=0 with the
  depth bucket ORed in by the caller; 'fast_exact': bias_bit=1)."""
  channels = feats.shape[-1]
  packed = (jnp.ones(feats.shape[:-1], jnp.uint32) if bias_bit
            else jnp.zeros(feats.shape[:-1], jnp.uint32))
  fbytes = jnp.clip(feats, 0.0, 255.0).astype(jnp.uint32)
  for c in range(channels):
    packed = packed + (fbytes[..., c] << (8 * (channels - 1 - c) + bias_bit))
  return packed


def _unpack_bytes(pbuf, channels, bias_bit, dtype, output_void_class):
  got_point = pbuf != 0
  cols = []
  for c in range(channels):
    col = (pbuf >> (8 * (channels - 1 - c) + bias_bit)) & 0xFF
    cols.append(jnp.where(got_point, col.astype(dtype),
                          jnp.asarray(output_void_class, dtype)))
  return jnp.stack(cols, axis=-1)


def project_feats_to_equirectangular_sharded(
    feats: jnp.ndarray,
    xyz1: jnp.ndarray,
    height: int,
    width: int,
    void_class: float,
    depth_scale: float,
    *,
    mesh: Mesh,
    axis: str = 'data',
    splat_mode: str = 'fast',
    output_void_class: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Sharded equivalent of `geometry.project_feats_to_equirectangular`.

  Args:
    feats: (N, M) or (N, M, C) point features (host or replicated array;
      this function re-shards the M axis over `axis`).
    xyz1: (N, 4, M) homogeneous point coordinates.
    height, width, void_class, depth_scale: as the single-device op.
    mesh: Device mesh containing `axis`.
    axis: Mesh axis name to shard the point dimension over.
    splat_mode: 'fast', 'fast_exact', or 'scatter' (exact).
    output_void_class: Fill value for pixels receiving no points.

  Returns:
    (depth image (N, H, W), feature image (N, H, W[, C])), replicated.
  """
  if splat_mode not in ('fast', 'fast_exact', 'scatter'):
    raise ValueError(f'Unsupported sharded splat_mode {splat_mode!r}')
  is_scalar_feat = feats.ndim == 2
  if is_scalar_feat:
    feats = feats[..., None]
  if feats.shape[-1] > 3 and splat_mode != 'scatter':
    # Too many bytes to pack into u32; the packed modes fall back to the
    # exact path, as the single-device ops do (splat.py:187-191).
    splat_mode = 'scatter'
  dtype = xyz1.dtype
  feats = feats.astype(dtype)
  n_shards = mesh.shape[axis]
  batch, _, num_points = xyz1.shape
  channels = feats.shape[-1]
  num_pixels = height * width

  # Pad M to a multiple of the shard count with void points (the splat
  # drops them; the pad never changes the output).
  pad = (-num_points) % n_shards
  if pad:
    xyz1 = jnp.concatenate(
        [xyz1, jnp.zeros((batch, 4, pad), dtype)], axis=-1)
    feats = jnp.concatenate(
        [feats, jnp.full((batch, pad, channels), void_class, dtype)], axis=1)

  def local_splat(xyz1_l, feats_l):
    proj = geometry.equirect_view_coords(xyz1_l)
    flat, depth, valid = _pixel_coords(proj, feats_l, height, width,
                                       void_class)
    # Phase 1: global exact depth buffer (scatter-min + pmin over shards).
    zbuf = jnp.full((batch, num_pixels), depth_scale, dtype)
    zbuf = splat._batched_scatter_min(zbuf, flat, depth)
    zbuf = jax.lax.pmin(zbuf, axis)
    depth_img = (jnp.clip(zbuf, 0.0, depth_scale) / depth_scale).reshape(
        batch, height, width)

    if splat_mode == 'fast':
      qdepth = jnp.clip(depth / depth_scale * 255.0, 0.0, 255.0).astype(
          jnp.uint32)
      packed = ((255 - qdepth) << 24) | _pack_bytes(feats_l, 0)
      pbuf = jax.vmap(lambda i, v: jnp.zeros(
          (num_pixels,), jnp.uint32).at[i].max(v, mode='drop'))(flat, packed)
      pbuf = jax.lax.pmax(pbuf, axis)
      feat_img = _unpack_bytes(pbuf, channels, 0, dtype, output_void_class)
      return depth_img, feat_img.reshape(batch, height, width, channels)

    # Phase 2: the 0.1 m collision window runs against the GLOBAL minimum
    # (every shard holds the pmin'd zbuf), then features combine with max.
    min_depth = jnp.take_along_axis(zbuf, jnp.where(valid, flat, 0), axis=1)
    keep = valid & (depth < min_depth + _TOL)
    flat_keep = jnp.where(keep, flat, num_pixels)

    if splat_mode == 'fast_exact':
      packed = _pack_bytes(feats_l, 1)
      pbuf = jax.vmap(lambda i, v: jnp.zeros(
          (num_pixels,), jnp.uint32).at[i].max(v, mode='drop'))(
              flat_keep, packed)
      pbuf = jax.lax.pmax(pbuf, axis)
      feat_img = _unpack_bytes(pbuf, channels, 1, dtype, output_void_class)
      return depth_img, feat_img.reshape(batch, height, width, channels)

    # 'scatter' (exact reference semantics): per-channel scatter-max.
    fbuf = jnp.full((batch, num_pixels, channels), output_void_class, dtype)
    fbuf = splat._batched_scatter_max(fbuf, flat_keep, feats_l)
    fbuf = jax.lax.pmax(fbuf, axis)
    return depth_img, fbuf.reshape(batch, height, width, channels)

  sharded = shard_map(
      local_splat, mesh=mesh,
      in_specs=(P(None, None, axis), P(None, axis, None)),
      out_specs=(P(), P()))
  depth_img, feat_img = sharded(xyz1, feats)
  if is_scalar_feat:
    feat_img = feat_img[..., 0]
  return depth_img, feat_img
