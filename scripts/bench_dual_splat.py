"""A/B micro-benchmark: per-frame splat pair — two 'fast' splats vs a
fused dual-cloud scatter. NEGATIVE RESULT, kept as the reproducible
record (PERF.md "Fused dual-cloud scatter").

`SE3DSModel.__call__` splats the semantic cloud (H*W points/frame) and
the pole-compacted RGB cloud (~0.75*H*W points/frame) every frame
(reference models.py:276-281). In 'fast' mode that is three scatters
(semantic packed max, RGB f32 depth min, RGB packed max). Hypothesis:
the two packed scatter-maxes write disjoint pixel sets, so they can
share ONE scatter into a (N, 2*H*W) buffer — bit-identical, one fewer
scatter dispatch. Measured on v5e: 10.51 ms separate vs 10.93 ms fused
at 1-frame live extent — XLA scatter cost is purely per-point (no
per-op fixed overhead worth saving; the wider 2*H*W target even
costs ~4%), so the product path keeps the two
plain `project_to_feat_fast` calls and this fused variant lives only
here.

Usage: python scripts/bench_dual_splat.py
Env: SE3DS_SPLAT_FRAMES (live frames, default 1), SE3DS_SPLAT_ITERS (20).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from se3ds_tpu.ops import geometry, splat  # noqa: E402

H, W = 512, 1024
DEPTH_SCALE = 20.0
SEM_VOID = 0.0
RGB_VOID = -1.0


def make_clouds(frames, seed=0):
  rng = np.random.RandomState(seed)
  m_sem = frames * H * W
  m_rgb = int(frames * 0.75 * H * W)  # pole-compacted RGB cloud
  sem_xyz = rng.uniform(-6, 6, (1, 4, m_sem)).astype(np.float32)
  sem_xyz[:, 3] = 1.0
  rgb_xyz = rng.uniform(-6, 6, (1, 4, m_rgb)).astype(np.float32)
  rgb_xyz[:, 3] = 1.0
  sem_feats = rng.randint(1, 42, (1, m_sem, 1)).astype(np.float32)
  rgb_feats = rng.randint(-1, 256, (1, m_rgb, 3)).astype(np.float32)
  return (jnp.asarray(sem_xyz), jnp.asarray(sem_feats),
          jnp.asarray(rgb_xyz), jnp.asarray(rgb_feats))


def bench(fn, args, iters):
  out = fn(*args)
  _ = np.asarray(out[0][0, :2, :2])  # warmup fetch: real compile
  t0 = time.perf_counter()
  _ = np.asarray(out[0][0, :2, :2])
  fetch_latency = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  _ = np.asarray(out[0][0, :2, :2])
  return (time.perf_counter() - t0 - fetch_latency) / iters


@jax.jit
def separate(sem_xyz, sem_feats, rgb_xyz, rgb_feats):
  # Today's memory_project pair: the semantic depth output is dropped
  # (DCE'd by XLA), exactly as in the product path.
  _, proj_sem = geometry.project_feats_to_equirectangular(
      sem_feats, sem_xyz, H, W, SEM_VOID, DEPTH_SCALE, splat_mode='fast')
  proj_depth, proj_rgb = geometry.project_feats_to_equirectangular(
      rgb_feats, rgb_xyz, H, W, RGB_VOID, DEPTH_SCALE, splat_mode='fast')
  return proj_depth, proj_sem, proj_rgb


def _pack(depth, feats, channels):
  qdepth = jnp.clip(depth / DEPTH_SCALE * 255.0, 0.0, 255.0).astype(
      jnp.uint32)
  packed = (255 - qdepth) << 24
  fbytes = jnp.clip(feats, 0.0, 255.0).astype(jnp.uint32)
  for c in range(channels):
    packed = packed | (fbytes[..., c] << (8 * (channels - 1 - c)))
  return packed


def _unpack(pbuf_part, channels, out_void, batch):
  got = pbuf_part != 0
  cols = []
  for c in range(channels):
    col = (pbuf_part >> (8 * (channels - 1 - c))) & 0xFF
    cols.append(jnp.where(got, col.astype(jnp.float32),
                          jnp.float32(out_void)))
  return jnp.stack(cols, axis=-1).reshape(batch, H, W, channels)


@jax.jit
def fused(sem_xyz, sem_feats, rgb_xyz, rgb_feats):
  """Both packed scatter-maxes share one scatter into a 2*H*W buffer.

  Per-pixel winners are independent (the two images' pixel ranges are
  disjoint in the combined index space), so outputs are bit-identical to
  `separate`.
  """
  batch = rgb_xyz.shape[0]
  num_pixels = H * W
  view_s = geometry.equirect_view_coords(sem_xyz)
  view_r = geometry.equirect_view_coords(rgb_xyz)
  flat_s, depth_s, _ = splat.pixel_coords(view_s, sem_feats, H, W, SEM_VOID)
  flat_r, depth_r, _ = splat.pixel_coords(view_r, rgb_feats, H, W, RGB_VOID)

  # Exact f32 depth buffer (RGB cloud only, as in the product path).
  def zmin(b, i, v):
    return b.at[i].min(v, mode='drop')
  zbuf = jax.vmap(zmin)(
      jnp.full((batch, num_pixels), DEPTH_SCALE, jnp.float32),
      flat_r, depth_r)
  proj_depth = (jnp.clip(zbuf, 0.0, DEPTH_SCALE) / DEPTH_SCALE
                ).reshape(batch, H, W)

  packed_s = _pack(depth_s, sem_feats, 1)
  packed_r = _pack(depth_r, rgb_feats, 3)
  # Combined index space: semantic pixels [0, P), RGB pixels [P, 2P),
  # sentinel 2P (pixel_coords emits P for invalid points — remap past
  # the combined buffer so mode='drop' keeps skipping it).
  flat_sc = jnp.where(flat_s < num_pixels, flat_s, 2 * num_pixels)
  flat_rc = jnp.where(flat_r < num_pixels, flat_r + num_pixels,
                      2 * num_pixels)
  flat_c = jnp.concatenate([flat_sc, flat_rc], axis=1)
  packed_c = jnp.concatenate([packed_s, packed_r], axis=1)

  def one(i, v):
    return jnp.zeros((2 * num_pixels,), jnp.uint32).at[i].max(v, mode='drop')
  pbuf = jax.vmap(one)(flat_c, packed_c)
  # Empty pixels fill with project_to_feat_fast's output_void_class
  # default (0.0), NOT the input void sentinel.
  proj_sem = _unpack(pbuf[:, :num_pixels], 1, 0.0, batch)
  proj_rgb = _unpack(pbuf[:, num_pixels:], 3, 0.0, batch)
  return proj_depth, proj_sem, proj_rgb


def main():
  frames = int(os.environ.get('SE3DS_SPLAT_FRAMES', 1))
  iters = int(os.environ.get('SE3DS_SPLAT_ITERS', 20))
  args = make_clouds(frames)

  a = separate(*args)
  b = fused(*args)
  for i, name in enumerate(('depth', 'sem', 'rgb')):
    assert np.array_equal(np.asarray(a[i]), np.asarray(b[i])), name
  print(f'# fused == separate bit-identical on device (frames={frames})')

  ms_sep = bench(separate, args, iters) * 1e3
  ms_fused = bench(fused, args, iters) * 1e3
  print(json.dumps({
      'frames': frames,
      'separate_ms': round(ms_sep, 3),
      'fused_ms': round(ms_fused, 3),
      'speedup': round(ms_sep / ms_fused, 3),
  }))


if __name__ == '__main__':
  main()
