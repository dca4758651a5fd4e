"""Profiles the inference pipeline components on the current backend.

Times (compile excluded): sorted vs scatter splat at production point
counts, generator forward at 512x1024 (bf16/f32), unprojection, and the
full SE3DSModel step. Guides kernel-optimisation work.

Usage: python scripts/profile_inference.py [--size 512] [--frames 2]
"""

import argparse
import sys
import time

sys.path.insert(0, '.')


def _fetch(out):
  """Host-fetch barrier (block_until_ready is a no-op on relay backends)."""
  import jax
  import numpy as np
  leaf = jax.tree_util.tree_leaves(out)[0]
  return np.asarray(leaf.reshape(-1)[:4])


def timeit(fn, *args, iters=5, warmup=1):
  import time as _t
  for _ in range(warmup):
    out = fn(*args)
  _fetch(out)
  t0 = _t.perf_counter()
  _fetch(out)
  latency = _t.perf_counter() - t0
  t0 = _t.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  _fetch(out)
  return max(_t.perf_counter() - t0 - latency, 1e-9) / iters


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', type=int, default=512)
  parser.add_argument('--frames', type=int, default=2)
  parser.add_argument('--gen_dims', type=int, default=128)
  parser.add_argument('--iters', type=int, default=5)
  args = parser.parse_args()

  import functools
  import jax
  import jax.numpy as jnp
  import numpy as np
  from se3ds_tpu.ops import splat, geometry
  from se3ds_tpu.models import generator as gen_lib

  h, w = args.size, args.size * 2
  cap = args.frames * h * w
  rng = np.random.RandomState(0)
  print(f'backend={jax.default_backend()} size={h}x{w} points={cap}')

  coords = jnp.asarray(
      np.concatenate([
          rng.uniform(-8, 8, (1, 3, cap)),
          np.ones((1, 1, cap))], axis=1).astype(np.float32))
  feats = jnp.asarray(rng.randint(-1, 256, (1, cap, 3)).astype(np.float32))

  for name, fn in [('scatter', splat.project_to_feat),
                   ('sorted', splat.project_to_feat_sorted)]:
    jf = jax.jit(functools.partial(
        geometry.project_feats_to_equirectangular, height=h, width=w,
        void_class=-1.0, depth_scale=20.0,
        use_sorted_splat=(name == 'sorted')))
    dt = timeit(jf, feats, coords, iters=args.iters)
    print(f'splat[{name}]: {dt * 1000:.1f} ms')

  # Unprojection.
  depth_img = jnp.asarray(rng.uniform(0.05, 0.9, (1, h, w)).astype(
      np.float32))
  rgb_img = jnp.asarray(rng.randint(0, 256, (1, h, w, 3)).astype(np.int32))
  jf = jax.jit(functools.partial(
      geometry.equirectangular_to_pointcloud, void_class=-1.0,
      depth_scale=20.0, interpolation_method='bilinear'))
  dt = timeit(jf, rgb_img, depth_img, iters=args.iters)
  print(f'unproject: {dt * 1000:.1f} ms')

  # Generator forward.
  for dtype_name, dtype in [('bf16', jnp.bfloat16), ('f32', jnp.float32)]:
    model = gen_lib.ResNetGenerator(
        image_size=args.size, gen_dims=args.gen_dims, resnet_version='101',
        dtype=dtype)
    cond = {
        'proj_image': jnp.zeros((1, h, w, 3)),
        'proj_depth': jnp.zeros((1, h, w, 1)),
        'proj_mask': jnp.ones((1, h, w, 1)),
        'blurred_mask': jnp.zeros((1, h, w, 1)),
    }
    variables = model.init(jax.random.PRNGKey(0), cond, train=False)
    fwd = jax.jit(lambda v, c: model.apply(v, c, train=False)[6])
    dt = timeit(fwd, variables, cond, iters=args.iters)
    print(f'generator[{dtype_name}]: {dt * 1000:.1f} ms '
          f'({1.0 / dt:.2f} panos/s)')
    del variables
    if dtype_name == 'bf16':
      break  # f32 optional; skip by default to save time


if __name__ == '__main__':
  main()
