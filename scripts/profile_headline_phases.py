"""Decomposes the HEADLINE inference frame time into measured phases.

The headline bench (bench.py inference mode) loops `model(target)` at
1024x512 with 1 live frame. Its per-frame time should be roughly
generator + splat pair + glue; this script times each phase as its own
program (same fetch-barrier protocol as bench.py) plus the __call__
Python/dispatch overhead, so the residual "glue" is measured rather
than guessed:

  A. headline loop      model(target) via __call__        (the bench)
  B. raw program loop   self._jit_call(...) directly      (A - B = host
                        Python: arg prep, jit cache lookup, OutputData)
  C. splat pair         memory_project at the live extent
  D. generator          model.apply alone (bf16)
  E. guidance glue      memory_project + input build + u8 conversions
                        on a dummy generated tensor (no generator)

Usage: python scripts/profile_headline_phases.py [--size 512]
       [--frames 2] [--iters 10]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, '.')


def _fetch(out):
  import jax
  import numpy as np
  leaf = [x for x in jax.tree_util.tree_leaves(out)
          if hasattr(x, 'reshape')][0]
  return np.asarray(leaf.reshape(-1)[:4])


def timeit(fn, *args, iters=10, warmup=1, **kw):
  for _ in range(warmup):
    out = fn(*args, **kw)
  _fetch(out)
  t0 = time.perf_counter()
  _fetch(out)
  latency = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args, **kw)
  _fetch(out)
  return max(time.perf_counter() - t0 - latency, 1e-9) / iters


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', type=int, default=512)
  parser.add_argument('--frames', type=int, default=2)
  parser.add_argument('--gen_dims', type=int, default=128)
  parser.add_argument('--iters', type=int, default=10)
  parser.add_argument('--splat', default='fast')
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from se3ds_tpu.models import inference, model_config

  h, w = args.size, args.size * 2
  config = model_config.SE3DSConfig(
      ckpt_path=None, image_height=args.size, gen_dims=args.gen_dims,
      resnet_version='101', memory_frames=args.frames,
      compute_dtype='bfloat16', splat_mode=args.splat)
  model = inference.SE3DSModel(config)

  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  target = jnp.asarray(np.array([[0.8, 0.3, 0.0]], np.float32))

  print(f'backend={jax.default_backend()} size={h}x{w} '
        f'splat={args.splat} live_frames=1', flush=True)

  # A. headline loop through __call__.
  ms_a = timeit(lambda: model(target), iters=args.iters) * 1e3
  print(f'A __call__ loop (headline): {ms_a:.1f} ms/frame', flush=True)

  # B. raw jitted program, bypassing __call__'s Python.
  ms_b = timeit(
      model._jit_call, model.variables, model._memory,
      model.prev_rgb_frame, target, iters=args.iters,
      num_frames=1, feed=False, sem_frames=1) * 1e3
  print(f'B _jit_call raw program:    {ms_b:.1f} ms/frame '
        f'(A-B host/python {ms_a - ms_b:.1f})', flush=True)

  # C. splat pair alone at the live extent.
  live = model._live_memory(model._memory, 1, 1)
  proj_fn = jax.jit(functools.partial(
      inference.memory_project, height=h, width=w,
      depth_scale=model.depth_scale, splat_mode=args.splat))
  ms_c = timeit(proj_fn, live, target, iters=args.iters) * 1e3
  print(f'C splat pair (sem+rgb):     {ms_c:.1f} ms', flush=True)

  # D. generator alone.
  cond = {
      'proj_image': jnp.zeros((1, h, w, 3)),
      'proj_depth': jnp.zeros((1, h, w, 1)),
      'proj_mask': jnp.ones((1, h, w, 1)),
      'blurred_mask': jnp.zeros((1, h, w, 1)),
  }
  gen_fn = jax.jit(lambda v, c: model.model.apply(v, c, train=False)[6])
  ms_d = timeit(gen_fn, model.variables, cond, iters=args.iters) * 1e3
  print(f'D generator forward:        {ms_d:.1f} ms', flush=True)

  # E. guidance glue: splat + input build + output conversions, with the
  # generator replaced by a pass-through of a dummy tensor (measures
  # everything in _forward EXCEPT the generator itself).
  dummy_rgb = jnp.zeros((1, h, w, 3), jnp.float32)
  dummy_depth = jnp.zeros((1, h, w, 1), jnp.float32)

  @jax.jit
  def glue(memory, position, gen_rgb, gen_depth):
    proj_semantic, proj_depth, proj_rgb, proj_mask = (
        inference.memory_project(
            memory, position, h, w, model.depth_scale,
            splat_mode=args.splat))
    proj_rgb_norm = jnp.clip(proj_rgb / 255.0, 0.0, 1.0)
    pred_depth = jnp.clip(gen_depth[..., 0], 0.0, 1.0)
    pred_rgb = (jnp.clip(gen_rgb, 0, 1) * 255).astype(jnp.int32)
    return dict(
        proj_depth=proj_depth,
        proj_mask=proj_mask,
        pred_depth=pred_depth,
        proj_semantic_u8=proj_semantic[..., 0].astype(jnp.uint8),
        proj_rgb_u8=(proj_rgb_norm * 255).astype(jnp.uint8),
        pred_rgb_u8=jnp.clip(pred_rgb, 0, 255).astype(jnp.uint8),
    )

  ms_e = timeit(glue, live, target, dummy_rgb, dummy_depth,
                iters=args.iters) * 1e3
  print(f'E glue (splat+build+conv):  {ms_e:.1f} ms '
        f'(E-C non-splat glue {ms_e - ms_c:.1f})', flush=True)
  print(f'residual B - D - E:         {ms_b - ms_d - ms_e:.1f} ms '
        '(program-level fusion / scheduling delta)', flush=True)


if __name__ == '__main__':
  main()
