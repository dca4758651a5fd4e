"""Microbench: transposed-conv lowering — dilated vs subpixel (depth_to_space).

The decoder's upsampling rides `lax.conv_transpose` (k=3 s=2 SAME main
path, k=2 s=2 VALID residual, k=2 s=2 SAME final_deconv — reference
image_models.py:306-488). XLA lowers conv_transpose via input dilation
(lhs_dilation=2), which computes the full kxk window at every output
pixel even though 3/4 of the dilated input is zeros: k=3 wastes 4x the
useful MACs, k=2 wastes 4x. The subpixel ("pixel shuffle") rewrite
computes one stride-1 conv at the SMALL spatial size producing 4x
channels and rearranges with depth_to_space: k=2 is exactly a 1x1 conv
(zero waste); k=3 packs the per-parity taps into 2x2 sub-kernels
(16/9 = 1.78x waste vs the dilated path's 4x).

This script (a) proves each subpixel rewrite numerically equivalent to
`nn.ConvTranspose`'s geometry on random inputs (f32, <=1e-5), then
(b) times both lowerings on the real chip at the decoder's production
shapes (bf16, batch 1). Timing uses the host-fetch barrier pattern
(CLAUDE.md: block_until_ready does not sync through the relay).

Run: python scripts/bench_convt.py            (real chip)
     JAX_PLATFORMS=cpu python scripts/bench_convt.py --check-only
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def subpixel_kernel_k2(w):
  """(2, 2, C, O) convt kernel -> (1, 1, C, 4O) subpixel kernel.

  conv_transpose k=2 s=2 writes x[i,j] * W[1-di,1-dj] to out[2i+di,
  2j+dj] (kernel flipped — it is the conv gradient) with no overlap, so
  it IS a 1x1 conv to 4O channels + depth_to_space (channel order
  (di, dj, o), depth_to_space convention). SAME == VALID geometry at
  k=s=2 (delta-probe verified).
  """
  c, o = w.shape[2], w.shape[3]
  wf = w[::-1, ::-1]
  # (di, dj, c, o) -> (c, di, dj, o) -> (1, 1, c, 4o)
  return jnp.transpose(wf, (2, 0, 1, 3)).reshape(1, 1, c, 4 * o)


def subpixel_kernel_k3(w):
  """(3, 3, C, O) convt kernel -> (2, 2, C, 4O) subpixel kernel.

  For stride 2, SAME geometry (out = 2*in), delta-probe-verified 1D
  map (kernel flipped, as the conv gradient):
    out[2m]     = x[m-1] * W[0] + x[m] * W[2]
    out[2m + 1] = x[m] * W[1]
  Packed into 2x2 sub-kernels over (x[m-1], x[m]) — i.e. a stride-1
  2x2 conv with one pixel of left/top padding — then depth_to_space.
  """
  c, o = w.shape[2], w.shape[3]
  sub = jnp.zeros((2, 2, 2, 2, c, o), w.dtype)  # (rh, rw, th, tw, c, o)
  # t' = 0 reads x[m-1], t' = 1 reads x[m] (pad (1, 0)).
  k1d = {  # r -> [(t', kernel_index), ...]
      0: [(0, 0), (1, 2)],
      1: [(1, 1)],
  }
  for rh, hs in k1d.items():
    for rw, ws in k1d.items():
      for th, kh in hs:
        for tw, kw in ws:
          sub = sub.at[rh, rw, th, tw].set(w[kh, kw])
  # -> (th, tw, c, (rh, rw, o))
  return jnp.transpose(sub, (2, 3, 4, 0, 1, 5)).reshape(2, 2, c, 4 * o)


def depth_to_space(x, block=2):
  b, h, w, c = x.shape
  o = c // (block * block)
  x = x.reshape(b, h, w, block, block, o)
  x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
  return x.reshape(b, h * block, w * block, o)


def convt_ref(x, w, padding):
  return jax.lax.conv_transpose(
      x, w, strides=(2, 2), padding=padding,
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def convt_subpixel(x, w, padding):
  k = w.shape[0]
  if k == 2:
    ws = subpixel_kernel_k2(w)
    out = jax.lax.conv_general_dilated(
        x, ws, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  elif k == 3:
    ws = subpixel_kernel_k3(w)
    # First tap reads x[m-1]: pad one pixel at the left/top edge.
    out = jax.lax.conv_general_dilated(
        x, ws, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  else:
    raise ValueError(k)
  return depth_to_space(out)


def check(k, padding, cin=8, cout=5, h=6, wdt=10, seed=0):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(1, h, wdt, cin).astype(np.float32))
  w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))
  a = np.asarray(convt_ref(x, w, padding))
  b = np.asarray(convt_subpixel(x, w, padding))
  if a.shape != b.shape:
    return f'k={k} {padding}: SHAPE {a.shape} vs {b.shape}'
  err = np.abs(a - b).max()
  return f'k={k} {padding}: max|delta| {err:.2e} shape {a.shape}' + (
      '  OK' if err < 1e-4 else '  FAIL')


def fetch_time(fn, x, w, iters=50):
  """ms/op via an in-program scan: one dispatch measures `iters`
  executions (per-call relay dispatch is ~2-5 ms and would swamp the
  sub-ms conv). Hoisting defeat per profile_train_phases.py: the input
  is jittered by a step-dependent epsilon so XLA cannot loop-invariant-
  motion the conv out of the scan; the scalar accumulator carries a
  data dependency to the output."""

  def scan_fn(x, w):
    def body(acc, step):
      xi = x + step.astype(x.dtype) * 1e-12
      out = fn(xi, w)
      return acc + out[0, 0, 0, 0].astype(jnp.float32), None
    acc, _ = jax.lax.scan(body, jnp.float32(0),
                          jnp.arange(iters, dtype=jnp.int32))
    return acc

  jfn = jax.jit(scan_fn)
  out = jfn(x, w)
  np.asarray(out)  # compile + warm
  t0 = time.perf_counter()
  np.asarray(out)  # fetch of a ready result = relay round-trip floor
  latency = time.perf_counter() - t0
  t0 = time.perf_counter()
  np.asarray(jfn(x, w))
  return max(time.perf_counter() - t0 - latency, 1e-9) / iters * 1e3


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--check-only', action='store_true')
  args = ap.parse_args()
  if args.check_only:
    # The box presets JAX_PLATFORMS=axon and ignores the env var; the
    # config API is the only effective CPU override (CLAUDE.md).
    jax.config.update('jax_platforms', 'cpu')

  print('# numerical equivalence (f32, CPU-safe):')
  for k, pad in [(2, 'VALID'), (2, 'SAME'), (3, 'SAME')]:
    print(' ', check(k, pad))
  if args.check_only:
    return

  # Production decoder shapes (1024x512 pano, gen_dims 128, bf16).
  shapes = [
      ('deconv2 main k3', 3, 'SAME', (1, 32, 64, 512), 256),
      ('deconv2 up   k2', 2, 'VALID', (1, 32, 64, 512), 256),
      ('deconv3 main k3', 3, 'SAME', (1, 64, 128, 256), 128),
      ('deconv3 up   k2', 2, 'VALID', (1, 64, 128, 256), 128),
      ('deconv4 main k3', 3, 'SAME', (1, 128, 256, 128), 128),
      ('deconv4 up   k2', 2, 'VALID', (1, 128, 256, 128), 128),
      ('final_deconv k2', 2, 'SAME', (1, 256, 512, 128), 128),
  ]
  rng = np.random.RandomState(0)
  print('# timings (bf16, real chip), ms/op over 50 iters:')
  tot_ref = tot_sub = 0.0
  for name, k, pad, xshape, cout in shapes:
    x = jnp.asarray(rng.randn(*xshape).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, xshape[-1], cout).astype(np.float32),
                    jnp.bfloat16)
    f_ref = jax.jit(functools.partial(convt_ref, padding=pad))
    f_sub = jax.jit(functools.partial(convt_subpixel, padding=pad))
    t_ref = fetch_time(f_ref, x, w)
    t_sub = fetch_time(f_sub, x, w)
    tot_ref += t_ref
    tot_sub += t_sub
    print(f'  {name}: dilated {t_ref:7.3f} ms  subpixel {t_sub:7.3f} ms '
          f'({t_ref / t_sub:4.2f}x)')
  print(f'  TOTAL (one decoder): dilated {tot_ref:.3f} ms  '
        f'subpixel {tot_sub:.3f} ms  (x2 decoders per frame)')


if __name__ == '__main__':
  main()
