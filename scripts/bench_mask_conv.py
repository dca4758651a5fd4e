"""Measures the partial-conv mask-propagation cost: conv vs reduce_window.

Every PartialConv propagates its mask with a ones-kernel conv
(reference layers.py:152-163); on an R101 encoder that is ~105 single
channel convs per forward — 1-in/1-out channel convs that waste the
128x128 MXU. Candidate replacements, all bit-exact on 0/1 masks (sums
of 0/1 in any association are small exact integers, <= kh*kw <= 49,
exactly representable even in bf16):

  conv       ones (kh,kw,1,1) conv  — current implementation
  rw         lax.reduce_window add with the same window/strides/padding
  rw_sep     two separable 1-D reduce_windows (row sum then col sum)
  slice      1x1 kernels only: the ones-conv is the identity (stride 1)
             or a strided slice (stride s)

Times each variant per distinct mask-conv shape of the production R101
encoder at eval (512x1024 circular) and train (128x256) sizes, and
asserts bitwise equality first.

MEASURED RESULT (v5e, round 4): every shape and every variant lands at
the same ~0.49 ms/iteration — the relay program round-trip floor
(~25 ms per 50-iteration program) divided by the iteration count, i.e.
the ops themselves are microsecond-scale and unresolvable one at a
time through the relay. The actionable conclusion is the bound: all
~105 mask-propagation ops of an R101 forward cost well under 1 ms
combined in either implementation, so the mask path is NOT a
performance lever; the end-to-end A/B (profile_generator.py
onedecoder/full old-vs-new) is the decisive measurement.

Usage: python scripts/bench_mask_conv.py
Env: SE3DS_BENCH_ITERS (50)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
  import jax
  import jax.numpy as jnp

  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 50))

  def conv_ones(mask, kh, kw, stride, pad):
    kernel = jnp.ones((kh, kw, 1, 1), mask.dtype)
    return jax.lax.conv_general_dilated(
        mask, kernel, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  def rw(mask, kh, kw, stride, pad):
    return jax.lax.reduce_window(
        mask, 0.0, jax.lax.add, window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))

  def rw_sep(mask, kh, kw, stride, pad):
    rows = jax.lax.reduce_window(
        mask, 0.0, jax.lax.add, window_dimensions=(1, kh, 1, 1),
        window_strides=(1, stride, 1, 1),
        padding=((0, 0), (pad, pad), (0, 0), (0, 0)))
    return jax.lax.reduce_window(
        rows, 0.0, jax.lax.add, window_dimensions=(1, 1, kw, 1),
        window_strides=(1, 1, stride, 1),
        padding=((0, 0), (0, 0), (pad, pad), (0, 0)))

  def slice_1x1(mask, kh, kw, stride, pad):
    assert (kh, kw, pad) == (1, 1, 0)
    return mask[:, ::stride, ::stride, :]

  # (label, H, W, kh, stride, pad, count-per-R101-encoder-forward)
  # Counts: stem 7x7; per stack [3,4,23,3] bottlenecks each 1x1 + 3x3 +
  # 1x1 (+1 downsample 1x1 per stack); stack resolutions H/4..H/32.
  def shapes(h, w):
    return [
        ('stem7x7_s2', h, w, 7, 2, 3, 1),
        ('s1_1x1', h // 4, w // 4, 1, 1, 0, 7),
        ('s1_3x3', h // 4, w // 4, 3, 1, 1, 3),
        ('s2_3x3s2', h // 4, w // 4, 3, 2, 1, 1),
        ('s2_1x1', h // 8, w // 8, 1, 1, 0, 9),
        ('s2_3x3', h // 8, w // 8, 3, 1, 1, 3),
        ('s3_3x3s2', h // 8, w // 8, 3, 2, 1, 1),
        ('s3_1x1', h // 16, w // 16, 1, 1, 0, 47),
        ('s3_3x3', h // 16, w // 16, 3, 1, 1, 22),
        ('s4_3x3s2', h // 16, w // 16, 3, 2, 1, 1),
        ('s4_1x1', h // 32, w // 32, 1, 1, 0, 7),
        ('s4_3x3', h // 32, w // 32, 3, 1, 1, 2),
    ]

  def time_fn(fn, x, n):
    """lax.scan-fused timing with a data dependency between iterations
    (mask stays 0/1: feed back clip(out mod 2) — cheap, unfoldable)."""
    def body(m, _):
      out = fn(m)
      # Rebuild a 0/1 mask of the INPUT shape from the output so the
      # scan chains (resize by broadcast-slice; cost is one elementwise
      # pass, identical across variants so the comparison stays fair).
      probe = jnp.mean(out) * 1e-12
      return jnp.clip(m + probe, 0.0, 1.0), None

    def prog(m):
      m, _ = jax.lax.scan(body, m, None, length=n)
      return m[0, 0, :2, 0]
    jfn = jax.jit(prog)
    out = jfn(x)
    np.asarray(out)
    t0 = time.perf_counter()
    out = jfn(x)
    np.asarray(out)
    t1 = time.perf_counter()
    fetch = 0.0  # output is 2 floats; fetch latency folded into both arms
    return max(t1 - t0 - fetch, 1e-9) / n * 1e3

  rng = np.random.default_rng(0)
  total = {}
  for tag, h, w in (('eval_1024x512', 512, 1024), ('train_256x128', 128, 256)):
    print(f'# {tag}')
    sums = {}
    for (label, hh, ww, k, s, p, count) in shapes(h, w):
      mask = jnp.asarray((rng.random((1, hh, ww, 1)) > 0.3).astype(np.float32))
      variants = {'conv': lambda m, k=k, s=s, p=p: conv_ones(m, k, k, s, p),
                  'rw': lambda m, k=k, s=s, p=p: rw(m, k, k, s, p),
                  'rw_sep': lambda m, k=k, s=s, p=p: rw_sep(m, k, k, s, p)}
      if k == 1 and p == 0:
        variants['slice'] = lambda m, s=s: slice_1x1(m, 1, 1, s, 0)
      ref = np.asarray(jax.jit(variants['conv'])(mask))
      row = {'shape': f'{label} {hh}x{ww} k{k}s{s}', 'count': count}
      for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(mask))
        assert np.array_equal(ref, got), (tag, label, name)
        ms = time_fn(fn, mask, iters)
        row[name] = round(ms, 4)
        sums.setdefault(name, 0.0)
        sums[name] += ms * count
      # Best replacement for this shape (slice if available, else min).
      print(json.dumps(row))
    best = {n: round(v, 2) for n, v in sums.items()}
    print(json.dumps({'per_forward_ms_totals': best}))
    total[tag] = best
  print(json.dumps({'summary': total}))


if __name__ == '__main__':
  main()
