"""Microbench: lax.sort payload cost at splat scale (go/no-go for the
exact-Pallas splat design).

The v2 Pallas splat header (ops/splat_pallas.py) records a 1-key/2-payload
`lax.sort` at 9.0 ms for 1M points while PERF.md's round-2 microbench table
records `jnp.sort 1M u32 + 4 payloads` at 2.3 ms. This script measures the
matrix (key dtype x payload count x payload dtype) with the honest
fetch-barrier methodology so the exact-splat design can be costed.

Usage: python scripts/bench_sort_variants.py
Env: SE3DS_SORT_N (default 1048576), SE3DS_SORT_ITERS (default 20).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get('SE3DS_SORT_N', 1 << 20))
ITERS = int(os.environ.get('SE3DS_SORT_ITERS', 20))


def time_op(fn, *args):
  """Relay-safe timing: warm fetch, measure fetch latency, N iters, fetch."""
  out = fn(*args)
  first = out[0] if isinstance(out, (tuple, list)) else out
  np.asarray(first)[:4] if first.ndim else np.asarray(first)
  t0 = time.perf_counter()
  np.asarray(first)[:4] if first.ndim else np.asarray(first)
  fetch = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(ITERS):
    out = fn(*args)
  first = out[0] if isinstance(out, (tuple, list)) else out
  np.asarray(first)[:4] if first.ndim else np.asarray(first)
  return max(time.perf_counter() - t0 - fetch, 1e-9) / ITERS


def main():
  rng = np.random.RandomState(0)
  key_u32 = jnp.asarray(rng.randint(0, 1 << 20, N).astype(np.uint32))
  key_i32 = key_u32.astype(jnp.int32)
  pay_f32 = [jnp.asarray(rng.uniform(0, 20, N).astype(np.float32))
             for _ in range(4)]
  pay_i32 = jnp.asarray(rng.randint(0, 1 << 30, N).astype(np.int32))

  results = {}

  def bench(name, fn, *args):
    ms = time_op(jax.jit(fn), *args) * 1e3
    results[name] = round(ms, 3)
    print(f'{name}: {ms:.3f} ms', flush=True)

  bench('jnp.sort u32 key only', lambda k: jnp.sort(k), key_u32)
  bench('lax.sort u32 key only',
        lambda k: jax.lax.sort([k], num_keys=1)[0], key_u32)
  bench('lax.sort i32 key only',
        lambda k: jax.lax.sort([k], num_keys=1)[0], key_i32)
  for np_ in (1, 2, 3, 4):
    bench(f'lax.sort i32 key + {np_} f32 payloads',
          lambda k, *p: jax.lax.sort([k, *p], num_keys=1),
          key_i32, *pay_f32[:np_])
  bench('lax.sort i32 key + i32 + f32 payloads (v2 shape)',
        lambda k, a, b: jax.lax.sort([k, a, b], num_keys=1),
        key_i32, pay_f32[0], pay_i32)
  bench('lax.sort 2 keys (i32, f32)',
        lambda k, a: jax.lax.sort([k, a], num_keys=2), key_i32, pay_f32[0])

  # searchsorted for per-stripe window starts (513 boundaries).
  sorted_key = jnp.sort(key_i32)
  bounds = jnp.arange(0, 513, dtype=jnp.int32) * (N // 513)
  bench('searchsorted 513 into 1M',
        lambda a, v: jnp.searchsorted(a, v), sorted_key, bounds)
  bounds4k = jnp.arange(0, 4097, dtype=jnp.int32) * (N // 4097)
  bench('searchsorted 4097 into 1M',
        lambda a, v: jnp.searchsorted(a, v), sorted_key, bounds4k)

  print(json.dumps({'metric': 'sort_variants_ms', 'value': results,
                    'n_points': N}))


if __name__ == '__main__':
  main()
