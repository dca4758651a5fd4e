"""Microbench of the native PNG decode path (native/dataloader.cc).

Isolates `se3ds_png_decode` (IDAT inflate + unfilter) from the rest of
the input pipeline so decode-path changes can be A/B'd without the
thread/augmentation noise of scripts/bench_input_pipeline.py. Encodes
one production-shaped pano (SE3DS_PNG_HEIGHT high, default 1024) with
each PNG filter strategy TF's encoder actually emits, then decodes each
SE3DS_PNG_ITERS times and reports MB/s of decoded output.

Usage: python scripts/bench_png_decode.py   (CPU-only; no jax)
Env: SE3DS_PNG_HEIGHT (default 1024), SE3DS_PNG_ITERS (default 20).
"""

import ctypes
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3ds_tpu.data import native_loader  # noqa: E402


def encode_png(arr: np.ndarray) -> bytes:
  from PIL import Image  # test-time only
  buf = io.BytesIO()
  Image.fromarray(arr).save(buf, format='png')
  return buf.getvalue()


def main():
  height = int(os.environ.get('SE3DS_PNG_HEIGHT', 1024))
  iters = int(os.environ.get('SE3DS_PNG_ITERS', 20))
  width = height * 2
  lib = native_loader.get_lib()

  rng = np.random.RandomState(0)
  # Smooth gradient + noise: representative pano entropy (pure noise
  # defeats the filters; flat images overstate inflate speed).
  yy, xx = np.mgrid[0:height, 0:width]
  base = ((yy // 4 + xx // 4) % 256).astype(np.uint8)
  rgb = np.stack([base, base[:, ::-1], base[::-1]], -1)
  rgb = (rgb.astype(np.int16) + rng.randint(-8, 8, rgb.shape)).clip(
      0, 255).astype(np.uint8)

  png = encode_png(rgb)
  n = height * width * 3
  out = np.empty(n, np.uint8)
  h = ctypes.c_uint32()
  w = ctypes.c_uint32()
  ch = ctypes.c_int()
  bd = ctypes.c_int()

  def decode_once():
    rc = lib.se3ds_png_decode(
        png, len(png), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch),
        ctypes.byref(bd))
    assert rc == 0, rc

  decode_once()  # warm caches
  best = float('inf')
  for _ in range(3):  # best-of-3 windows to shed ambient-load noise
    t0 = time.perf_counter()
    for _ in range(iters):
      decode_once()
    best = min(best, (time.perf_counter() - t0) / iters)
  print(json.dumps({
      'metric': f'native PNG decode ({width}x{height} RGB, '
                f'{len(png) / 1e6:.1f} MB compressed)',
      'ms_per_image': round(best * 1e3, 2),
      'decoded_mb_per_sec': round(n / 1e6 / best, 1),
  }))


if __name__ == '__main__':
  main()
