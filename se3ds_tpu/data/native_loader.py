"""ctypes bindings for the native C++ data loader (native/dataloader.cc).

Provides GIL-releasing TFRecord iteration and one-call decode of R2R
image-pair Examples into preallocated numpy buffers. Falls back silently
when the shared library has not been built (`native/build.sh`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Iterator, Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
  here = os.path.dirname(os.path.abspath(__file__))
  repo = os.path.dirname(os.path.dirname(here))
  candidates = (os.path.join(repo, 'native', 'libse3ds_dataloader.so'),
                os.path.join(here, 'libse3ds_dataloader.so'))
  for cand in candidates:
    if os.path.exists(cand):
      return cand
  # Auto-build once if the toolchain is available.
  build = os.path.join(repo, 'native', 'build.sh')
  if os.path.exists(build) and not os.environ.get('SE3DS_NO_NATIVE_BUILD'):
    import subprocess
    try:
      subprocess.run(['bash', build], check=True, capture_output=True,
                     timeout=120)
    except Exception:
      return None
    if os.path.exists(candidates[0]):
      return candidates[0]
  return None


def get_lib():
  """Loads the native library once; returns None if unavailable."""
  global _LIB, _TRIED
  if _TRIED:
    return _LIB
  _TRIED = True
  path = _find_lib()
  if path is None:
    return None
  lib = ctypes.CDLL(path)
  lib.se3ds_tfr_open.restype = ctypes.c_void_p
  lib.se3ds_tfr_open.argtypes = [ctypes.c_char_p]
  lib.se3ds_tfr_next.restype = ctypes.c_longlong
  lib.se3ds_tfr_next.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.POINTER(
                                     ctypes.c_uint8)),
                                 ctypes.c_int]
  lib.se3ds_tfr_close.argtypes = [ctypes.c_void_p]
  lib.se3ds_decode_image_example.restype = ctypes.c_int
  lib.se3ds_png_decode.restype = ctypes.c_int
  _LIB = lib
  return _LIB


def available() -> bool:
  return get_lib() is not None


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
  """Native TFRecord payload iterator (drop-in for tfrecord.read_records)."""
  lib = get_lib()
  assert lib is not None
  handle = lib.se3ds_tfr_open(path.encode())
  if not handle:
    raise IOError(f'cannot open {path}')
  try:
    ptr = ctypes.POINTER(ctypes.c_uint8)()
    while True:
      n = lib.se3ds_tfr_next(handle, ctypes.byref(ptr),
                             1 if verify_crc else 0)
      if n == 0:
        return
      if n < 0:
        raise IOError(f'corrupt TFRecord in {path} (code {n})')
      yield ctypes.string_at(ptr, n)
  finally:
    lib.se3ds_tfr_close(handle)


def decode_image_example(record: bytes,
                         height: int) -> Dict[str, np.ndarray]:
  """Decodes an image-pair Example with one native call.

  Returns the same raw-feature dict layout as
  datasets._decode_image_example (float-converted).
  """
  lib = get_lib()
  assert lib is not None
  h, w = height, height * 2
  image = np.empty((h, w, 3), np.uint8)
  proj = np.empty((h, w, 3), np.uint8)
  depth = np.empty((h, w), np.uint16)
  proj_depth = np.empty((h, w), np.uint16)
  proj_mask = np.empty((h, w), np.uint8)
  blurred = np.empty((h, w), np.uint8)
  seg = np.empty((h, w), np.uint8)
  visible = np.zeros((h, w), np.uint8)
  depth_scale = ctypes.c_float()
  dataset_type = ctypes.c_longlong()
  bbox = (ctypes.c_float * 4)()
  has_visible = ctypes.c_int()

  def p(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)

  rc = lib.se3ds_decode_image_example(
      ctypes.c_char_p(record), ctypes.c_size_t(len(record)),
      ctypes.c_uint32(h), ctypes.c_uint32(w),
      p(image), p(proj), p(depth), p(proj_depth), p(proj_mask), p(blurred),
      p(seg), p(visible), ctypes.byref(depth_scale),
      ctypes.byref(dataset_type), bbox, ctypes.byref(has_visible))
  if rc != 0:
    raise ValueError(f'native decode failed with code {rc}')

  shape = (h, w)
  out = {
      'dataset_type': int(dataset_type.value),
      'depth_scale': float(depth_scale.value),
      'bbox': np.asarray(bbox[:], np.float32),
      'image': image.astype(np.float32) / 255.0,
      'proj_image': proj.astype(np.float32) / 255.0,
      'proj_depth': proj_depth.astype(np.float32) / 65535.0,
      'proj_mask': np.clip(proj_mask, 0, 1).astype(np.float32),
      'blurred_mask': np.clip(blurred, 0, 1).astype(np.float32)[..., None],
      'segmentation': seg.astype(np.int32),
      'depth': depth.astype(np.float32) / 65535.0,
      'filename': b'',
      'scan_id': b'',
  }
  out['segmentation_valid'] = np.float32(np.any(out['segmentation'] != 0))
  if out['dataset_type'] == 2 and has_visible.value:  # RE10K
    vis = np.clip(visible, 0, 1).astype(np.float32)[..., None]
    out['visible_mask'] = vis
    out['blurred_mask'] = 1.0 - vis
  else:
    out['visible_mask'] = np.zeros(shape + (1,), np.float32)
  return out
