"""PNG encode/decode for dataset images, without TensorFlow.

The SE3DS TFRecords store PNG-encoded RGB images, uint8 masks, and uint16
depth maps (reference datasets/indoor_datasets.py:185-228). PIL provides
the fast path; a pure zlib+numpy codec is the fallback so the package has
no hard PIL dependency.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:
  from PIL import Image as _PILImage
  _HAS_PIL = True
except Exception:  # pragma: no cover
  _HAS_PIL = False


def decode_png(data: bytes) -> np.ndarray:
  """Decodes PNG bytes to (H, W) or (H, W, C) uint8/uint16 array."""
  if _HAS_PIL:
    img = _PILImage.open(io.BytesIO(data))
    arr = np.asarray(img)
    if arr.dtype == np.int32:  # PIL 'I' mode for 16-bit
      arr = arr.astype(np.uint16)
    return arr
  return _decode_png_pure(data)


def encode_png(arr: np.ndarray) -> bytes:
  """Encodes a uint8 (H,W[,C]) or uint16 (H,W) array to PNG bytes."""
  if _HAS_PIL and arr.dtype == np.uint8:
    img = _PILImage.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format='PNG')
    return buf.getvalue()
  if _HAS_PIL and arr.dtype == np.uint16 and arr.ndim == 2:
    img = _PILImage.fromarray(arr.astype(np.int32), mode='I')
    buf = io.BytesIO()
    # PIL 'I' saves as 32-bit; use the pure encoder for 16-bit fidelity.
    return _encode_png_pure(arr)
  return _encode_png_pure(arr)


# --- pure python codec -------------------------------------------------------

_PNG_SIG = b'\x89PNG\r\n\x1a\n'


def _chunk(tag: bytes, payload: bytes) -> bytes:
  return (struct.pack('>I', len(payload)) + tag + payload
          + struct.pack('>I', zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _encode_png_pure(arr: np.ndarray) -> bytes:
  if arr.ndim == 2:
    arr = arr[..., None]
  h, w, c = arr.shape
  if arr.dtype == np.uint8:
    bit_depth = 8
  elif arr.dtype == np.uint16:
    bit_depth = 16
  else:
    raise ValueError(f'unsupported dtype {arr.dtype}')
  color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
  ihdr = struct.pack('>IIBBBBB', w, h, bit_depth, color_type, 0, 0, 0)
  if bit_depth == 16:
    raw = arr.astype('>u2').tobytes()
    stride = w * c * 2
  else:
    raw = arr.tobytes()
    stride = w * c
  lines = bytearray()
  for y in range(h):
    lines.append(0)  # filter: none
    lines.extend(raw[y * stride:(y + 1) * stride])
  idat = zlib.compress(bytes(lines), 6)
  return (_PNG_SIG + _chunk(b'IHDR', ihdr) + _chunk(b'IDAT', idat)
          + _chunk(b'IEND', b''))


def _paeth(a, b, c):
  p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
  pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
  out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
  return out.astype(np.uint8)


def _decode_png_pure(data: bytes) -> np.ndarray:
  assert data[:8] == _PNG_SIG, 'not a PNG'
  pos = 8
  idat = bytearray()
  ihdr = None
  while pos < len(data):
    (length,) = struct.unpack('>I', data[pos:pos + 4])
    tag = data[pos + 4:pos + 8]
    payload = data[pos + 8:pos + 8 + length]
    pos += 12 + length
    if tag == b'IHDR':
      ihdr = struct.unpack('>IIBBBBB', payload)
    elif tag == b'IDAT':
      idat.extend(payload)
    elif tag == b'IEND':
      break
  w, h, bit_depth, color_type, _, _, interlace = ihdr
  assert interlace == 0, 'interlaced PNG unsupported'
  channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
  bpp = channels * (bit_depth // 8)
  stride = w * bpp
  raw = zlib.decompress(bytes(idat))
  out = np.zeros((h, stride), np.uint8)
  prev = np.zeros((stride,), np.uint8)
  for y in range(h):
    f = raw[y * (stride + 1)]
    line = np.frombuffer(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
                         np.uint8).copy()
    if f == 0:
      pass
    elif f == 2:  # up
      line = (line + prev).astype(np.uint8)
    elif f in (1, 3, 4):  # sub / average / paeth need sequential scan
      cur = np.zeros_like(line)
      for x in range(stride):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        cc = prev[x - bpp] if x >= bpp else 0
        if f == 1:
          val = line[x] + a
        elif f == 3:
          val = line[x] + ((int(a) + int(b)) // 2)
        else:
          val = line[x] + _paeth(np.uint8(a), np.uint8(b), np.uint8(cc))
        cur[x] = np.uint8(val)
      line = cur
    else:
      raise ValueError(f'unsupported filter {f}')
    out[y] = line
    prev = line
  if bit_depth == 16:
    arr = out.reshape(h, w, channels, 2)
    arr = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
  else:
    arr = out.reshape(h, w, channels)
  if channels == 1:
    arr = arr[..., 0]
  return arr
