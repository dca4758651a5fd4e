"""TFRecord container I/O without TensorFlow.

TFRecord framing (per record):
  uint64 length (LE) | uint32 masked-crc32c(length) | data | uint32
  masked-crc32c(data)

The reader accepts the same files the reference's `tf.data.TFRecordDataset`
consumes (reference datasets/base_dataset.py:52-77). A native C++ reader
(native/dataloader.cc) is used when available; this module is the portable
fallback and the writer used for fixtures/tests.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional

# crc32c (Castagnoli) table, polynomial 0x1EDC6F41 (reflected 0x82F63B78).
_CRC_TABLE = []


def _build_table():
  poly = 0x82F63B78
  for i in range(256):
    crc = i
    for _ in range(8):
      crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes, crc: int = 0) -> int:
  crc = crc ^ 0xFFFFFFFF
  for b in data:
    crc = (_CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)) & 0xFFFFFFFF
  return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
  crc = crc32c(data)
  return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


class TFRecordWriter:
  """Writes TFRecord files compatible with tf.io.TFRecordWriter."""

  def __init__(self, path: str):
    self._f = open(path, 'wb')

  def write(self, record: bytes) -> None:
    length = struct.pack('<Q', len(record))
    self._f.write(length)
    self._f.write(struct.pack('<I', masked_crc32c(length)))
    self._f.write(record)
    self._f.write(struct.pack('<I', masked_crc32c(record)))

  def close(self) -> None:
    self._f.close()

  def __enter__(self):
    return self

  def __exit__(self, *a):
    self.close()


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
  """Yields raw record payloads from a TFRecord file."""
  with open(path, 'rb') as f:
    while True:
      header = f.read(12)
      if len(header) < 12:
        return
      (length,) = struct.unpack('<Q', header[:8])
      if verify_crc:
        (crc,) = struct.unpack('<I', header[8:12])
        if masked_crc32c(header[:8]) != crc:
          raise IOError(f'corrupted record length crc in {path}')
      data = f.read(length)
      footer = f.read(4)
      if len(data) < length or len(footer) < 4:
        raise IOError(f'truncated record in {path}')
      if verify_crc:
        (crc,) = struct.unpack('<I', footer)
        if masked_crc32c(data) != crc:
          raise IOError(f'corrupted record data crc in {path}')
      yield data


def list_files(file_pattern) -> List[str]:
  """Expands glob pattern(s) into a sorted file list."""
  import glob as globlib
  if isinstance(file_pattern, (list, tuple)):
    patterns = list(file_pattern)
  else:
    patterns = [file_pattern]
  files: List[str] = []
  for p in patterns:
    files.extend(globlib.glob(p))
  if not files:
    raise FileNotFoundError(f'No data files matched {file_pattern}')
  return sorted(files)
