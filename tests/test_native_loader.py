"""Native C++ data loader tests: parity with the pure-Python path."""

import numpy as np
import pytest

from se3ds_tpu.data import datasets, native_loader, png, synthetic, tfrecord

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason='native loader not built')


@pytest.fixture(scope='module')
def fixture_path(tmp_path_factory):
  d = tmp_path_factory.mktemp('native')
  path = str(d / 'train-0.tfrecord')
  synthetic.write_image_fixture(path, num_examples=3, height=32)
  return path


def test_native_tfrecord_matches_python(fixture_path):
  py_records = list(tfrecord.read_records(fixture_path, verify_crc=True))
  native_records = list(native_loader.read_records(fixture_path,
                                                   verify_crc=True))
  assert len(py_records) == len(native_records) == 3
  for a, b in zip(py_records, native_records):
    assert a == b


def test_native_decode_matches_python(fixture_path):
  for raw in tfrecord.read_records(fixture_path):
    py = datasets._decode_image_example(raw, 32)
    nat = native_loader.decode_image_example(raw, 32)
    for key in ('image', 'proj_image', 'proj_depth', 'proj_mask',
                'blurred_mask', 'segmentation', 'depth', 'visible_mask'):
      np.testing.assert_allclose(nat[key], py[key], atol=1e-6, err_msg=key)
    assert nat['dataset_type'] == py['dataset_type']
    assert abs(nat['depth_scale'] - py['depth_scale']) < 1e-6
    np.testing.assert_allclose(nat['bbox'], py['bbox'])


def test_native_png_decode():
  lib = native_loader.get_lib()
  import ctypes
  rng = np.random.RandomState(0)
  arr = rng.randint(0, 256, (7, 9, 3)).astype(np.uint8)
  data = png.encode_png(arr)
  h = ctypes.c_uint32()
  w = ctypes.c_uint32()
  ch = ctypes.c_int()
  bd = ctypes.c_int()
  out = np.empty((7, 9, 3), np.uint8)
  rc = lib.se3ds_png_decode(
      ctypes.c_char_p(data), ctypes.c_size_t(len(data)),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_size_t(out.nbytes), ctypes.byref(h), ctypes.byref(w),
      ctypes.byref(ch), ctypes.byref(bd))
  assert rc == 0 and h.value == 7 and w.value == 9 and ch.value == 3
  np.testing.assert_array_equal(out, arr)
