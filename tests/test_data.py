"""Data pipeline tests: TFRecord framing, Example codec, PNG codec,
TensorProto codec, end-to-end dataset iteration — cross-checked against
TensorFlow parsers where available (TF is test-time only)."""

import os

import numpy as np
import pytest

from se3ds_tpu import constants
from se3ds_tpu.data import (datasets, example_pb, png, synthetic,
                            tensorproto, tfrecord)


def test_tfrecord_roundtrip(tmp_path):
  path = str(tmp_path / 'x.tfrecord')
  records = [b'hello', b'world' * 100, b'']
  with tfrecord.TFRecordWriter(path) as w:
    for r in records:
      w.write(r)
  out = list(tfrecord.read_records(path, verify_crc=True))
  assert out == records


def test_tfrecord_tf_compat(tmp_path):
  tf = pytest.importorskip('tensorflow')
  path = str(tmp_path / 'x.tfrecord')
  with tfrecord.TFRecordWriter(path) as w:
    w.write(b'abc')
    w.write(b'defg')
  got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
  assert got == [b'abc', b'defg']


def test_example_roundtrip():
  feats = {
      'a_bytes': [b'xyz', b'pq'],
      'b_float': [1.5, -2.25],
      'c_int': [7, -3, 1 << 40],
  }
  data = example_pb.encode_example(feats)
  out = example_pb.decode_example(data)
  assert out['a_bytes'] == [b'xyz', b'pq']
  np.testing.assert_allclose(out['b_float'], [1.5, -2.25])
  assert out['c_int'] == [7, -3, 1 << 40]


def test_example_tf_compat():
  tf = pytest.importorskip('tensorflow')
  data = example_pb.encode_example({
      'img': [b'\x00\x01'], 'scale': [2.5], 'count': [42]})
  ex = tf.train.Example.FromString(data)
  assert ex.features.feature['img'].bytes_list.value[0] == b'\x00\x01'
  assert abs(ex.features.feature['scale'].float_list.value[0] - 2.5) < 1e-6
  assert ex.features.feature['count'].int64_list.value[0] == 42
  # And decode TF-produced bytes.
  out = example_pb.decode_example(ex.SerializeToString())
  assert out['count'] == [42]


@pytest.mark.parametrize('dtype,shape', [
    (np.uint8, (8, 12, 3)), (np.uint8, (8, 12)), (np.uint16, (8, 12))])
def test_png_roundtrip(dtype, shape):
  rng = np.random.RandomState(0)
  hi = 65535 if dtype == np.uint16 else 255
  arr = rng.randint(0, hi + 1, shape).astype(dtype)
  data = png.encode_png(arr)
  out = png.decode_png(data)
  np.testing.assert_array_equal(out, arr)


def test_png_pure_decode_matches():
  rng = np.random.RandomState(1)
  arr = rng.randint(0, 256, (6, 7, 3)).astype(np.uint8)
  data = png._encode_png_pure(arr)
  np.testing.assert_array_equal(png._decode_png_pure(data), arr)
  np.testing.assert_array_equal(png.decode_png(data), arr)


def test_png_tf_compat():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(2)
  arr = rng.randint(0, 65536, (5, 9)).astype(np.uint16)
  data = png.encode_png(arr)
  out = tf.image.decode_png(data, channels=1, dtype=tf.uint16).numpy()
  np.testing.assert_array_equal(out[..., 0], arr)


def test_tensorproto_roundtrip():
  rng = np.random.RandomState(3)
  for arr in [rng.rand(2, 3, 4).astype(np.float32),
              rng.randint(0, 255, (3, 4)).astype(np.uint8),
              np.arange(5, dtype=np.int64)]:
    out = tensorproto.decode_tensor(tensorproto.encode_tensor(arr))
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype


def test_tensorproto_tf_compat():
  tf = pytest.importorskip('tensorflow')
  arr = np.random.RandomState(4).rand(2, 5).astype(np.float32)
  data = tensorproto.encode_tensor(arr)
  out = tf.io.parse_tensor(data, out_type=tf.float32).numpy()
  np.testing.assert_array_equal(out, arr)
  # Decode TF-produced bytes.
  ser = tf.io.serialize_tensor(tf.constant(arr)).numpy()
  np.testing.assert_array_equal(tensorproto.decode_tensor(ser), arr)


@pytest.fixture(scope='module')
def fixture_dir(tmp_path_factory):
  d = tmp_path_factory.mktemp('tfrecords')
  synthetic.write_image_fixture(str(d / 'train-0.tfrecord'), num_examples=6,
                                height=64)
  synthetic.write_image_fixture(str(d / 'val-0.tfrecord'), num_examples=4,
                                height=64)
  synthetic.write_video_fixture(str(d / 'val_seen-0.tfrecord'),
                                num_examples=2, height=64)
  return str(d)


def test_image_dataset_end_to_end(fixture_dir):
  ds = datasets.R2RImageDataset(
      image_size=32, preprocessed_image_height=64, data_dir=fixture_dir)
  it = ds.input_fn('train', global_batch_size=4, shuffle=True,
                   num_epochs=2, seed=0)
  batch = next(it)
  h, w = 32, 64
  assert batch['image'].shape == (4, h, w, 3)
  assert batch['proj_image'].shape == (4, h, w, 3)
  assert batch['proj_depth'].shape == (4, h, w, 1)
  assert batch['proj_mask'].shape == (4, h, w, 1)
  assert batch['blurred_mask'].shape == (4, h, w, 1)
  assert batch['depth'].shape == (4, h, w, 1)
  assert batch['segmentation'].shape == (4, h, w, 1)
  assert batch['one_hot_mask'].shape == (4, h, w, constants.NUM_MP3D_CLASSES)
  assert batch['image'].min() >= 0 and batch['image'].max() <= 1
  # proj inputs are mask-multiplied (reference batch transform).
  masked = batch['proj_image'] * batch['proj_mask']
  np.testing.assert_allclose(batch['proj_image'], masked, atol=1e-6)


def test_image_dataset_sharding(fixture_dir):
  ds = datasets.R2RImageDataset(
      image_size=32, preprocessed_image_height=64, data_dir=fixture_dir)
  it0 = ds.input_fn('train', global_batch_size=4, num_epochs=1,
                    num_shards=2, shard_index=0, shuffle=False)
  # Only one train file: shard 1 gets nothing, shard 0 everything.
  batches0 = list(it0)
  # 6 examples, per-shard batch 4//2=2 -> 3 batches for shard 0.
  assert len(batches0) == 3
  assert batches0[0]['image'].shape[0] == 2
  it1 = ds.input_fn('train', global_batch_size=4, num_epochs=1,
                    num_shards=2, shard_index=1, shuffle=False)
  assert not list(it1)


def test_video_dataset_end_to_end(fixture_dir):
  ds = datasets.R2RVideoDataset(
      image_size=32, preprocessed_image_height=64, data_dir=fixture_dir)
  it = ds.input_fn('val_seen', global_batch_size=2, num_epochs=1)
  batch = next(it)
  t = constants.PANO_VIDEO_LENGTH
  assert batch['image'].shape == (2, t, 32, 64, 3)
  assert batch['original_image'].shape == (2, t, 32, 64, 3)
  assert batch['position'].shape == (2, t, 4)
  assert batch['depth'].shape == (2, t, 32, 64, 1)
  assert batch['segmentation'].shape == (2, t, 32, 64, 1)
  assert batch['mask'].shape == (2, t)


def test_re10k_transform(tmp_path):
  path = str(tmp_path / 'train-0.tfrecord')
  synthetic.write_image_fixture(path, num_examples=3, height=64,
                                dataset_type=2)
  ds = datasets.R2RImageDataset(
      image_size=32, preprocessed_image_height=64, data_dir=str(tmp_path),
      re_10k_crop=True)
  it = ds.input_fn('train', global_batch_size=3, num_epochs=1)
  batch = next(it)
  assert batch['image'].shape == (3, 32, 64, 3)
  assert batch['proj_image'].shape == (3, 32, 64, 3)
  # RE10K: blurred mask derives from visible mask.
  assert batch['blurred_mask'].shape == (3, 32, 64, 1)
  assert batch['bbox'].shape == (3, 4)


def test_z_generator_modes():
  """Reference base_dataset.py:36-50: cpu modes emit a host 'z'; 'device'
  defers z to the accelerator (no 'z' in the host batch); unknown modes
  are rejected."""
  import jax
  from se3ds_tpu.data import datasets as ds_lib
  rng = np.random.RandomState(0)
  for mode, has_z in (('cpu_generator', True), ('cpu_random', True),
                      ('device', False)):
    ds = ds_lib.R2RImageDataset(image_size=32, preprocessed_image_height=64,
                                z_generator=mode)
    raw = synthetic.make_image_example(height=64)
    out = ds._train_transform_fn(ds._parse(raw), rng)
    assert ('z' in out) == has_z, (mode, sorted(out))
    if has_z:
      assert out['z'].shape == (ds.z_dim,)
  with pytest.raises(ValueError, match='z_generator'):
    ds_lib.R2RImageDataset(image_size=32, z_generator='gpu')
  z = ds_lib.device_z(jax.random.PRNGKey(0), 4, z_dim=16)
  assert z.shape == (4, 16) and z.dtype == np.float32


def test_sharded_input_partitions_disjoint_and_complete(tmp_path):
  """Multi-host sharding (reference base_dataset.py:105-143): N-shard
  runs must partition the record set DISJOINTLY and COMPLETELY at the
  file level, with shuffle on (each shard's rng is seeded seed+shard so
  the shuffle cannot leak records across shards), and per-host batch
  size = global // num_shards."""
  from se3ds_tpu.data import example_pb, tfrecord

  # 4 files x 5 records with GLOBALLY unique filenames (the fixture
  # writer reuses img%d per file, so write files directly).
  rng = np.random.RandomState(0)
  gid = 0
  for f in range(4):
    with tfrecord.TFRecordWriter(
        str(tmp_path / f'train-{f}.tfrecord')) as w:
      for _ in range(5):
        raw = synthetic.make_image_example(height=64, rng=rng, index=gid)
        gid += 1
        w.write(raw)
  all_ids = {b'img%d.png' % i for i in range(gid)}

  ds = datasets.R2RImageDataset(
      image_size=32, preprocessed_image_height=64, data_dir=str(tmp_path),
      return_filename=True)

  def collect(num_shards, shard_index, **kw):
    it = ds.input_fn('train', global_batch_size=4, num_epochs=1,
                     num_shards=num_shards, shard_index=shard_index,
                     shuffle=True, shuffle_buffer_size=7, seed=11,
                     drop_remainder=False, **kw)
    ids = []
    for batch in it:
      assert batch['image'].shape[0] <= 4 // num_shards
      ids.extend(batch['filename'])
    return ids

  shard_ids = [collect(2, s) for s in range(2)]
  for ids in shard_ids:
    assert len(ids) == len(set(ids)) == 10  # complete, no duplicates
  assert set(shard_ids[0]) & set(shard_ids[1]) == set()  # disjoint
  assert set(shard_ids[0]) | set(shard_ids[1]) == all_ids  # complete

  # Same seed, same shard -> deterministic order (restart reproducibility);
  # different shards see different shuffle streams (seed + shard_index).
  assert collect(2, 0) == shard_ids[0]

  # 1-shard run sees everything exactly once too.
  ids1 = collect(1, 0)
  assert sorted(ids1) == sorted(all_ids)
