"""Aux utility tests (reference utils/utils_test.py +
inference/perturbation_utils_test.py + logger/task-manager coverage)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from se3ds_tpu import config as config_lib
from se3ds_tpu.eval import fid
from se3ds_tpu.inference import perturbation
from se3ds_tpu.utils import (image_grid, logger, math_utils,
                             parameter_overview, task_manager)


def test_colormap_roundtrip():
  cmap = math_utils.create_label_colormap()
  labels = np.random.RandomState(0).randint(0, 42, (8, 16))
  colored = cmap[labels]
  recovered = math_utils.cmap_to_label(colored, cmap)
  np.testing.assert_array_equal(recovered, labels)


def test_kl_identical_distributions_is_zero():
  mu = jnp.ones((4, 8))
  logvar = jnp.zeros((4, 8)) - 0.5
  kl = math_utils.compute_kl(mu, logvar, mu, logvar)
  np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_kl_shape_mismatch_raises():
  with pytest.raises(ValueError):
    math_utils.compute_kl(jnp.ones((2, 2)), jnp.ones((2, 2)),
                          jnp.ones((2, 3)), jnp.ones((2, 3)))


def test_sequence_iou_perfect_and_zero_mask():
  one_hot = jnp.eye(3)[np.random.RandomState(1).randint(0, 3, (2, 4, 8, 8))]
  seq_iou, mean_iou = math_utils.compute_sequence_iou(
      one_hot, one_hot, jnp.ones((2, 4)))
  np.testing.assert_allclose(np.asarray(mean_iou), 1.0, atol=1e-6)
  # All-zero mask -> 0 (divide_no_nan semantics).
  _, mean_iou0 = math_utils.compute_sequence_iou(
      one_hot, one_hot, jnp.zeros((2, 4)))
  np.testing.assert_allclose(np.asarray(mean_iou0), 0.0, atol=1e-6)


def test_sequence_accuracy():
  pred = jnp.asarray(np.random.RandomState(2).randint(0, 5, (2, 3, 6, 6)))
  _, acc = math_utils.compute_sequence_accuracy(pred, pred, jnp.ones((2, 3)))
  np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)


def test_nearest_neighbor_inpaint():
  img = np.zeros((1, 5, 5), np.float32)
  img[0, 0, 0] = 7.0
  img[0, 4, 4] = 3.0
  filled = math_utils.nearest_neighbor_inpaint(jnp.asarray(img))
  filled = np.asarray(filled)
  assert filled[0, 0, 1] == 7.0  # closest to the 7 corner
  assert filled[0, 4, 3] == 3.0  # closest to the 3 corner
  assert not np.any(filled == 0)


def test_perturbation_uniform_depth():
  """Collision proportions for uniform depth (reference
  perturbation_utils_test.py:30-94): all-far depth -> no collision;
  all-near depth -> full collision."""
  depth_far = np.full((16, 32), 0.9, np.float32)  # 18 m
  offset = np.array([1.0, 0.0, 0.0], np.float32)
  assert perturbation.get_proportion_invalid_for_depth(
      offset, depth_far) == 0.0
  depth_near = np.full((16, 32), 0.01, np.float32)  # 0.2 m
  assert perturbation.get_proportion_invalid_for_depth(
      offset, depth_near) == 1.0


def test_perturbation_directional_window():
  """Only the window toward the motion direction matters."""
  depth = np.full((16, 32), 0.9, np.float32)
  # Put a wall in the window for heading of -(x)= -1 (atan2(1, 0)...):
  offset = np.array([-1.0, 0.0, 0.0], np.float32)
  heading = np.arctan2(1.0, 0.0)  # pi/2 -> proportion 0.25 -> col 8
  depth[:, 6:11] = 0.01
  prop_toward = perturbation.get_proportion_invalid_for_depth(offset, depth)
  assert prop_toward > 0.3
  # Opposite direction: window misses the wall.
  offset_away = np.array([1.0, 0.0, 0.0], np.float32)
  prop_away = perturbation.get_proportion_invalid_for_depth(
      offset_away, depth)
  assert prop_away < prop_toward


def test_sample_perturbed_views_batched_loop():
  """The VLN augmentation loop draws/filters candidates on the host
  (reference RNG order preserved) then synthesises ALL accepted views in
  one predict_poses program. Contract: num_samples (position, OutputData)
  pairs with batch-1 fields, memory untouched."""
  from se3ds_tpu.models import inference, model_config
  model = inference.SE3DSModel(model_config.get_test_config())
  h, w = model.height, model.width
  rng_np = np.random.RandomState(7)
  rgb = rng_np.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng_np.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = np.full((1, h, w), 0.5, np.float32)  # 10 m everywhere: no collision
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))

  results = perturbation.sample_perturbed_views(
      model, np.zeros((1, 3), np.float32), depth[0], num_samples=3,
      rng=np.random.RandomState(3))
  assert len(results) == 3
  # Same accepted positions as the reference's draw-per-attempt loop.
  ref_rng = np.random.RandomState(3)
  for position, out in results:
    noise = ref_rng.uniform([-1.5, -1.5, -0.1], [1.5, 1.5, 0.1]
                            ).astype(np.float32)
    np.testing.assert_array_equal(position, noise[None])
    assert out.pred_rgb.shape == (1, h, w, 3)
    assert out.pred_rgb.dtype == np.uint8
  assert model._frames_written == 1


def test_fid_identical_pools_near_zero():
  rng = np.random.RandomState(3)
  pool = rng.rand(64, 16).astype(np.float64)
  value = fid.calculate_fid(pool, pool.copy())
  assert abs(value) < 1e-6


def test_fid_shifted_pools_positive():
  rng = np.random.RandomState(4)
  a = rng.rand(128, 8)
  b = a + 2.0
  assert fid.calculate_fid(a, b) > 3.0


def test_inception_score_uniform():
  pred = np.full((100, 10), 0.1)
  mean, std = fid.calculate_inception_score(pred)
  np.testing.assert_allclose(mean, 1.0, atol=1e-6)


def test_image_grid_shapes():
  imgs = np.random.RandomState(5).rand(9, 8, 16, 3)
  out = image_grid.get_grid_image(imgs, 9)
  assert out.shape == (1, 3 * 8, 3 * 16, 3)
  d = image_grid.get_grid_image_dict(imgs, 4, 'pfx')
  assert 'pfx' in d and d['pfx'].shape == (1, 16, 32, 3)


def test_parameter_overview():
  params = {'layer': {'kernel': np.zeros((3, 4)), 'bias': np.zeros((4,))}}
  table = parameter_overview.get_parameter_overview(params)
  assert 'layer/kernel' in table
  assert 'Total: 16' in table
  assert parameter_overview.count_parameters(params) == 16


def test_logger_writes_readable_events(tmp_path):
  lg = logger.UniversalLogger(str(tmp_path), step=0)
  lg.log_scalars(5, loss=1.5, acc=0.25)
  lg.log_images(5, demo=np.zeros((1, 4, 8, 3), np.float32))
  files = [f for f in os.listdir(tmp_path) if 'tfevents' in f]
  assert files
  tf = pytest.importorskip('tensorflow')
  tags, values = [], []
  for ev in tf.compat.v1.train.summary_iterator(
      str(tmp_path / files[0])):
    for v in ev.summary.value:
      tags.append(v.tag)
      if v.HasField('simple_value'):
        values.append((v.tag, v.simple_value))
  assert ('loss', 1.5) in values
  assert any('demo' in t for t in tags)


def test_task_manager_polling_and_csv(tmp_path):
  model_dir = str(tmp_path)
  os.makedirs(os.path.join(model_dir, '100'))
  os.makedirs(os.path.join(model_dir, '200'))
  tm = task_manager.TaskManagerWithCsvResults(model_dir)
  tm.mark_training_done()  # stops the generator after draining
  ckpts = list(tm.unevaluated_checkpoints(timeout=1))
  assert [os.path.basename(c) for c in ckpts] == ['100', '200']
  tm.add_eval_result(ckpts[0], {'fid@1': 12.5}, -1)
  # Re-listing skips evaluated.
  tm2 = task_manager.TaskManagerWithCsvResults(model_dir)
  remaining = list(tm2.unevaluated_checkpoints(timeout=1))
  assert [os.path.basename(c) for c in remaining] == ['200']


def test_operative_config_written(tmp_path):
  config_lib.clear_config()
  config_lib.parse_config('GAN.g_lr = 0.5')
  path = config_lib.write_operative_config(str(tmp_path), 7)
  assert os.path.basename(path) == 'operative_config-7.gin'
  content = open(path).read()
  assert 'GAN.g_lr = 0.5' in content
  config_lib.clear_config()
