"""Integration test: micro-GAN end-to-end train + eval on fixture
TFRecords (reference trainers/se3ds_trainer_test.py)."""

import glob
import os

import numpy as np
import pytest

from se3ds_tpu import config as config_lib
from se3ds_tpu.data import synthetic
from se3ds_tpu.train import trainer as trainer_lib  # noqa: F401 (registers configurables)


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
  d = tmp_path_factory.mktemp('trainer')
  data_dir = d / 'data'
  data_dir.mkdir()
  synthetic.write_image_fixture(str(data_dir / 'train-0.tfrecord'),
                                num_examples=8, height=64)
  synthetic.write_video_fixture(str(data_dir / 'val_seen-0.tfrecord'),
                                num_examples=2, height=64)
  return d


@pytest.fixture(scope='module')
def trainer(workdir):
  config_lib.clear_config()
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  config_lib.parse_config_files_and_bindings(
      [os.path.join(repo, 'configs', 'tiny_test.gin')],
      [f"R2RImageDataset.data_dir = '{workdir}/data/'",
       f"R2RVideoDataset.data_dir = '{workdir}/data/'"])
  model_dir = str(workdir / 'model')
  t = config_lib.apply_config('GAN', model_dir=model_dir)
  return t


def test_train_one_epoch_writes_checkpoint(trainer):
  state = trainer.train()
  # num_epochs=-1 -> single step (reference se3ds_trainer_test.py:113-115).
  assert int(state.step) == 1
  # Orbax checkpoint directory for the final step exists.
  steps = [d for d in os.listdir(trainer.model_dir) if d.isdigit()]
  assert steps, os.listdir(trainer.model_dir)
  # TRAIN_DONE marker written.
  assert os.path.exists(os.path.join(trainer.model_dir, 'TRAIN_DONE'))
  # Operative config written (fixes a reference gap).
  assert glob.glob(os.path.join(trainer.model_dir, 'operative_config-*.gin'))
  # TB events file exists.
  assert glob.glob(os.path.join(trainer.model_dir, 'events.out.tfevents.*'))


def test_eval_unit_path(trainer):
  result = trainer.test(unit_test=True)
  assert result, 'expected eval results'
  keys = list(result)
  assert any('fid@1' in k for k in keys), keys
  assert any('ema_rmse@1' in k for k in keys), keys
  for k, v in result.items():
    assert np.isfinite(v), (k, v)
  # Eval wrote per-frame PNG dumps.
  img_dir = os.path.join(trainer.model_dir, 'images', 'val_seen')
  assert os.path.isdir(img_dir)


def test_config_parsing_surface():
  config_lib.clear_config()
  config_lib.parse_config(
      """
      # comment
      GAN.g_lr = 0.0001
      GAN.generator_fn = @image_models.ResNetGenerator
      image_models.ResNetGenerator.gen_dims = 16
      GAN.test_split = 'val_seen'
      GAN.num_epochs = 500
      GAN.predict_depth = True
      """)
  b = config_lib.get_bindings('GAN')
  assert b['g_lr'] == 0.0001
  assert b['num_epochs'] == 500
  assert b['predict_depth'] is True
  assert b['test_split'] == 'val_seen'
  ref = b['generator_fn']
  assert isinstance(ref, config_lib.ConfigurableReference)
  gen = ref(image_size=64)
  assert gen.gen_dims == 16
  config_lib.clear_config()
