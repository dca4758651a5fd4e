"""End-to-end two-job protocol: a real training run producing multiple
Orbax checkpoints, then a TEST job driving the genuine continuous-eval
path — checkpoint polling, restore-by-step, multi-row CSV, TRAIN_DONE
termination (reference gan_manager.py:233-322 + task_manager.py:84-141).

Unlike tests/test_trainer.py (which uses the unit_test=True shortcut,
reference gan_manager.py:257-259), this exercises the production loop:
`unevaluated_checkpoints` discovery, `int(os.path.basename(path))` step
parsing, Orbax restore of each step, and CSV append across checkpoints.
Sequential on one process (VERDICT r2 #5: fine on a 1-core box).
"""

import csv
import glob
import os

import numpy as np
import pytest

from se3ds_tpu import config as config_lib
from se3ds_tpu.data import synthetic
from se3ds_tpu.train import trainer as trainer_lib  # noqa: F401 (registers configurables)


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
  d = tmp_path_factory.mktemp('two_job')
  data_dir = d / 'data'
  data_dir.mkdir()
  synthetic.write_image_fixture(str(data_dir / 'train-0.tfrecord'),
                                num_examples=8, height=64)
  synthetic.write_video_fixture(str(data_dir / 'val_seen-0.tfrecord'),
                                num_examples=2, height=64)
  return d


@pytest.fixture(scope='module')
def model_dir(workdir):
  """Job 1: train 4 steps, saving checkpoints at steps 2 and 4."""
  config_lib.clear_config()
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  config_lib.parse_config_files_and_bindings(
      [os.path.join(repo, 'configs', 'tiny_test.gin')],
      [f"R2RImageDataset.data_dir = '{workdir}/data/'",
       f"R2RVideoDataset.data_dir = '{workdir}/data/'",
       'GAN.num_epochs = 1',
       # num_examples is hardcoded to the reference's 183,621 (parity),
       # which would make one epoch ~46k steps; pin a 16-example epoch:
       # 16 / (batch 2 * 2 d-steps) = 4 steps, save_every_steps=2 ->
       # checkpoints at steps 2 and 4 (the train pipeline repeats, so
       # the 8-record fixture serves 16 examples fine).
       "R2RImageDataset.num_examples_override = {'train': 16, 'val': 4}"])
  model_dir = str(workdir / 'model')
  trainer = config_lib.apply_config('GAN', model_dir=model_dir)
  state = trainer.train()
  assert int(state.step) == 4
  return model_dir


def test_training_saved_multiple_checkpoints(model_dir):
  steps = sorted(int(d) for d in os.listdir(model_dir) if d.isdigit())
  assert steps == [2, 4], steps
  assert os.path.exists(os.path.join(model_dir, 'TRAIN_DONE'))


def test_continuous_eval_real_polling_loop(model_dir):
  """Job 2: the TEST job discovers both checkpoints via the genuine
  polling loop, restores each by step, and appends one CSV row per
  checkpoint before TRAIN_DONE terminates the generator."""
  trainer = config_lib.apply_config('GAN', model_dir=model_dir)
  trainer.test(unit_test=False)  # returns when TRAIN_DONE is observed

  csv_path = os.path.join(model_dir, 'scores_val_seen.csv')
  assert os.path.exists(csv_path)
  with open(csv_path) as f:
    rows = list(csv.DictReader(f))
  # eval_every_steps=2, num_batched_steps=1: step 2 and 4 both pass the
  # `step > nbs and step % eval_every < nbs` filter.
  assert [int(r['step']) for r in rows] == [2, 4], rows
  for row in rows:
    fid = float(row[[k for k in row if k.endswith('fid@1')][0]])
    assert np.isfinite(fid)
    # Operative-config provenance inlined per row (reference
    # task_manager.py:166-201; the reference never wrote the file, we do).
    assert any(k.startswith('GAN.') for k in row), sorted(row)

  # Per-frame RGB + depth PNG dumps exist for every evaluated step.
  for step in (2, 4):
    step_dir = os.path.join(model_dir, 'images', 'val_seen', str(step))
    assert glob.glob(os.path.join(step_dir, '*', '*_rgb.png')), step_dir
    assert glob.glob(os.path.join(step_dir, '*', '*_depth.png')), step_dir


def test_rerun_skips_already_scored_checkpoints(model_dir):
  """Idempotent eval-job restart (reference task_manager.py:157-164):
  checkpoints already present in scores.csv are not re-evaluated."""
  from se3ds_tpu.utils import task_manager
  mgr = task_manager.TaskManagerWithCsvResults(
      model_dir, score_file='scores_val_seen.csv')
  remaining = list(mgr.unevaluated_checkpoints(
      timeout=1, num_batched_steps=1, eval_every_steps=2,
      poll_interval=0.2))
  assert remaining == [], remaining
