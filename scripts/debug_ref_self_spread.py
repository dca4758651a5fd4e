"""Measures the reference EvalMetric's OWN graph-vs-eager numeric
spread: same weights, same fixture batches, calculate_fid_score run
under tf.function (production) and eagerly. Establishes the reference's
internal numeric envelope for the FID/RMSE protocol.

Run: JAX_PLATFORMS=cpu python scripts/debug_ref_self_spread.py
"""

import os

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

import itertools
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import test_fid_parity as P


def run_eval(tf_gen, batches, seq_len, size):
  import tensorflow as tf
  from se3ds.utils import eval_metric as ref_eval
  ds_iter = itertools.cycle(
      [{k: tf.constant(v) for k, v in b.items()} for b in batches])
  em = ref_eval.EvalMetric(ds=ds_iter, eval_num=4, batch_size=2,
                           strategy=tf.distribute.get_strategy(),
                           avg_num=1, eval_seq_len=seq_len)
  fid, _, rmse = em.calculate_fid_score(tf_gen)
  return ({k: float(v) for k, v in fid.items()},
          {k: float(v) for k, v in rmse.items()})


def main():
  size, seq_len, gen_dims = 64, 3, 4
  batches = P.make_batches(size)

  import tensorflow as tf
  from _ref_tf import import_reference_models
  image_models = import_reference_models()
  from se3ds.utils import eval_metric as ref_eval
  from se3ds.utils import inception_utils as ref_inception

  ref_eval.indoor_datasets.augment = lambda x, **kw: x
  inc = tf.keras.applications.InceptionV3(
      weights=None, input_shape=(299, 299, 3), include_top=True)
  inc_dir = tempfile.mkdtemp()
  tf.train.Checkpoint(inception_v3=inc).save(os.path.join(inc_dir, 'ckpt'))
  orig_model_fn = ref_inception.inception_model
  ref_eval.inception_utils.inception_model = (
      lambda version='V3', checkpoint_path=None: orig_model_fn(
          version, inc_dir))

  tf_gen = image_models.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, z_dim=4, resnet_version='50')
  h, w = size, size * 2
  dummy = {
      'proj_image': tf.zeros((1, h, w, 3)),
      'proj_depth': tf.zeros((1, h, w, 1)),
      'proj_mask': tf.zeros((1, h, w, 1)),
      'blurred_mask': tf.zeros((1, h, w, 1)),
  }
  tf_gen(inputs=[dummy, None], training=False)

  fid_g, rmse_g = run_eval(tf_gen, batches, seq_len, size)
  print('graph:', 'fid', fid_g, 'rmse', rmse_g)
  tf.config.run_functions_eagerly(True)
  fid_e, rmse_e = run_eval(tf_gen, batches, seq_len, size)
  print('eager:', 'fid', fid_e, 'rmse', rmse_e)
  for i in range(1, seq_len):
    fr = abs(fid_g[i] - fid_e[i]) / max(abs(fid_g[i]), 1e-9)
    print(f'frame {i}: FID graph {fid_g[i]:.6f} vs eager {fid_e[i]:.6f} '
          f'(rel {fr:.2e}); RMSE {rmse_g[i]:.8f} vs {rmse_e[i]:.8f} '
          f'(abs {abs(rmse_g[i]-rmse_e[i]):.2e})')


if __name__ == '__main__':
  main()
