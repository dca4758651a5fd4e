"""Converts InceptionV3 ImageNet weights to the Flax eval extractor.

One command closes the absolute-FID gap (reference
utils/inception_utils.py:42-63 loads `weights="imagenet"` from the Keras
bundle; this box has no egress, so the bundle must be brought in as a
file):

    python scripts/convert_inception.py \
        --h5 /path/to/inception_v3_weights_tf_dim_ordering_tf_kernels.h5 \
        --out /path/to/inception_v3_flax

Afterwards absolute FID is one gin binding away:

    --gin_bindings="inception_model.checkpoint_path='/path/to/inception_v3_flax'"

The conversion itself (`se3ds_tpu.eval.inception.load_keras_weights`) is
numerically parity-tested against a live Keras model in
tests/test_inception.py.
"""

import argparse
import os

import jax
import numpy as np


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--h5', required=True,
                      help='Keras InceptionV3 weights .h5 file')
  parser.add_argument('--out', required=True,
                      help='Output Orbax checkpoint directory')
  parser.add_argument('--verify', action='store_true',
                      help='Round-trip the saved checkpoint and compare')
  args = parser.parse_args()

  from se3ds_tpu.eval import inception
  import orbax.checkpoint as ocp

  variables = inception.load_keras_weights(args.h5)
  out = os.path.abspath(args.out)
  ocp.StandardCheckpointer().save(out, variables)
  print(f'Saved converted InceptionV3 variables to {out}')

  if args.verify:
    restored = inception.inception_model(checkpoint_path=out)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(restored)):
      assert ka == kb and np.allclose(a, b), ka
    x = np.random.RandomState(0).rand(2, 299, 299, 3).astype('float32')
    pool, preds = inception.get_inception(x, restored)
    assert pool.shape == (2, inception.POOL_DIM)
    assert np.allclose(np.sum(np.asarray(preds), -1), 1.0, atol=1e-4)
    print('Round-trip verification OK.')


if __name__ == '__main__':
  main()
