"""InceptionV3 tests: output contract + numerical parity of the Keras
weight converter against a live tf_keras model."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3ds_tpu.eval import inception


def test_output_contract():
  v = inception.init_variables(jax.random.PRNGKey(0))
  x = jnp.zeros((2, 64, 128, 3))
  pool, preds = inception.get_inception(x, v)
  assert pool.shape == (2, 2048)
  assert preds.shape == (2, 1000)
  np.testing.assert_allclose(np.asarray(jnp.sum(preds, -1)), 1.0, atol=1e-4)


def test_deterministic_init():
  v1 = inception.init_variables(jax.random.PRNGKey(42))
  v2 = inception.init_variables(jax.random.PRNGKey(42))
  l1 = jax.tree_util.tree_leaves(v1)[0]
  l2 = jax.tree_util.tree_leaves(v2)[0]
  np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.skipif(os.environ.get('SE3DS_SKIP_SLOW') == '1',
                    reason='slow keras parity test')
def test_keras_weight_conversion_parity(tmp_path):
  os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
  tf = pytest.importorskip('tensorflow')
  try:
    keras_model = tf.keras.applications.InceptionV3(
        weights=None, input_shape=(299, 299, 3), include_top=True)
  except Exception as e:  # pragma: no cover
    pytest.skip(f'keras InceptionV3 unavailable: {e}')
  h5 = str(tmp_path / 'iv3.h5')
  keras_model.save_weights(h5)

  variables = inception.load_keras_weights(h5)
  rng = np.random.RandomState(0)
  x = rng.rand(1, 299, 299, 3).astype(np.float32) * 2 - 1

  feats_model = tf.keras.Model(
      inputs=keras_model.input,
      outputs=[keras_model.get_layer('avg_pool').output,
               keras_model.get_layer('predictions').output])
  ref_pool, ref_preds = [np.asarray(o) for o in feats_model(x)]

  pool, preds = inception.get_inception(jnp.asarray(x), variables,
                                        re_normalize=False)
  np.testing.assert_allclose(np.asarray(pool), ref_pool, atol=2e-3)
  np.testing.assert_allclose(np.asarray(preds), ref_preds, atol=2e-3)
