"""Unit tests for the eval-metric protocol pieces (reference
utils/eval_metric.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from se3ds_tpu.eval import metrics


def test_augment_roll_is_per_batch_flip_is_per_image():
  """Reference augment (indoor_datasets.py:34-61): one scalar roll for
  the whole batch, an independent flip per image."""
  n, h, w = 8, 16, 32
  rng = np.random.RandomState(0)
  images = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))

  # Find a key under which not all per-image flips agree.
  for seed in range(20):
    key = jax.random.PRNGKey(seed)
    _, k2 = jax.random.split(key)
    flips = np.asarray(jax.random.bernoulli(k2, shape=(n,)))
    if 0 < flips.sum() < n:
      break
  else:
    raise AssertionError('no mixed-flip key found')

  out = np.asarray(metrics._augment_crop_for_inception(images, key))
  # Recompute the expected transform with the same key.
  k1, k2 = jax.random.split(key)
  roll = int(jax.random.randint(k1, (), -w // 2, w // 2))
  rolled = np.roll(np.asarray(images), roll, axis=2)
  flips = np.asarray(jax.random.bernoulli(k2, shape=(n,)))
  expected = np.where(flips[:, None, None, None], rolled[:, :, ::-1, :],
                      rolled)
  # Pole crop drops the top/bottom 12.5% (crop_pano).
  crop = h // 8
  expected = expected[:, crop:h - crop]
  np.testing.assert_allclose(out, expected, rtol=0, atol=0)
  # The augment genuinely differs between images (flip mix).
  assert 0 < flips.sum() < n


def test_rollout_default_splat_is_exact():
  """FID-parity eval must use exact reference winner selection by
  default (min-depth + 0.1 m window + per-channel max,
  point_cloud_utils.py:157-176) — i.e. splat_mode='sorted'."""
  import inspect
  sig = inspect.signature(metrics.rollout_generated)
  assert sig.parameters['splat_mode'].default == 'sorted'
  sig = inspect.signature(metrics.EvalMetric.__init__)
  assert sig.parameters['splat_mode'].default == 'sorted'
  assert sig.parameters['avg_num'].default == 3
