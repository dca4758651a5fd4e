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


def test_rollout_default_reproduces_exact_guidance_behaviorally():
  """Behavioral pin of the eval default (VERDICT r4 weak #4): on a
  collision-heavy scene where exact and 'fast' winner selection DIFFER,
  the default rollout must reproduce the exact ('scatter') guidance
  bitwise. Fails if anyone swaps the default to a non-exact mode, even
  one that keeps the same signature default string."""
  from se3ds_tpu import constants

  n, t, h, w = 1, 3, 64, 128
  depth_scale = 10.0
  rng = np.random.RandomState(0)

  # Smooth multi-surface depth; random RGB so colliding points carry
  # uncorrelated colors (maximises exact-vs-fast disagreement).
  yy, xx = np.meshgrid(np.linspace(0, np.pi, h),
                       np.linspace(0, 2 * np.pi, w), indexing='ij')
  base = np.clip((2.0 + 0.6 * np.sin(3 * xx) + 0.4 * np.cos(2 * yy))
                 / depth_scale, 0.05, 0.9).astype(np.float32)
  batch = {
      'image': jnp.asarray(rng.rand(n, t, h, w, 3).astype(np.float32)),
      'depth': jnp.asarray(np.broadcast_to(
          base[None, None, ..., None], (n, t, h, w, 1)).copy()),
      'position': jnp.asarray(
          rng.uniform(-0.05, 0.05, (n, t, 4)).astype(np.float32)),
  }

  # Stub generator: random-ish RGB from the guidance, and a predicted
  # depth 0.08 m inside frame 0's surface — every re-observed pixel's
  # 0.1 m collision window holds points from BOTH frames.
  def stub_apply(variables, inputs):
    del variables
    generated = jnp.clip(
        inputs['prev_image'] * 0.7 + inputs['proj_image'] * 0.29 + 0.007,
        0.0, 1.0)
    depth_out = jnp.clip(inputs['proj_depth'] * 0.0
                         + jnp.asarray(base)[None, ..., None]
                         + 0.08 / depth_scale, 0.0, 1.0)
    return [None, None, None, depth_out, None, None, generated]

  def run(**kw):
    gen, rmse, aux = metrics.rollout_generated(
        stub_apply, None, batch, eval_seq_len=t, depth_scale=depth_scale,
        **kw)
    return ([np.asarray(aux['projected'][i]) for i in range(t)],
            [np.asarray(gen[i]) for i in range(t)])

  proj_def, gen_def = run()
  proj_exact, gen_exact = run(splat_mode='scatter')
  proj_fast, _ = run(splat_mode='fast')

  # The scene genuinely discriminates exact from 'fast' guidance...
  assert any(not np.array_equal(a, b)
             for a, b in zip(proj_exact, proj_fast))
  # ...and the DEFAULT reproduces the exact guidance and outputs bitwise.
  for a, b in zip(proj_def, proj_exact):
    np.testing.assert_array_equal(a, b)
  for a, b in zip(gen_def, gen_exact):
    np.testing.assert_array_equal(a, b)
  del constants
