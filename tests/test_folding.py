"""Spectral-norm folding: folded model == live model, bitwise (eval)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3ds_tpu.models import folding
from se3ds_tpu.models import generator as gen_lib


def _cond(h, w):
  return {
      'proj_image': jnp.linspace(0, 1, h * w * 3).reshape(1, h, w, 3),
      'proj_depth': jnp.linspace(0.1, 0.9, h * w).reshape(1, h, w, 1),
      'proj_mask': jnp.asarray(
          (np.random.RandomState(0).rand(1, h, w, 1) > 0.3)
          .astype(np.float32)),
      'blurred_mask': jnp.zeros((1, h, w, 1)),
  }


def test_folded_generator_bitwise_equal():
  size = 32
  cond = _cond(size, size * 2)
  live = gen_lib.ResNetGenerator(image_size=size, gen_dims=4, z_dim=4,
                                 resnet_version='tiny')
  variables = live.init(jax.random.PRNGKey(0), cond, train=False)
  ref = live.apply(variables, cond, train=False)

  folded_vars = folding.fold_spectral_variables(live, variables, cond)
  assert 'spectral' not in folded_vars
  folded = gen_lib.ResNetGenerator(image_size=size, gen_dims=4, z_dim=4,
                                   resnet_version='tiny',
                                   spectral_fold=True)
  out = folded.apply(folded_vars, cond, train=False)
  for a, b in zip(ref, out):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_folded_generator_rejects_train():
  size = 32
  cond = _cond(size, size * 2)
  folded = gen_lib.ResNetGenerator(image_size=size, gen_dims=4, z_dim=4,
                                   resnet_version='tiny',
                                   spectral_fold=True)
  v = folded.init(jax.random.PRNGKey(0), cond, train=False)
  with pytest.raises(AssertionError):
    folded.apply(v, cond, train=True, mutable=['batch_stats'])
