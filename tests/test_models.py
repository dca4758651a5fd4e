"""Model-level tests (shapes/ranges/contracts), mirroring the reference
image_models_test.py matrix at tiny dims."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3ds_tpu.models import discriminator, generator


def _gen_inputs(rng, batch=1, size=64):
  k1, k2, k3 = jax.random.split(rng, 3)
  return {
      'proj_image': jax.random.uniform(k1, (batch, size, size * 2, 3)),
      'proj_depth': jax.random.uniform(k2, (batch, size, size * 2, 1)),
      'proj_mask': (jax.random.uniform(k3, (batch, size, size * 2, 1)) > 0.5
                    ).astype(jnp.float32),
      'blurred_mask': jnp.zeros((batch, size, size * 2, 1)),
  }


@pytest.mark.parametrize('resnet_version', ['tiny', '50'])
@pytest.mark.parametrize('context_layer', ['convs', 'none'])
def test_generator_output_contract(resnet_version, context_layer):
  rng = jax.random.PRNGKey(0)
  size = 32
  model = generator.ResNetGenerator(
      image_size=size, gen_dims=4, z_dim=4, resnet_version=resnet_version,
      context_layer=context_layer)
  cond = _gen_inputs(rng, batch=1, size=size)
  variables = model.init(rng, cond, train=False)
  outputs = model.apply(variables, cond, train=False)
  assert len(outputs) == 7
  mu, logvar, kld, depth_out, seg_out, depth_seg_out, rgb_out = outputs
  assert rgb_out.shape == (1, size, size * 2, 3)
  assert depth_out.shape == (1, size, size * 2, 1)
  assert seg_out.shape[-1] == 42
  assert float(jnp.min(rgb_out)) >= 0.0 and float(jnp.max(rgb_out)) <= 1.0
  assert float(jnp.min(depth_out)) >= 0.0 and float(jnp.max(depth_out)) <= 1.0
  # Vestigial VAE outputs must be zeros (reference contract).
  assert float(jnp.sum(jnp.abs(mu))) == 0.0
  assert float(jnp.sum(jnp.abs(kld))) == 0.0


def test_generator_train_mode_mutates_stats():
  rng = jax.random.PRNGKey(1)
  size = 32
  model = generator.ResNetGenerator(image_size=size, gen_dims=4, z_dim=4,
                                    resnet_version='tiny')
  cond = _gen_inputs(rng, batch=2, size=size)
  variables = model.init(rng, cond, train=False)
  outputs, mutated = model.apply(
      variables, cond, train=True, mutable=['batch_stats', 'spectral'])
  assert 'batch_stats' in mutated and 'spectral' in mutated


def test_discriminator_list_of_lists_contract():
  rng = jax.random.PRNGKey(2)
  x = jax.random.uniform(rng, (2, 32, 64, 4))
  model = discriminator.SNMultiScaleDiscriminator(
      n_dis=2, dis_dims=4, n_layers=4)
  variables = model.init(rng, x)
  out = model.apply(variables, x)
  assert isinstance(out, list) and len(out) == 2
  for sub in out:
    assert isinstance(sub, list)
    # n_layers conv groups + final logit layer.
    assert len(sub) == 5
    assert sub[-1].shape[-1] == 1
  # Second discriminator sees a 2x downsampled pyramid level.
  assert out[1][0].shape[1] <= out[0][0].shape[1]


def test_generator_use_blurred_mask_changes_input_dim():
  rng = jax.random.PRNGKey(3)
  size = 32
  cond = _gen_inputs(rng, batch=1, size=size)
  m1 = generator.ResNetGenerator(image_size=size, gen_dims=4, z_dim=4,
                                 use_blurred_mask=True)
  m2 = generator.ResNetGenerator(image_size=size, gen_dims=4, z_dim=4,
                                 use_blurred_mask=False)
  v1 = m1.init(rng, cond, train=False)
  v2 = m2.init(rng, cond, train=False)
  k1 = v1['params']['encoder']['conv1']['kernel']
  k2 = v2['params']['encoder']['conv1']['kernel']
  assert k1.shape[2] == 5 and k2.shape[2] == 4
