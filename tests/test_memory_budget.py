"""Executable HBM-budget proof for the production training config.

Turns PERF.md's "19 GB state / ZeRO-1 fits v5e-8" arithmetic into a
check: the FULL lowres-recipe train state (gen_dims=128 ResNet-101 G,
dis_dims=128 n_dis=2 n_layers=6 D, EMA, two Adam chains — the 17 GB
released-checkpoint bundle, reference README.md:33) is built abstractly
with jax.eval_shape, the repo's actual ZeRO-1 sharding annotations
(parallel/mesh.train_state_shardings) are applied over an 8-device mesh,
and per-chip resident bytes are computed from NamedSharding.shard_shape.
No parameter memory is allocated.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3ds_tpu.models import discriminator as disc_lib
from se3ds_tpu.models import generator as gen_lib
from se3ds_tpu.parallel import mesh as mesh_lib
from se3ds_tpu.train import state as state_lib

V5E_HBM_BYTES = 16 * 1024**3
# Measured inference/training activation envelope at 128x256 (PERF.md);
# generous margin for the train step's live activation set.
ACTIVATION_MARGIN_BYTES = 4 * 1024**3


def _abstract_production_state():
  size = 128
  h, w = size, size * 2
  generator = gen_lib.ResNetGenerator(image_size=size, gen_dims=128,
                                      resnet_version='101')
  discriminator = disc_lib.SNMultiScaleDiscriminator(dis_dims=128, n_dis=2,
                                                     n_layers=6)
  g_tx, d_tx = state_lib.make_optimizers(1e-4, 4e-4, 0.5, 0.999)
  cond = {
      'proj_image': jnp.zeros((1, h, w, 3)),
      'proj_depth': jnp.zeros((1, h, w, 1)),
      'proj_mask': jnp.ones((1, h, w, 1)),
      'blurred_mask': jnp.zeros((1, h, w, 1)),
  }
  disc_in = jnp.zeros((2, h, w, 4))
  return jax.eval_shape(
      functools.partial(state_lib.create_train_state, generator=generator,
                        discriminator=discriminator, g_tx=g_tx, d_tx=d_tx),
      jax.random.PRNGKey(0), sample_cond=cond,
      sample_disc_input=disc_in)


@pytest.fixture(scope='module')
def abstract_state():
  return _abstract_production_state()


def _tree_bytes(tree):
  return sum(int(np.prod(l.shape)) * l.dtype.itemsize
             for l in jax.tree_util.tree_leaves(tree))


def test_full_state_exceeds_single_chip(abstract_state):
  """The unsharded production bundle cannot live on one v5e — this is
  WHY the ZeRO-1 annotation exists (PERF.md 'Memory limits')."""
  total = _tree_bytes(abstract_state)
  # ~19 GB: G ~1.1B params f32 + EMA + D + two Adam chains.
  assert total > V5E_HBM_BYTES - ACTIVATION_MARGIN_BYTES, (
      f'state unexpectedly small: {total / 1e9:.1f} GB')


def test_zero1_sharded_state_fits_v5e8(abstract_state):
  """With the repo's ZeRO-1 shardings over an 8-device data axis, the
  per-chip resident state fits HBM with activation headroom."""
  mesh = mesh_lib.create_mesh(num_data=8, num_spatial=1,
                              devices=jax.devices()[:8])
  shardings = mesh_lib.train_state_shardings(abstract_state, mesh,
                                             shard_opt_state=True)

  per_chip = 0
  sharded_leaves = 0
  for leaf, sharding in zip(jax.tree_util.tree_leaves(abstract_state),
                            jax.tree_util.tree_leaves(
                                shardings,
                                is_leaf=lambda x: hasattr(x, 'shard_shape'))):
    local_shape = sharding.shard_shape(tuple(leaf.shape))
    if tuple(local_shape) != tuple(leaf.shape):
      sharded_leaves += 1
    per_chip += int(np.prod(local_shape)) * leaf.dtype.itemsize

  assert sharded_leaves > 0, 'ZeRO-1 annotation sharded nothing'
  budget = V5E_HBM_BYTES - ACTIVATION_MARGIN_BYTES
  assert per_chip <= budget, (
      f'per-chip state {per_chip / 1e9:.2f} GB exceeds '
      f'{budget / 1e9:.2f} GB budget')
  total = _tree_bytes(abstract_state)
  # ZeRO-1 must actually cut the footprint vs replication.
  assert per_chip < total * 0.75, (per_chip, total)
