"""InceptionV3 feature extractor in Flax, for on-device FID pooling.

Architecture matches `tf.keras.applications.InceptionV3` (the model the
reference evaluates FID with, utils/inception_utils.py:42-63): conv+BN
(scale=False)+relu units, mixed0..mixed10 inception blocks, global average
pool ("avg_pool" output, 2048-d) and a 1000-way softmax head
("predictions").

Weights: `load_keras_weights(h5_path)` converts the Keras ImageNet bundle
when one is available on disk (this container has no egress, so none is
bundled); otherwise `init_variables(rng)` gives a *deterministic random*
extractor. Random-feature FID is still a consistent relative metric for
continuous eval; absolute parity with the paper's numbers requires the
ImageNet weights, converted once via the loader.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

log = logging.getLogger('se3ds_tpu')

POOL_DIM = 2048
NUM_CLASSES = 1000

# Inception V1 frozen-graph tensor endpoints (reference
# inception_utils.py:27-29); used by load_frozen_graph_v1 below.
INCEPTION_V1_INPUT = 'Mul:0'
INCEPTION_V1_OUTPUT = 'logits:0'
INCEPTION_V1_FINAL_POOL = 'pool_3:0'

_RANDOM_WEIGHTS_WARNING = (
    'InceptionV3 is running with DETERMINISTIC RANDOM weights: FID/IS '
    'values are a consistent RELATIVE metric only and are NOT comparable '
    'to the paper or the reference pipeline. For absolute FID, convert '
    'the ImageNet Keras bundle once with scripts/convert_inception.py '
    'and pass its path via the inception_model.checkpoint_path gin '
    'binding.')


class ConvBN(nn.Module):
  """conv2d_bn: Conv (no bias) + BatchNorm(scale=False) + ReLU."""
  features: int
  kernel: Tuple[int, int]
  strides: Tuple[int, int] = (1, 1)
  padding: str = 'SAME'

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.features, self.kernel, strides=self.strides,
                padding=self.padding, use_bias=False,
                kernel_init=nn.initializers.glorot_uniform(),
                name='conv')(x)
    x = nn.BatchNorm(use_running_average=True, use_scale=False,
                     epsilon=1e-3, name='bn')(x)
    return nn.relu(x)


def _avg_pool_same(x):
  """3x3 stride-1 SAME average pool with TF count-exclude-padding."""
  summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 1, 1, 1), 'SAME')
  counts = jax.lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
                                 (1, 3, 3, 1), (1, 1, 1, 1), 'SAME')
  return summed / counts


def _max_pool_3x3_s2(x):
  return nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')


class InceptionV3(nn.Module):
  """Returns (avg_pool [N,2048], predictions [N,1000] softmax)."""

  @nn.compact
  def __call__(self, x):
    cb = lambda f, k, name, **kw: ConvBN(f, k, name=name, **kw)
    x = cb(32, (3, 3), 'conv0', strides=(2, 2), padding='VALID')(x)
    x = cb(32, (3, 3), 'conv1', padding='VALID')(x)
    x = cb(64, (3, 3), 'conv2')(x)
    x = _max_pool_3x3_s2(x)
    x = cb(80, (1, 1), 'conv3', padding='VALID')(x)
    x = cb(192, (3, 3), 'conv4', padding='VALID')(x)
    x = _max_pool_3x3_s2(x)

    # mixed 0..2 (35x35).
    for i, pool_f in enumerate([32, 64, 64]):
      b1 = cb(64, (1, 1), f'mixed{i}_b1x1')(x)
      b5 = cb(48, (1, 1), f'mixed{i}_b5a')(x)
      b5 = cb(64, (5, 5), f'mixed{i}_b5b')(b5)
      b3 = cb(64, (1, 1), f'mixed{i}_b3a')(x)
      b3 = cb(96, (3, 3), f'mixed{i}_b3b')(b3)
      b3 = cb(96, (3, 3), f'mixed{i}_b3c')(b3)
      bp = _avg_pool_same(x)
      bp = cb(pool_f, (1, 1), f'mixed{i}_bp')(bp)
      x = jnp.concatenate([b1, b5, b3, bp], axis=-1)

    # mixed 3 (17x17 reduction).
    b3 = cb(384, (3, 3), 'mixed3_b3', strides=(2, 2), padding='VALID')(x)
    bd = cb(64, (1, 1), 'mixed3_bda')(x)
    bd = cb(96, (3, 3), 'mixed3_bdb')(bd)
    bd = cb(96, (3, 3), 'mixed3_bdc', strides=(2, 2), padding='VALID')(bd)
    x = jnp.concatenate([b3, bd, _max_pool_3x3_s2(x)], axis=-1)

    # mixed 4..7 (17x17).
    for i, f in zip(range(4, 8), [128, 160, 160, 192]):
      b1 = cb(192, (1, 1), f'mixed{i}_b1x1')(x)
      b7 = cb(f, (1, 1), f'mixed{i}_b7a')(x)
      b7 = cb(f, (1, 7), f'mixed{i}_b7b')(b7)
      b7 = cb(192, (7, 1), f'mixed{i}_b7c')(b7)
      bd = cb(f, (1, 1), f'mixed{i}_bda')(x)
      bd = cb(f, (7, 1), f'mixed{i}_bdb')(bd)
      bd = cb(f, (1, 7), f'mixed{i}_bdc')(bd)
      bd = cb(f, (7, 1), f'mixed{i}_bdd')(bd)
      bd = cb(192, (1, 7), f'mixed{i}_bde')(bd)
      bp = _avg_pool_same(x)
      bp = cb(192, (1, 1), f'mixed{i}_bp')(bp)
      x = jnp.concatenate([b1, b7, bd, bp], axis=-1)

    # mixed 8 (8x8 reduction).
    b3 = cb(192, (1, 1), 'mixed8_b3a')(x)
    b3 = cb(320, (3, 3), 'mixed8_b3b', strides=(2, 2), padding='VALID')(b3)
    b7 = cb(192, (1, 1), 'mixed8_b7a')(x)
    b7 = cb(192, (1, 7), 'mixed8_b7b')(b7)
    b7 = cb(192, (7, 1), 'mixed8_b7c')(b7)
    b7 = cb(192, (3, 3), 'mixed8_b7d', strides=(2, 2), padding='VALID')(b7)
    x = jnp.concatenate([b3, b7, _max_pool_3x3_s2(x)], axis=-1)

    # mixed 9..10 (8x8).
    for i in (9, 10):
      b1 = cb(320, (1, 1), f'mixed{i}_b1x1')(x)
      b3 = cb(384, (1, 1), f'mixed{i}_b3a')(x)
      b3a = cb(384, (1, 3), f'mixed{i}_b3b1')(b3)
      b3b = cb(384, (3, 1), f'mixed{i}_b3b2')(b3)
      b3 = jnp.concatenate([b3a, b3b], axis=-1)
      bd = cb(448, (1, 1), f'mixed{i}_bda')(x)
      bd = cb(384, (3, 3), f'mixed{i}_bdb')(bd)
      bda = cb(384, (1, 3), f'mixed{i}_bdc1')(bd)
      bdb = cb(384, (3, 1), f'mixed{i}_bdc2')(bd)
      bd = jnp.concatenate([bda, bdb], axis=-1)
      bp = _avg_pool_same(x)
      bp = cb(192, (1, 1), f'mixed{i}_bp')(bp)
      x = jnp.concatenate([b1, b3, bd, bp], axis=-1)

    pool = jnp.mean(x, axis=(1, 2))  # avg_pool, 2048-d
    logits = nn.Dense(NUM_CLASSES, name='predictions')(pool)
    return pool, nn.softmax(logits)


def init_variables(rng: Optional[jax.Array] = None):
  """Deterministic random-weight variables (no ImageNet weights on disk)."""
  log.warning(_RANDOM_WEIGHTS_WARNING)
  rng = rng if rng is not None else jax.random.PRNGKey(42)
  model = InceptionV3()
  return model.init(rng, jnp.zeros((1, 299, 299, 3)))


@functools.partial(jax.jit, static_argnames=())
def _forward(variables, images):
  return InceptionV3().apply(variables, images)


def get_inception(images: jnp.ndarray, variables,
                  re_normalize: bool = True):
  """Resize to 299 + renorm [0,1]->[-1,1] + forward
  (reference inception_utils.py:117-138)."""
  if images.shape[1] != 299 or images.shape[2] != 299:
    images = jax.image.resize(
        images, (images.shape[0], 299, 299, images.shape[3]), 'linear')
  if re_normalize:
    images = jnp.clip(images * 2 - 1.0, -1.0, 1.0)
  return _forward(variables, images)


def inception_model(version: str = 'V3',
                    checkpoint_path: Optional[str] = None):
  """Returns InceptionV3 variables (gin surface parity with reference
  inception_utils.inception_model, inception_utils.py:97-112).

  checkpoint_path: a Keras .h5 weights file (converted via
  load_keras_weights) or an Orbax directory of previously-converted
  variables. None -> deterministic random extractor (no egress here).
  """
  if version != 'V3':
    raise ValueError(f'{version} is not valid input.')
  if checkpoint_path:
    if checkpoint_path.endswith('.h5'):
      return load_keras_weights(checkpoint_path)
    import orbax.checkpoint as ocp
    import os as _os
    return ocp.StandardCheckpointer().restore(
        _os.path.abspath(checkpoint_path))
  return init_variables()


def conv_module_order():
  """ConvBN module names in graph order, matching the creation order of
  conv2d_<k>/batch_normalization_<k> layers in Keras InceptionV3."""
  names = ['conv0', 'conv1', 'conv2', 'conv3', 'conv4']
  for i in range(3):  # mixed 0..2
    names += [f'mixed{i}_b1x1', f'mixed{i}_b5a', f'mixed{i}_b5b',
              f'mixed{i}_b3a', f'mixed{i}_b3b', f'mixed{i}_b3c',
              f'mixed{i}_bp']
  names += ['mixed3_b3', 'mixed3_bda', 'mixed3_bdb', 'mixed3_bdc']
  for i in range(4, 8):
    names += [f'mixed{i}_b1x1', f'mixed{i}_b7a', f'mixed{i}_b7b',
              f'mixed{i}_b7c', f'mixed{i}_bda', f'mixed{i}_bdb',
              f'mixed{i}_bdc', f'mixed{i}_bdd', f'mixed{i}_bde',
              f'mixed{i}_bp']
  names += ['mixed8_b3a', 'mixed8_b3b', 'mixed8_b7a', 'mixed8_b7b',
            'mixed8_b7c', 'mixed8_b7d']
  for i in (9, 10):
    names += [f'mixed{i}_b1x1', f'mixed{i}_b3a', f'mixed{i}_b3b1',
              f'mixed{i}_b3b2', f'mixed{i}_bda', f'mixed{i}_bdb',
              f'mixed{i}_bdc1', f'mixed{i}_bdc2', f'mixed{i}_bp']
  return names


def load_keras_weights(h5_path: str):
  """Converts a Keras InceptionV3 weights .h5 (e.g. the released ImageNet
  bundle `inception_v3_weights_tf_dim_ordering_tf_kernels.h5`, or any
  tf_keras `save_weights` file) into this module's variable tree.

  Mapping is by creation order: Keras autonames conv2d[_k] /
  batch_normalization[_k] in graph order, which matches
  `conv_module_order()` (validated numerically in tests against a live
  Keras model).
  """
  import h5py

  def keras_index(name: str, stem: str) -> int:
    rest = name[len(stem):]
    return int(rest[1:]) if rest.startswith('_') else 0

  weights: dict = {}
  with h5py.File(h5_path, 'r') as f:
    root = f['model_weights'] if 'model_weights' in f else f

    def visit(name, obj):
      if isinstance(obj, h5py.Dataset):
        weights[name] = np.asarray(obj)

    root.visititems(visit)

  def find(layer: str, leaf: str):
    for name, arr in weights.items():
      parts = name.split('/')
      if layer in parts and parts[-1].split(':')[0] == leaf:
        return arr
    raise KeyError(f'{layer}/{leaf} not found in h5')

  conv_layers = sorted(
      {n.split('/')[0] for n in weights
       if n.split('/')[0].startswith('conv2d')},
      key=lambda s: keras_index(s, 'conv2d'))
  bn_layers = sorted(
      {n.split('/')[0] for n in weights
       if n.split('/')[0].startswith('batch_normalization')},
      key=lambda s: keras_index(s, 'batch_normalization'))
  order = conv_module_order()
  if len(conv_layers) != len(order) or len(bn_layers) != len(order):
    raise ValueError(
        f'Expected {len(order)} conv/bn layers, found {len(conv_layers)}/'
        f'{len(bn_layers)}')

  params: dict = {}
  batch_stats: dict = {}
  for module, conv_name, bn_name in zip(order, conv_layers, bn_layers):
    params[module] = {
        'conv': {'kernel': find(conv_name, 'kernel')},
        'bn': {'bias': find(bn_name, 'beta')},
    }
    batch_stats[module] = {
        'bn': {'mean': find(bn_name, 'moving_mean'),
               'var': find(bn_name, 'moving_variance')},
    }
  params['predictions'] = {
      'kernel': find('predictions', 'kernel'),
      'bias': find('predictions', 'bias'),
  }
  return {'params': params, 'batch_stats': batch_stats}


def load_frozen_graph_v1(pb_path: str):
  """Inception V1 frozen-graph (.pb) loader — surface parity with the
  reference's `_InceptionLayer`/`_inception_model_v1`
  (inception_utils.py:66-94).

  Like the reference (whose public `inception_model` only dispatches
  'V3', inception_utils.py:97-115, so V1 is dead surface there too),
  this is an auxiliary loader rather than a product-path dependency: it
  imports TensorFlow lazily (conversion/eval-compat only per CLAUDE.md)
  and returns a host-side callable `images -> (pool_3 features, softmax
  predictions)` pruned at the reference's tensor endpoints
  (Mul:0 -> [pool_3:0, logits:0], inception_utils.py:27-29,82-84).
  """
  import tensorflow as tf  # test/conversion-time only

  with tf.io.gfile.GFile(pb_path, 'rb') as f:
    graph_def = tf.compat.v1.GraphDef.FromString(f.read())

  def import_graph():
    tf.compat.v1.import_graph_def(graph_def, name='')

  wrapped = tf.compat.v1.wrap_function(import_graph, signature=[])
  call_fn = wrapped.prune(INCEPTION_V1_INPUT,
                          [INCEPTION_V1_FINAL_POOL, INCEPTION_V1_OUTPUT])

  def forward(images):
    pools, logits = call_fn(tf.convert_to_tensor(images))
    preds = tf.nn.softmax(logits)
    return np.squeeze(np.asarray(pools)), np.asarray(preds)

  return forward
