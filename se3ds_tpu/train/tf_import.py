"""Imports reference TF checkpoints into the Flax generator.

Maps the reference `tf.train.Checkpoint(ema_generator=...)` object-graph
keys (the format of the released mp3d/re10k bundles, reference
models/models.py:100-104) onto this framework's variable tree. The path
grammar was derived by instantiating the reference model under TF and
inspecting its saved object graph (see scripts/test_tf_parity.py, which
also verifies numerical parity of the converted weights end-to-end).

Layout conversions:
* Conv kernels: TF HWIO == Flax HWIO (no change).
* Conv2DTranspose kernels: Keras stores HWOI and computes
  conv2d_backprop_input; Flax `nn.ConvTranspose` (transpose_kernel=False)
  expects HWIO with spatially *flipped* taps relative to Keras. We
  transpose (0,1,3,2) and flip both spatial axes.
* BatchNorm: gamma/beta/moving_mean/moving_variance ->
  scale/bias/mean/var.
* Spectral-norm `u` vectors: stored under autonumbered attribute names
  (`spectral_conv_<k>_u`); matched by layer prefix + `_u` suffix.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np

ATTR_SUFFIX = '/.ATTRIBUTES/VARIABLE_VALUE'

_BN_LEAF = {'scale': 'gamma', 'bias': 'beta', 'mean': 'moving_mean',
            'var': 'moving_variance'}

# Output-head / context stacks: my bnK/convK naming -> Sequential index.
_HEAD_RE = re.compile(r'^(rgb_conv|depth_conv|global_context)/'
                      r'(bn|conv)(\d+)(/.*)?$')


def _map_head(path: str) -> str:
  m = _HEAD_RE.match(path)
  assert m
  stack, kind, idx, rest = m.group(1), m.group(2), int(m.group(3)), (
      m.group(4) or '')
  tf_stack = ('global_context_layer' if stack == 'global_context' else stack)
  lww = 2 * idx if kind == 'bn' else 2 * idx + 1
  if kind == 'bn' and rest == '/bn':
    rest = ''  # strip the flax SyncBatchNorm child module name
  return f'{tf_stack}/layer_with_weights-{lww}{rest}'


def flax_path_to_tf_prefix(path: str) -> str:
  """Maps a flax module path (no collection, no leaf) to the TF object
  path prefix under `ema_generator/`."""
  # Output heads and global context first (their own grammar).
  if _HEAD_RE.match(path):
    path = _map_head(path)

  # ResStack blocks: stackN/blockI -> stackN/blocks/I
  path = re.sub(r'/(stack\d)/block(\d+)/', r'/\1/blocks/\2/', '/' + path)[1:]
  path = re.sub(r'^(stack\d)/block(\d+)/', r'\1/blocks/\2/', path)

  # Transposed stacks: deconvN/blockI -> deconvN/block/layer_with_weights-I
  path = re.sub(r'(deconv\d|final_conv)/block(\d+)/',
                r'\1/block/layer_with_weights-\2/', path)

  # TransBasicBlock internals.
  path = path.replace('/main_conv1', '/main/layer_with_weights-0')
  path = path.replace('/main_bn1/bn', '/main/layer_with_weights-1')
  path = path.replace('/main_conv2',
                      '/main/layer_with_weights-2/layer_with_weights-0')
  path = path.replace('/main_convt/convt', '/main/layer_with_weights-2')
  path = path.replace('/main_bn2/bn', '/main/layer_with_weights-3')
  path = path.replace('/up_convt/convt', '/upsample/layer_with_weights-0')
  path = path.replace('/up_conv', '/upsample/layer_with_weights-0')
  path = path.replace('/up_bn/bn', '/upsample/layer_with_weights-1')

  # Bottleneck norms (act1/act2 are Sequential[BN, ReLU]; act3/ds_norm are
  # bare BN layers).
  path = path.replace('/act1_bn/bn', '/act1/layer_with_weights-0')
  path = path.replace('/act2_bn/bn', '/act2/layer_with_weights-0')
  path = path.replace('/act3_bn/bn', '/act3')
  path = path.replace('/ds_norm/bn', '/ds_norm')

  # Encoder stem/final.
  path = path.replace('encoder/final_bn/bn',
                      'encoder/final_act/layer_with_weights-0')

  # Decoder upc/agents/final deconv.
  path = path.replace('/upc_conv', '/upc/layer_with_weights-0')
  path = path.replace('/upc_bn/bn', '/upc/layer_with_weights-1')
  path = re.sub(r'/agent(\d)_bn/bn', r'/agent\1_act/layer_with_weights-0',
                path)
  path = path.replace('/final_deconv/convt', '/final_deconv')
  return path


def _is_transpose_conv(path: str) -> bool:
  return 'convt' in path or path.endswith('final_deconv/convt')


_DIS_RE = re.compile(r'^dis(\d+)/(.*)$')


def discriminator_path_map(n_layers: int):
  """Path mapper for SNMultiScaleDiscriminator checkpoints.

  Reference layout (verified empirically): `discriminators/<d>/
  discriminator_groups/<g>/layer_with_weights-{0,1}` for the conv/
  InstanceNorm of each group, and `discriminator_groups/<n_layers>` for
  the bare final conv layer.
  """

  def map_path(path: str) -> str:
    m = _DIS_RE.match(path)
    if not m:
      return path
    d, rest = m.group(1), m.group(2)
    prefix = f'discriminators/{d}/discriminator_groups'
    cm = re.match(r'^group(\d+)_conv(/.*)?$', rest)
    if cm:
      return f'{prefix}/{cm.group(1)}/layer_with_weights-0{cm.group(2) or ""}'
    nm = re.match(r'^group(\d+)_norm(/.*)?$', rest)
    if nm:
      return f'{prefix}/{nm.group(1)}/layer_with_weights-1{nm.group(2) or ""}'
    fm = re.match(r'^final_conv(/.*)?$', rest)
    if fm:
      return f'{prefix}/{n_layers}{fm.group(1) or ""}'
    return f'discriminators/{d}/{rest}'

  return map_path


def convert_tf_checkpoint(ckpt_path: str, flax_variables: Any,
                          root: str = 'ema_generator',
                          path_map=None) -> Any:
  """Loads a reference TF checkpoint into a flax variable-tree template.

  Args:
    ckpt_path: TF checkpoint prefix (tf.train.load_checkpoint format).
    flax_variables: Template tree {'params':…, 'batch_stats':…,
      'spectral':…} from `model.init` — or from
      `jax.eval_shape(model.init, ...)`: leaves only need `.shape` and
      `.dtype`, so an abstract template keeps conversion memory bounded
      by the CONVERTED branch (the TF reader loads tensors one by one;
      the template itself holds no data). scripts/convert_tf_checkpoint.py
      is the CLI wrapper around this path.
    root: Checkpoint root attribute ('ema_generator' or 'generator').

  Returns:
    Variable tree with all leaves replaced by checkpoint values.

  Raises:
    KeyError if any leaf cannot be resolved.
  """
  import tensorflow as tf  # Conversion-time only.
  reader = tf.train.load_checkpoint(ckpt_path)
  tf_keys = set(reader.get_variable_to_shape_map())

  # Prefix index for u-vector lookup.
  by_prefix: Dict[str, list] = {}
  for k in tf_keys:
    if k.endswith(ATTR_SUFFIX):
      body = k[:-len(ATTR_SUFFIX)]
      if '/' not in body:
        continue  # e.g. save_counter
      prefix, leaf = body.rsplit('/', 1)
      by_prefix.setdefault(prefix, []).append(leaf)

  flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
  errors = []

  def resolve(col: str, module_path: str, leaf: str) -> Optional[str]:
    if path_map is not None:
      tf_module = path_map(module_path)
    else:
      tf_module = flax_path_to_tf_prefix(module_path)
    prefix = f'{root}/{tf_module}'
    if col == 'spectral' and leaf == 'u':
      for cand in by_prefix.get(prefix, []):
        if cand.endswith('_u'):
          return f'{prefix}/{cand}{ATTR_SUFFIX}'
      return None
    if col == 'batch_stats':
      candidates = (_BN_LEAF[leaf],)  # mean/var -> moving_*
    elif leaf in ('gamma', 'beta'):
      candidates = (leaf,)  # InstanceNorm params keep TF names
    elif leaf == 'scale':
      candidates = ('gamma',)
    elif leaf == 'bias':
      # Conv bias stays 'bias'; BN bias is 'beta'. Disambiguate by key
      # existence (a layer never has both).
      candidates = ('bias', 'beta')
    else:
      candidates = (leaf,)
    for cand_leaf in candidates:
      key = f'{prefix}/{cand_leaf}{ATTR_SUFFIX}'
      if key in tf_keys:
        return key
    return None

  values = {}
  for key_path, leaf_val in flat:
    parts = [p.key for p in key_path]
    col, module_parts, leaf = parts[0], parts[1:-1], parts[-1]
    module_path = '/'.join(module_parts)
    # Strip the flax BatchNorm child module name handled inside mapping.
    tf_key = resolve(col, module_path, leaf)
    if tf_key is None:
      errors.append(f'{col}/{module_path}/{leaf}')
      continue
    arr = np.asarray(reader.get_tensor(tf_key))
    if _is_transpose_conv(module_path) and leaf == 'kernel':
      # Keras HWOI -> Flax HWIO with spatial flip.
      arr = np.transpose(arr, (0, 1, 3, 2))[::-1, ::-1]
    # Attribute access (not np.shape/np.asarray) so abstract templates
    # (jax.eval_shape leaves) work without materialising the tree.
    want_shape = tuple(getattr(leaf_val, 'shape', np.shape(leaf_val)))
    if arr.shape != want_shape:
      errors.append(
          f'{col}/{module_path}/{leaf}: shape {arr.shape} vs '
          f'{want_shape} (tf key {tf_key})')
      continue
    want_dtype = getattr(leaf_val, 'dtype', None)
    if want_dtype is None:
      want_dtype = np.asarray(leaf_val).dtype
    values[(col,) + tuple(module_parts) + (leaf,)] = arr.astype(want_dtype)

  if errors:
    raise KeyError(f'{len(errors)} unresolved/mismatched leaves, e.g. '
                   f'{errors[:8]}')

  def rebuild(key_path, leaf_val):
    parts = tuple(p.key for p in key_path)
    return values[parts]

  return jax.tree_util.tree_map_with_path(rebuild, flax_variables)
