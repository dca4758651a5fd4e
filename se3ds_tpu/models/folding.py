"""Load-time spectral-norm folding for inference.

At eval, the power-iteration vector `u` never updates (reference
layers.py:329-330), so each SpectralConv's sigma — and therefore its
normalised kernel — is a CONSTANT. The live path still re-derives
w / sigma over every weight on every forward: for the production
generator (1.1B params f32) that is ~9 GB of pure HBM traffic per frame.

`fold_spectral_variables` performs the division once at load time:

* SpectralConv paths are discovered structurally with
  `nn.intercept_methods` under `jax.eval_shape` (no FLOPs, no device
  memory) — this distinguishes them from PartialConv, whose `u` exists
  but whose kernel must stay RAW (the reference bug we preserve,
  layers.py:193-198 / models/layers.py PartialConv docstring).
* Each discovered kernel is replaced by w/(sigma+eps) computed with
  exactly the math of `layers.spectral_normalize`, in f32 — the folded
  model (generator built with `spectral_fold=True`) then produces
  BITWISE-identical outputs to the live path (tested).
* The 'spectral' collection is dropped: folded modules declare no `u`.

Optionally all conv kernels are pre-cast to the model compute dtype so
the per-forward `astype` reads the small copy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from se3ds_tpu.models import layers


def fold_spectral_variables(model: nn.Module, variables: Any, sample_cond,
                            cast_dtype=None) -> Any:
  """Folds sigma into every SpectralConv kernel; drops 'spectral'.

  Args:
    model: the LIVE model (spectral_fold=False) matching `variables`.
    variables: full variable tree incl. the 'spectral' collection.
    sample_cond: a sample input dict for the abstract discovery forward.
    cast_dtype: optional dtype to pre-cast all conv kernels to (e.g.
      jnp.bfloat16 when the model computes in bf16 — same bits as the
      per-forward astype, done once).

  Returns:
    New variables without the 'spectral' collection, for a model built
    with spectral_fold=True.
  """
  def run(v):
    return model.apply(v, sample_cond, train=False)

  paths = set()

  def interceptor(next_fn, args, kwargs, context):
    if isinstance(context.module, layers.SpectralConv):
      paths.add(tuple(context.module.scope.path))
    return next_fn(*args, **kwargs)

  with nn.intercept_methods(interceptor):
    jax.eval_shape(run, variables)

  from flax.core import unfreeze
  params = unfreeze(jax.tree_util.tree_map(lambda x: x, variables['params']))
  spectral = variables.get('spectral', {})

  def get(tree, path):
    for k in path:
      tree = tree[k]
    return tree

  # The fold math stays EAGER deliberately: bitwise equality with the
  # live path holds at per-primitive compilation granularity; fusing the
  # power-iteration matvecs + divide into one jitted program changes the
  # result bits (measured — tests/test_folding.py catches it). Only a
  # handful of SpectralConv paths exist, so the eager cost is small.
  for path in paths:
    node = get(params, path)
    u = jnp.asarray(get(spectral, path)['u'], jnp.float32)
    kernel = jnp.asarray(node['kernel'], jnp.float32)
    w_flat = kernel.reshape(-1, kernel.shape[-1])
    w_norm, _, _ = layers.spectral_normalize(w_flat, u)
    node['kernel'] = w_norm.reshape(kernel.shape)

  if cast_dtype is not None:
    # The cast pass touches EVERY conv kernel (hundreds of leaves);
    # jitted it is one device program instead of one relay round trip
    # per kernel. dtype casts round deterministically (no fusion risk),
    # so this keeps the bitwise guarantee.
    def cast(path_keys, leaf):
      name = path_keys[-1].key if hasattr(path_keys[-1], 'key') else None
      if name == 'kernel':
        return jnp.asarray(leaf, jnp.float32).astype(cast_dtype)
      return leaf
    params = jax.jit(
        lambda p: jax.tree_util.tree_map_with_path(cast, p))(params)

  out = {k: v for k, v in variables.items() if k != 'spectral'}
  out['params'] = params
  return out
