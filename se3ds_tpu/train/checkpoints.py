"""Orbax checkpointing for SE3DS train state + TF-checkpoint import.

The reference bundles {g_optimizer, d_optimizer, generator, discriminator,
ema_generator, global_step} in one tf.train.Checkpoint
(gan_manager.py:340-346); we persist the analogous `TrainState` pytree
with Orbax. `restore_ema_generator` loads only the EMA generator branch
for inference (reference models.py:100-104).

`import_tf_checkpoint` converts a released TF checkpoint (17 GB MP3D /
RE10K bundles) by reading raw variables with the TF checkpoint reader —
names only, no TF graph — and mapping them onto the Flax param tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

TRAIN_DONE = 'TRAIN_DONE'


def _manager(model_dir: str, max_to_keep: int = 200) -> ocp.CheckpointManager:
  options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                         create=True)
  return ocp.CheckpointManager(os.path.abspath(model_dir), options=options)


class CheckpointManager:
  """Save/restore TrainState with retention, mirroring
  tf.train.CheckpointManager(max_to_keep=200)."""

  def __init__(self, model_dir: str, max_to_keep: int = 200):
    self.model_dir = model_dir
    self._mgr = _manager(model_dir, max_to_keep)

  def save(self, step: int, state) -> None:
    if step in self._mgr.all_steps():
      return  # idempotent: final save may coincide with a periodic save
    self._mgr.save(step, args=ocp.args.StandardSave(state))
    self._mgr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def all_steps(self):
    return sorted(self._mgr.all_steps())

  def restore(self, state, step: Optional[int] = None):
    if step is None:
      step = self._mgr.latest_step()
    if step is None:
      return None
    return self._mgr.restore(step, args=ocp.args.StandardRestore(state))


def save_ema_generator(path: str, variables: Any) -> None:
  """Saves inference variables ({'params':…, 'batch_stats':…,
  'spectral':…}) standalone."""
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.abspath(path), variables)
  ckptr.wait_until_finished()


def restore_ema_generator(path: str, target: Optional[Any] = None) -> Any:
  """Restores inference variables saved by `save_ema_generator`, or the
  EMA branch of a full TrainState checkpoint directory."""
  ckptr = ocp.StandardCheckpointer()
  return ckptr.restore(os.path.abspath(path), target=target)


def mark_training_done(model_dir: str) -> None:
  """Writes the TRAIN_DONE sentinel (reference task_manager.py:66-72)."""
  with open(os.path.join(model_dir, TRAIN_DONE), 'w') as f:
    f.write('')


def is_training_done(model_dir: str) -> bool:
  return os.path.exists(os.path.join(model_dir, TRAIN_DONE))


# --- TF checkpoint import ---------------------------------------------------


def import_tf_checkpoint(ckpt_path: str, flax_variables: Any,
                         name_map_fn=None) -> Any:
  """Maps a reference TF checkpoint onto a Flax variable tree.

  Uses `tf.train.load_checkpoint` (pure reader, no graph). Requires TF at
  conversion time only; the converted Orbax checkpoint is TF-free.

  Args:
    ckpt_path: TF checkpoint prefix.
    flax_variables: Template variable tree (shapes define the mapping).
    name_map_fn: Optional (flax_path_str -> tf_variable_name) override.

  Returns:
    Variable tree with imported values where names resolve; unresolved
    leaves keep template values (and are reported).
  """
  import tensorflow as tf  # Conversion-time only.
  reader = tf.train.load_checkpoint(ckpt_path)
  shape_map = reader.get_variable_to_shape_map()

  flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
  by_shape = {}
  for name, shape in shape_map.items():
    by_shape.setdefault(tuple(shape), []).append(name)

  resolved, unresolved = {}, []
  for path, leaf in flat:
    path_str = '/'.join(str(p.key) if hasattr(p, 'key') else str(p)
                        for p in path)
    tf_name = name_map_fn(path_str) if name_map_fn else None
    if tf_name and tf_name in shape_map:
      resolved[path_str] = reader.get_tensor(tf_name)
    else:
      unresolved.append(path_str)
  if unresolved:
    print(f'[import_tf_checkpoint] {len(unresolved)} unresolved leaves '
          f'(kept template values), e.g. {unresolved[:5]}')

  def rebuild(path, leaf):
    path_str = '/'.join(str(p.key) if hasattr(p, 'key') else str(p)
                        for p in path)
    if path_str in resolved:
      arr = np.asarray(resolved[path_str])
      if arr.shape != leaf.shape:
        raise ValueError(f'{path_str}: {arr.shape} vs {leaf.shape}')
      return arr.astype(leaf.dtype)
    return leaf

  return jax.tree_util.tree_map_with_path(rebuild, flax_variables)
