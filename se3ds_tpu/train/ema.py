"""Exponential-moving-average helpers (reference utils/ema.py).

Under GSPMD the params are replicated and updated once globally, so the
reference's cross-replica MEAN reduction + per-variable strategy.update
(ema.py:31-51) degenerate to plain tree ops; these helpers are the
functional equivalents used by the train step (train/state.py:update_ema).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assign_ema_vars_from_initial_values(ema_tree, value_tree):
  """ema := value (reference ema.py:25-51)."""
  return jax.tree_util.tree_map(lambda _, v: jnp.asarray(v), ema_tree,
                                value_tree)


def update_ema_variables(ema_tree, value_tree, ema_decay: float):
  """ema := ema - (1 - decay) * (ema - value) (reference ema.py:54-88)."""
  one_minus_decay = 1.0 - ema_decay

  def _update(ema, value):
    return ema - (ema - value) * one_minus_decay

  return jax.tree_util.tree_map(_update, ema_tree, value_tree)
