"""Device-mesh and sharding helpers.

SE3DS training is data-parallel (the reference's only strategy — DP via
tf.distribute, SURVEY §2 rows 24-26), expressed here as GSPMD: a 1-D
`data` mesh axis over ICI, batches sharded on that axis, parameters
replicated. XLA inserts the gradient all-reduces, batch-stat reductions
(sync BN), and eval all-gathers automatically.

A second optional `spatial` axis spatially partitions the panorama height
dimension for high-resolution inference/training; XLA handles the conv
halo exchanges. This is the honest "model parallel" opportunity for a
fully-convolutional GAN (there is no sequence axis to shard).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_data: Optional[int] = None,
                num_spatial: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Creates a (data, spatial) mesh over the available devices."""
  devices = list(devices if devices is not None else jax.devices())
  if num_data is None:
    num_data = len(devices) // num_spatial
  if num_data * num_spatial != len(devices):
    raise ValueError(
        f'mesh {num_data}x{num_spatial} != {len(devices)} devices')
  dev_array = mesh_utils.create_device_mesh((num_data, num_spatial),
                                            devices=devices)
  return Mesh(dev_array, ('data', 'spatial'))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None
                   ) -> NamedSharding:
  """Sharding for a batch tensor: batch dim on 'data', optionally one
  spatial dim on 'spatial'."""
  if spatial_axis is None:
    return NamedSharding(mesh, P('data'))
  spec = [None] * (spatial_axis + 1)
  spec[0] = 'data'
  spec[spatial_axis] = 'spatial'
  return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_leaf_dim0(mesh: Mesh, leaf) -> NamedSharding:
  """Shards a leaf's first dimension over 'data' when divisible, else
  replicates."""
  num_data = mesh.shape['data']
  shape = np.shape(leaf)
  if len(shape) >= 1 and shape[0] >= num_data and shape[0] % num_data == 0:
    return NamedSharding(mesh, P('data'))
  return NamedSharding(mesh, P())


def shard_leaf_zero1(mesh: Mesh, leaf) -> NamedSharding:
  """ZeRO-style sharding for an arbitrarily-shaped leaf: shard the
  LARGEST axis divisible by the data-parallel degree.

  Conv kernels are (Kh, Kw, I, O) with Kh/Kw in {1, 3, 7}; a dim-0 rule
  would replicate every kernel (and with it ~95% of the Adam bytes). The
  channel axes are multiples of gen_dims, so picking the largest
  divisible axis shards essentially all optimizer memory.
  """
  num_data = mesh.shape['data']
  shape = np.shape(leaf)
  best = None
  for i, s in enumerate(shape):
    if s >= num_data and s % num_data == 0:
      if best is None or s > shape[best]:
        best = i
  if best is None:
    return NamedSharding(mesh, P())
  spec = [None] * len(shape)
  spec[best] = 'data'
  return NamedSharding(mesh, P(*spec))


def train_state_shardings(state, mesh: Mesh, shard_opt_state: bool = True):
  """Sharding tree for a TrainState: forward params replicated; Adam
  moments AND the EMA shadow copy sharded over the data axis (ZeRO-1).

  Under GSPMD this single annotation yields the ZeRO-1 schedule
  automatically: gradients are reduce-scattered into the sharded Adam
  moments and the parameter update is all-gathered, both riding ICI.
  The EMA copy is pure per-parameter state (elementwise update each
  step, read only at eval), so it shards the same way. Together this
  cuts per-chip state for the production config (1.1B-param G, ~20 GB
  bundle) to ~6 GB on v5e-8 — verified executable in
  tests/test_memory_budget.py.
  """
  rep = replicated(mesh)

  def shard_tree(tree, fn):
    return jax.tree_util.tree_map(fn, tree)

  rep_fn = lambda leaf: rep
  opt_fn = (functools.partial(shard_leaf_zero1, mesh)
            if shard_opt_state else rep_fn)
  return type(state)(
      step=rep,
      g_params=shard_tree(state.g_params, rep_fn),
      g_state=shard_tree(state.g_state, rep_fn),
      d_params=shard_tree(state.d_params, rep_fn),
      d_state=shard_tree(state.d_state, rep_fn),
      ema_params=shard_tree(state.ema_params, opt_fn),
      ema_state=shard_tree(state.ema_state, rep_fn),
      g_opt_state=shard_tree(state.g_opt_state, opt_fn),
      d_opt_state=shard_tree(state.d_opt_state, opt_fn),
  )


def cluster_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for a stacked step-cluster batch {k: (K, B, ...)}: the
  steps axis replicated (it is scanned over), the batch dim on 'data'."""
  return NamedSharding(mesh, P(None, 'data'))


def shard_batch(batch, mesh: Mesh, spatial_axis: Optional[int] = None):
  """Device-puts a pytree of host arrays with batch-dim sharding."""
  sharding = batch_sharding(mesh, spatial_axis)
  def put(x):
    if hasattr(x, 'ndim') and x.ndim >= 1:
      return jax.device_put(x, NamedSharding(mesh, P('data')))
    return jax.device_put(x, replicated(mesh))
  return jax.tree_util.tree_map(put, batch)
