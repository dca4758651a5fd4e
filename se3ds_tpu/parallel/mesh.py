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


def shard_batch(batch, mesh: Mesh, spatial_axis: Optional[int] = None):
  """Device-puts a pytree of host arrays with batch-dim sharding."""
  sharding = batch_sharding(mesh, spatial_axis)
  def put(x):
    if hasattr(x, 'ndim') and x.ndim >= 1:
      return jax.device_put(x, NamedSharding(mesh, P('data')))
    return jax.device_put(x, replicated(mesh))
  return jax.tree_util.tree_map(put, batch)
