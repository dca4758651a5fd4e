"""PatchGAN discriminators (reference image_models.py:492-618)."""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from se3ds_tpu.models import layers

Dtype = Any


class SNPatchDiscriminator(nn.Module):
  """Spectral-normalised PatchGAN discriminator.

  Returns the list of all intermediate feature maps; the last entry is the
  1-channel real/fake logit map (reference image_models.py:545-561).
  """
  kernel_size: int = 4
  dis_dims: int = 64
  n_layers: int = 4
  circular_pad: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray,
               train: bool = False) -> List[jnp.ndarray]:
    results = []
    k = self.kernel_size
    out = layers.Conv2D(self.dis_dims, kernel_size=k, strides=2,
                        padding='VALID', fused_pad=k // 2,
                        circular=self.circular_pad, dtype=self.dtype,
                        name='group0_conv')(x, train=train)
    out = nn.leaky_relu(out, negative_slope=0.2)
    results.append(out)

    previous_dim = self.dis_dims
    for i in range(1, self.n_layers):
      current_dim = min(previous_dim * 2, 512)
      strides = 2 if (i != self.n_layers - 1) else 1
      out = layers.SpectralConv(current_dim, kernel_size=k, strides=strides,
                                padding='VALID', fused_pad=k // 2,
                                circular=self.circular_pad, dtype=self.dtype,
                                name=f'group{i}_conv')(out, train=train)
      out = layers.InstanceNorm(dtype=self.dtype,
                                name=f'group{i}_norm')(out)
      out = nn.leaky_relu(out, negative_slope=0.2)
      results.append(out)
      previous_dim = current_dim

    out = layers.Conv2D(1, kernel_size=k, strides=1, padding='SAME',
                        dtype=self.dtype, name='final_conv')(out)
    results.append(out)
    return results


class SNMultiScaleDiscriminator(nn.Module):
  """Multi-scale PatchGAN: n_dis discriminators over an avg-pool pyramid."""
  image_size: int = 256  # Unused; kept for config surface parity.
  n_dis: int = 2
  kernel_size: int = 4
  dis_dims: int = 96
  n_layers: int = 5
  circular_pad: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray,
               train: bool = False) -> List[List[jnp.ndarray]]:
    result = []
    prev = x
    for d in range(self.n_dis):
      result.append(
          SNPatchDiscriminator(
              kernel_size=self.kernel_size, dis_dims=self.dis_dims,
              n_layers=self.n_layers, circular_pad=self.circular_pad,
              dtype=self.dtype, name=f'dis{d}')(prev, train=train))
      prev = layers.avg_pool_3x3_stride2_same(prev)
    return result
