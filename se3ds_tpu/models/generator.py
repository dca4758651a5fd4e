"""SE3DS generator models (RedNet-style encoder/decoder with partial convs).

Architecture mirrors the reference (`/root/reference/models/
image_models.py:27-488`): a ResNet-{50,101,152} encoder over the guidance
RGB-D (+ blurred mask), a 4-conv spectral global-context stack at the
bottleneck, and two independent decoders (RGB and depth) sharing the
encoder skip connections. The 7-output contract — [mu, logvar, kld, depth,
seg, depth_seg, rgb] with mu/logvar/kld/seg outputs all-zero in this
release — is preserved for trainer/checkpoint compatibility.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from se3ds_tpu import constants
from se3ds_tpu.models import layers

Dtype = Any

RESNET_ENCODER_FILTERS = {
    'tiny': (1, 1, 1, 1),  # framework extra for fast tests/dry runs
    '50': (3, 4, 6, 3),
    '101': (3, 4, 23, 3),
    '152': (3, 8, 36, 3),
}
RESNET_DECODER_FILTERS = {
    'tiny': (1, 1, 1, 1),
    '50': (6, 4, 3, 3),
    '101': (23, 4, 3, 3),
    '152': (36, 8, 3, 3),
}


class ResNetEncoder(nn.Module):
  """Encoder (reference image_models.py:196-303)."""
  image_size: int
  hidden_dims: int = 64
  resnet_version: str = '50'
  circular_pad: bool = False
  spectral: bool = True  # conv_fn == SpectralConv in the reference generator
  fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, mask=None, train: bool = False):
    if self.resnet_version not in RESNET_ENCODER_FILTERS:
      raise ValueError(
          'resnet_version should be one of ["50", "101", "152"], '
          f'got {self.resnet_version} instead.')
    filters = RESNET_ENCODER_FILTERS[self.resnet_version]
    h = self.hidden_dims

    out, update_mask = layers.PartialConv(
        h, kernel_size=7, strides=2, padding='VALID', fused_pad=3,
        circular=self.circular_pad, fold=self.fold, dtype=self.dtype,
        name='conv1')(x, mask, train=train)
    out = layers.SyncBatchNorm(dtype=self.dtype, name='act1_bn')(out,
                                                                 train=train)
    out = nn.relu(out)
    b1 = out
    out = layers.max_pool_2x2_same(out)
    update_mask = layers.max_pool_2x2_same(update_mask)
    stack = functools.partial(layers.ResStack, circular_pad=self.circular_pad,
                              spectral=self.spectral, fold=self.fold,
                              dtype=self.dtype)
    out, update_mask = stack(h, h, filters[0], name='stack1')(
        out, update_mask, train=train)
    s1 = out
    out, update_mask = stack(h, h * 2, filters[1], strides=2,
                             name='stack2')(out, update_mask, train=train)
    s2 = out
    out, update_mask = stack(h * 2, h * 4, filters[2], strides=2,
                             name='stack3')(out, update_mask, train=train)
    s3 = out
    out, update_mask = stack(h * 4, h * 8, filters[3], strides=2,
                             name='stack4')(out, update_mask, train=train)
    out, update_mask = layers.PartialConv(
        h * 4, kernel_size=3, strides=1, padding='VALID', fused_pad=1,
        circular=self.circular_pad, fold=self.fold, dtype=self.dtype,
        name='final_conv')(out, update_mask, train=train)
    out = layers.SyncBatchNorm(dtype=self.dtype, name='final_bn')(out,
                                                                  train=train)
    out = nn.relu(out)
    return out, [b1, s1, s2, s3]


class ResNetDecoder(nn.Module):
  """Decoder (reference image_models.py:306-488), fully convolutional."""
  output_dim: int
  image_size: int
  hidden_dims: int = 64
  resnet_version: str = '50'
  circular_pad: bool = False
  partial_conv: bool = True
  spectral: bool = True
  fold: bool = False
  dtype: Dtype = jnp.float32

  def _agent(self, features, name):
    if self.partial_conv:
      return layers.PartialConv(features, kernel_size=1, strides=1,
                                padding='SAME', use_bias=False,
                                spectral_norm=self.spectral, fold=self.fold,
                                dtype=self.dtype, name=name)
    if self.spectral:
      return layers.SpectralConv(features, kernel_size=1, strides=1,
                                 padding='SAME', use_bias=False,
                                 fold=self.fold, dtype=self.dtype, name=name)
    return layers.Conv2D(features, kernel_size=1, strides=1, padding='SAME',
                         use_bias=False, dtype=self.dtype, name=name)

  def _apply_agent(self, agent, x, mask, train):
    if self.partial_conv:
      out, _ = agent(x, mask, train=train)
    else:
      out = agent(x, train=train)
    return out

  @nn.compact
  def __call__(self, x, skip, masks=None, train: bool = False):
    if self.resnet_version not in RESNET_DECODER_FILTERS:
      raise ValueError(
          'resnet_version should be one of ["50", "101", "152"], '
          f'got {self.resnet_version} instead.')
    filters = RESNET_DECODER_FILTERS[self.resnet_version]
    h = self.hidden_dims
    if masks is None:
      masks = [None] * len(skip)

    conv = (functools.partial(layers.SpectralConv, fold=self.fold)
            if self.spectral else layers.Conv2D)
    # upc (flatten_output=False branch, image_models.py:374-379).
    out = conv(h * 2, kernel_size=1, strides=1, padding='SAME',
               dtype=self.dtype, name='upc_conv')(x, train=train)
    out = layers.SyncBatchNorm(dtype=self.dtype, name='upc_bn')(out,
                                                                train=train)
    out = nn.leaky_relu(out, negative_slope=0.2)
    out = layers.upsample_2x_nearest(out)

    out = self._apply_agent(self._agent(h * 8, 'agent4'), out, None, train)
    out = layers.SyncBatchNorm(dtype=self.dtype, name='agent4_bn')(out,
                                                                   train=train)
    out = nn.relu(out)

    stack_t = functools.partial(layers.ResStackTranspose,
                                circular_pad=self.circular_pad,
                                spectral=self.spectral, fold=self.fold,
                                dtype=self.dtype)
    out = stack_t(h * 8, h * 4, filters[0], strides=1,
                  name='deconv1')(out, train=train)
    shortcut = self._apply_agent(self._agent(h * 4, 'agent3'), skip[3],
                                 masks[3], train)
    shortcut = layers.SyncBatchNorm(dtype=self.dtype, name='agent3_bn')(
        shortcut, train=train)
    shortcut = nn.relu(shortcut)
    out = out + shortcut

    out = stack_t(h * 4, h * 2, filters[1], strides=2,
                  name='deconv2')(out, train=train)
    shortcut = self._apply_agent(self._agent(h * 2, 'agent2'), skip[2],
                                 masks[2], train)
    shortcut = layers.SyncBatchNorm(dtype=self.dtype, name='agent2_bn')(
        shortcut, train=train)
    shortcut = nn.relu(shortcut)
    out = out + shortcut

    out = stack_t(h * 2, h, filters[2], strides=2,
                  name='deconv3')(out, train=train)
    shortcut = self._apply_agent(self._agent(h, 'agent1'), skip[1],
                                 masks[1], train)
    shortcut = layers.SyncBatchNorm(dtype=self.dtype, name='agent1_bn')(
        shortcut, train=train)
    shortcut = nn.relu(shortcut)
    out = out + shortcut

    out = stack_t(h, h, filters[3], strides=2,
                  name='deconv4')(out, train=train)
    shortcut = self._apply_agent(self._agent(h, 'agent0'), skip[0],
                                 masks[0], train)
    shortcut = layers.SyncBatchNorm(dtype=self.dtype, name='agent0_bn')(
        shortcut, train=train)
    shortcut = nn.relu(shortcut)
    out = out + shortcut

    # final_conv uses plain Conv2D in the reference (conv_fn default,
    # image_models.py:438-439).
    out = layers.ResStackTranspose(
        h, h, 3, circular_pad=self.circular_pad, spectral=False,
        dtype=self.dtype, name='final_conv')(out, train=train)
    out = layers.Conv2DTranspose(self.output_dim, kernel_size=2, strides=2,
                                 padding='SAME', dtype=self.dtype,
                                 name='final_deconv')(out)
    return out


class OutputHead(nn.Module):
  """3x(BN, pad, conv3x3) head (reference rgb_conv/depth_conv)."""
  hidden_dims: int
  out_channels: int
  circular_pad: bool
  spectral: bool = True
  fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    conv = (functools.partial(layers.SpectralConv, fold=self.fold)
            if self.spectral else layers.Conv2D)
    # Eval circular padding: ONE wrapped-margin copy feeds the whole
    # 3-conv chain (wrap_width commutes with circular conv; BN/LeakyReLU
    # are elementwise), bit-equal to per-conv circular pads but without
    # 3 full-width activation copies at the two costliest resolutions.
    wrap = self.circular_pad and not train
    specs = [(self.hidden_dims, True), (self.hidden_dims, True),
             (self.out_channels, False)]
    out = layers.wrap_width(x, len(specs)) if wrap else x
    for i, (features, act) in enumerate(specs):
      out = layers.SyncBatchNorm(dtype=self.dtype, name=f'bn{i}')(out,
                                                                  train=train)
      out = conv(features, kernel_size=3, strides=1, padding='VALID',
                 fused_pad=1, circular=self.circular_pad,
                 dtype=self.dtype, name=f'conv{i}')(out, train=train,
                                                    prewrapped=wrap)
      if act:
        # Keras LeakyReLU() default slope (reference image_models.py:83).
        out = nn.leaky_relu(out, negative_slope=0.3)
    return out


class GlobalContext(nn.Module):
  """4-layer spectral-conv context stack (image_models.py:106-128)."""
  hidden_dims: int
  circular_pad: bool
  fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    h = self.hidden_dims
    specs = [(h * 4, True), (h * 8, True), (h * 4, True), (h * 4, False)]
    # One wrapped-margin copy for the 4-conv chain (see OutputHead).
    wrap = self.circular_pad and not train
    out = layers.wrap_width(x, len(specs)) if wrap else x
    for i, (features, act) in enumerate(specs):
      out = layers.SyncBatchNorm(dtype=self.dtype, name=f'bn{i}')(out,
                                                                  train=train)
      out = layers.SpectralConv(features, kernel_size=3, strides=1,
                                padding='VALID', fused_pad=1,
                                circular=self.circular_pad, fold=self.fold,
                                dtype=self.dtype,
                                name=f'conv{i}')(out, train=train,
                                                 prewrapped=wrap)
      if act:
        # Keras LeakyReLU() default slope (reference image_models.py:112).
        out = nn.leaky_relu(out, negative_slope=0.3)
    return out


class ResNetGenerator(nn.Module):
  """RGB-D pano generator (reference ResNetGenerator, image_models.py:27-193).

  Call with a dict of conditions:
    proj_image: (N, H, W, 3) guidance RGB in [0, 1].
    proj_depth: (N, H, W, 1) guidance depth in [0, 1].
    proj_mask: (N, H, W, 1) binary guidance-validity mask.
    blurred_mask: (N, H, W, 1) binary mask of blurred pole regions.

  Returns the reference 7-list:
    [mu_p, logvar_p, kld_loss, depth_out, seg_out, depth_seg_out, rgb_out].
  """
  image_size: int = 256
  gen_dims: int = 96
  z_dim: int = 128
  resnet_version: str = '50'
  context_layer: str = 'convs'
  conv_mode: str = 'spectral'
  use_blurred_mask: bool = True
  # Eval-only: kernels pre-normalised at load (models/folding.py); skips
  # the per-forward spectral re-normalisation pass over every weight.
  spectral_fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, cond: Dict[str, jnp.ndarray],
               train: bool = False) -> List[jnp.ndarray]:
    if self.context_layer not in ('convs', 'none'):
      raise NotImplementedError(self.context_layer)
    spectral = self.conv_mode == 'spectral'
    circular_pad = True
    h = self.gen_dims

    guidance_image = cond['proj_image']
    guidance_depth = cond['proj_depth']
    guidance_mask = cond['proj_mask']
    blurred_mask = cond['blurred_mask']

    if self.use_blurred_mask:
      combined = jnp.concatenate(
          [guidance_image, guidance_depth, blurred_mask], axis=-1)
    else:
      combined = jnp.concatenate([guidance_image, guidance_depth], axis=-1)
    combined = combined.astype(self.dtype)

    hidden, skip = ResNetEncoder(
        image_size=self.image_size, hidden_dims=h,
        resnet_version=self.resnet_version, circular_pad=circular_pad,
        spectral=spectral, fold=self.spectral_fold, dtype=self.dtype,
        name='encoder')(combined, guidance_mask.astype(self.dtype),
                        train=train)
    batch_size, hidden_h, hidden_w, _ = hidden.shape

    if self.context_layer == 'convs':
      hidden = GlobalContext(hidden_dims=h, circular_pad=circular_pad,
                             fold=self.spectral_fold, dtype=self.dtype,
                             name='global_context')(hidden, train=train)

    zeros_latent = jnp.zeros((batch_size, hidden_h, hidden_w, self.z_dim),
                             jnp.float32)
    kld_loss = zeros_latent
    mu_p = zeros_latent
    logvar_p = zeros_latent

    decoder = functools.partial(
        ResNetDecoder, output_dim=h, image_size=self.image_size,
        hidden_dims=h, resnet_version=self.resnet_version,
        circular_pad=circular_pad, spectral=spectral,
        fold=self.spectral_fold, dtype=self.dtype)
    out = decoder(name='decoder')(hidden, skip, train=train)
    depth_out = decoder(name='depth_decoder')(hidden, skip, train=train)

    seg_out = jnp.zeros(
        guidance_depth.shape[:-1] + (constants.NUM_MP3D_CLASSES,),
        guidance_depth.dtype)
    depth_seg_out = jnp.zeros_like(seg_out)
    rgb_out = OutputHead(h, 3, circular_pad, spectral,
                         fold=self.spectral_fold, dtype=self.dtype,
                         name='rgb_conv')(out, train=train)
    depth_out = OutputHead(h, 1, circular_pad, spectral,
                           fold=self.spectral_fold, dtype=self.dtype,
                           name='depth_conv')(depth_out, train=train)

    rgb_out = jnp.tanh(rgb_out.astype(jnp.float32))
    rgb_out = (rgb_out + 1) / 2
    depth_out = jnp.clip(depth_out.astype(jnp.float32), 0.0, 1.0)
    return [mu_p, logvar_p, kld_loss, depth_out, seg_out, depth_seg_out,
            rgb_out]
