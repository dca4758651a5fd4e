"""Fine-grained generator-forward profile on the current backend.

Times the 1024x512 eval forward under component-ablation patches to
attribute the ~42 ms budget (PERF.md):
  full        - production path (wrap-once pads, spectral folding off,
                scratch weights; matches profile_inference.py)
  nomaskconv  - PartialConv mask convolutions replaced by strided
                slicing (WRONG numerics, timing bound only): the delta
                is the total cost of the ~100 (k,k,1,1) mask convs
  nocontext   - context_layer='none': cost of the 4-conv global context
  onedecoder  - depth decoder reuses the RGB decoder output (timing
                bound only): the delta is one decoder + its head

Usage: python scripts/profile_generator.py [--size 512] [--gen_dims 128]
"""

import argparse
import sys

sys.path.insert(0, '.')


def _fetch(out):
  import jax
  import numpy as np
  leaf = jax.tree_util.tree_leaves(out)[0]
  return np.asarray(leaf.reshape(-1)[:4])


def timeit(fn, *args, iters=5, warmup=1):
  import time as _t
  for _ in range(warmup):
    out = fn(*args)
  _fetch(out)
  t0 = _t.perf_counter()
  _fetch(out)
  latency = _t.perf_counter() - t0
  t0 = _t.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  _fetch(out)
  return max(_t.perf_counter() - t0 - latency, 1e-9) / iters


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', type=int, default=512)
  parser.add_argument('--gen_dims', type=int, default=128)
  parser.add_argument('--resnet', default='101')
  parser.add_argument('--iters', type=int, default=5)
  parser.add_argument('--cases', default='full,nomaskconv,nocontext,onedecoder')
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp
  from se3ds_tpu.models import generator as gen_lib
  from se3ds_tpu.models import layers

  h, w = args.size, args.size * 2
  print(f'backend={jax.default_backend()} size={h}x{w} '
        f'gen_dims={args.gen_dims} R{args.resnet}')

  cond = {
      'proj_image': jnp.zeros((1, h, w, 3)),
      'proj_depth': jnp.zeros((1, h, w, 1)),
      'proj_mask': jnp.ones((1, h, w, 1)),
      'blurred_mask': jnp.zeros((1, h, w, 1)),
  }

  orig_call = layers.PartialConv.__call__

  def nomask_call(self, feature, mask=None, train=False, prewrapped=False):
    # Timing-bound hack: skip the mask convolution; downsample the mask
    # by slicing instead. NOT numerically correct.
    kh, kw = layers._to_pair(self.kernel_size)
    sh, sw = layers._to_pair(self.strides)
    in_ch = feature.shape[-1]
    kernel = self.param('kernel', layers.conv_kernel_init,
                        (kh, kw, in_ch, self.features))
    if mask is None:
      mask = jnp.ones(feature.shape[:3] + (1,), feature.dtype)
    update_mask = mask[:, ::sh, ::sw]
    eps = 1e-6
    mask_ratio = (kh * kw) / (update_mask + eps)
    update_mask = jnp.clip(update_mask, 0.0, 1.0)
    mask_ratio = mask_ratio * update_mask
    out = feature * mask
    if self.fused_pad:
      out = layers.circular_conv2d(out.astype(self.dtype),
                                   kernel.astype(self.dtype), self.strides,
                                   self.fused_pad, self.circular, train,
                                   prewrapped=prewrapped)
    else:
      out = layers._conv2d(out.astype(self.dtype), kernel.astype(self.dtype),
                           self.strides, self.padding.upper())
    # Shape fixup for the hacked mask under fused/prewrapped paths.
    oh, ow = out.shape[1], out.shape[2]
    update_mask = update_mask[:, :oh, :ow]
    mask_ratio = mask_ratio[:, :oh, :ow]
    pad_h = oh - update_mask.shape[1]
    pad_w = ow - update_mask.shape[2]
    if pad_h or pad_w:
      update_mask = jnp.pad(update_mask,
                            ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                            constant_values=1.0)
      mask_ratio = jnp.pad(mask_ratio,
                           ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                           constant_values=1.0)
    if self.use_bias:
      bias = self.param('bias', jax.nn.initializers.zeros, (self.features,))
      bias = bias.reshape(1, 1, 1, -1).astype(self.dtype)
      out = (out - bias) * mask_ratio + bias
      out = out * update_mask
    else:
      out = out * mask_ratio
    if self.activation is not None:
      out = self.activation(out)
    return out, update_mask

  for case in args.cases.split(','):
    layers.PartialConv.__call__ = orig_call
    context = 'convs'
    one_decoder = False
    if case == 'nomaskconv':
      layers.PartialConv.__call__ = nomask_call
    elif case == 'nocontext':
      context = 'none'
    elif case == 'onedecoder':
      one_decoder = True

    model = gen_lib.ResNetGenerator(
        image_size=args.size, gen_dims=args.gen_dims,
        resnet_version=args.resnet, context_layer=context,
        dtype=jnp.bfloat16)
    if one_decoder:
      orig_gen_call = gen_lib.ResNetGenerator.__call__

      import functools
      from se3ds_tpu.models.generator import (ResNetEncoder, GlobalContext,
                                              ResNetDecoder, OutputHead)
      import flax.linen as nn

      def gen_call_one_decoder(self, cond, train=False):
        spectral = self.conv_mode == 'spectral'
        hh = self.gen_dims
        combined = jnp.concatenate(
            [cond['proj_image'], cond['proj_depth'], cond['blurred_mask']],
            axis=-1).astype(self.dtype)
        hidden, skip = ResNetEncoder(
            image_size=self.image_size, hidden_dims=hh,
            resnet_version=self.resnet_version, circular_pad=True,
            spectral=spectral, fold=self.spectral_fold, dtype=self.dtype,
            name='encoder')(combined, cond['proj_mask'].astype(self.dtype),
                            train=train)
        hidden = GlobalContext(hidden_dims=hh, circular_pad=True,
                               fold=self.spectral_fold, dtype=self.dtype,
                               name='global_context')(hidden, train=train)
        out = ResNetDecoder(
            output_dim=hh, image_size=self.image_size, hidden_dims=hh,
            resnet_version=self.resnet_version, circular_pad=True,
            spectral=spectral, fold=self.spectral_fold, dtype=self.dtype,
            name='decoder')(hidden, skip, train=train)
        rgb_out = OutputHead(hh, 3, True, spectral, fold=self.spectral_fold,
                             dtype=self.dtype, name='rgb_conv')(
                                 out, train=train)
        depth_out = OutputHead(hh, 1, True, spectral,
                               fold=self.spectral_fold, dtype=self.dtype,
                               name='depth_conv')(out, train=train)
        rgb_out = jnp.tanh(rgb_out.astype(jnp.float32))
        return [(rgb_out + 1) / 2,
                jnp.clip(depth_out.astype(jnp.float32), 0.0, 1.0)]

      gen_lib.ResNetGenerator.__call__ = gen_call_one_decoder
      try:
        variables = model.init(jax.random.PRNGKey(0), cond, train=False)
        fwd = jax.jit(lambda v, c: model.apply(v, c, train=False)[0])
        dt = timeit(fwd, variables, cond, iters=args.iters)
      finally:
        gen_lib.ResNetGenerator.__call__ = orig_gen_call
    else:
      variables = model.init(jax.random.PRNGKey(0), cond, train=False)
      fwd = jax.jit(lambda v, c: model.apply(v, c, train=False)[6])
      dt = timeit(fwd, variables, cond, iters=args.iters)
    print(f'generator[{case}]: {dt * 1000:.1f} ms')
    del variables
  layers.PartialConv.__call__ = orig_call


if __name__ == '__main__':
  main()
