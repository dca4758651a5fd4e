"""Fine-grained generator-forward profile on the current backend.

Times the 1024x512 eval forward under component-ablation patches to
attribute the ~42 ms budget (PERF.md):
  full        - production path (wrap-once pads, spectral folding off,
                scratch weights), BOTH decoder outputs returned
  nomaskconv  - PartialConv mask convolutions replaced by strided
                slicing (WRONG numerics, timing bound only): the delta
                is the total cost of the ~100 (k,k,1,1) mask convs
  nocontext   - context_layer='none': cost of the 4-conv global context
  onedecoder  - return only the RGB output: XLA dead-code-eliminates
                the depth decoder + head, so the delta vs `full` is the
                true cost of the second decoder

NOTE each case other than `full` returns only output [6] (generated
RGB); under jit that DCEs the depth decoder, so compare those cases
against `onedecoder`, not `full`.

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
  import flax.linen as nn
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

  orig_cls = layers.PartialConv

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

  # Flax wraps methods at class creation, so monkeypatching __call__ on
  # the existing class loses the @compact marker; subclass and swap the
  # module attribute instead (all call sites resolve it dynamically).
  class NoMaskPartialConv(orig_cls):

    @nn.compact
    def __call__(self, feature, mask=None, train=False, prewrapped=False):
      return nomask_call(self, feature, mask, train, prewrapped)

  for case in args.cases.split(','):
    layers.PartialConv = orig_cls
    context = 'convs'
    if case == 'nomaskconv':
      layers.PartialConv = NoMaskPartialConv
    elif case == 'nocontext':
      context = 'none'

    model = gen_lib.ResNetGenerator(
        image_size=args.size, gen_dims=args.gen_dims,
        resnet_version=args.resnet, context_layer=context,
        dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), cond, train=False)
    if case == 'full':
      # Return BOTH decoder outputs (pred_depth is [3], generated_rgb is
      # [6]) so neither decoder is dead-code-eliminated.
      fwd = jax.jit(lambda v, c: model.apply(v, c, train=False)[3:7:3])
    else:
      # Returning only the RGB output DCEs the depth decoder + head —
      # which IS the 'onedecoder' measurement; the ablation cases use the
      # same indexing so their deltas compare against 'onedecoder'.
      fwd = jax.jit(lambda v, c: model.apply(v, c, train=False)[6])
    dt = timeit(fwd, variables, cond, iters=args.iters)
    print(f'generator[{case}]: {dt * 1000:.1f} ms')
    del variables
  layers.PartialConv = orig_cls


if __name__ == '__main__':
  main()
