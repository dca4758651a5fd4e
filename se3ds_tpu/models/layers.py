"""Neural-net building blocks for SE3DS models, as Flax linen modules.

Behavioural contract follows the reference (`/root/reference/models/
layers.py`), re-expressed functionally for JAX/TPU:

* `pad2d` — circular (width-wrap) padding for panoramas. Circular wrapping
  is active only when `train=False`, because training uses random crops of
  panoramas (reference layers.py:67-71).
* `PartialConv` — hole-aware convolution (Liu et al., ECCV'18) with
  mask-ratio renormalisation and mask propagation (layers.py:100-209).
  NOTE: when `spectral_norm=True` the reference updates the power-iteration
  vector `u` but convolves with the *raw* kernel (layers.py:193-198 use
  `self.kernel`, not `w_norm`); we reproduce that exactly for checkpoint
  and training-dynamics parity.
* `SpectralConv` — spectral-normalised conv (Miyato et al.) with one power
  iteration per call; `u` lives in the 'spectral' variable collection and
  is updated only when `train=True` (layers.py:275-347).
* Batch norms use Flax `nn.BatchNorm`. Under GSPMD (jit over a sharded
  batch) the batch-statistics mean IS the global mean — XLA inserts the
  cross-device reduction — so the reference's SyncBatchNormalization
  semantics come for free without explicit collectives.

All tensors are NHWC. Keras-compatible initialisers are used
(glorot_uniform kernels, zero biases) so training dynamics match.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Keras Conv2D defaults.
conv_kernel_init = nn.initializers.glorot_uniform()
# tf.initializers.TruncatedNormal() default stddev (reference layers.py:291).
u_init = nn.initializers.truncated_normal(stddev=0.05)

BN_MOMENTUM = 0.99  # Keras SyncBatchNormalization default.
BN_EPSILON = 1e-3


def pad2d(x: jnp.ndarray,
          padding: int,
          circular_pad: bool = False,
          mode: str = 'CONSTANT',
          constant_value: float = 0.0,
          train: bool = False) -> jnp.ndarray:
  """Pads (N, H, W, C) by `padding` on H and W (reference PadLayer).

  Width padding wraps circularly when `circular_pad and not train`; height
  padding always uses `mode`.
  """
  if padding == 0:
    return x
  p = padding
  mode = mode.upper()
  if mode == 'CONSTANT':
    np_mode = 'constant'
  elif mode == 'REFLECT':
    np_mode = 'reflect'
  elif mode == 'SYMMETRIC':
    np_mode = 'symmetric'
  else:
    raise ValueError(f'Unsupported pad mode {mode}')

  circular = circular_pad and not train
  kwargs = dict(constant_values=constant_value) if np_mode == 'constant' else {}
  if circular:
    # Pad height with `mode`, then wrap width.
    padded = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)), mode=np_mode,
                     **kwargs)
    left = padded[:, :, -p:, :]
    right = padded[:, :, :p, :]
    return jnp.concatenate([left, padded, right], axis=2)
  return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=np_mode, **kwargs)


def _to_pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
  if isinstance(v, int):
    return (v, v)
  return tuple(v)  # type: ignore


def _conv2d(x: jnp.ndarray, kernel: jnp.ndarray, strides, padding,
            dilation=(1, 1)) -> jnp.ndarray:
  """NHWC conv with HWIO kernel, TF-style padding string."""
  return jax.lax.conv_general_dilated(
      x, kernel, window_strides=_to_pair(strides), padding=padding,
      rhs_dilation=_to_pair(dilation),
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def wrap_width(x: jnp.ndarray, margin: int) -> jnp.ndarray:
  """Circularly extends (N, H, W, C) by `margin` columns on each side.

  Column j of the result equals x[..., (j - margin) mod W, :]. One wrap
  of margin m feeds a chain of m stride-1 width-VALID convs: circular
  convolution commutes with the wrap (shift invariance), so each conv
  consumes one margin column per side and the chain ends bit-equal to m
  per-conv circular pads — with ONE activation copy instead of m
  (the pad copies cost ~26 ms/forward at 1024x512 eval, PERF.md).
  """
  if margin == 0:
    return x
  width = x.shape[2]
  if margin <= width:
    return jnp.concatenate(
        [x[:, :, -margin:], x, x[:, :, :margin]], axis=2)
  # Margin wider than the pano itself (tiny test shapes): mod-index
  # gather; a plain slice would silently clamp and shrink the chain.
  import numpy as np
  idx = np.arange(-margin, width + margin) % width
  return jnp.take(x, jnp.asarray(idx), axis=2)


def mask_window_sum(mask: jnp.ndarray, kh: int, kw: int, strides,
                    fused_pad: int = 0, circular: bool = False,
                    train: bool = False, prewrapped: bool = False,
                    padding: str = 'SAME') -> jnp.ndarray:
  """Window-sum of a 0/1 mask — the partial-conv mask propagation
  (reference layers.py:152-163) without the ones-kernel convolution.

  Bit-exact replacement for `conv(mask, ones(kh, kw, 1, 1))` on binary
  masks: every partial sum is an integer <= kh*kw <= 49, exactly
  representable even in bf16, so the result is independent of the
  reduction association. 1x1 kernels are the (strided) identity; k > 1
  rides `lax.reduce_window(add)`, which lowers to the VPU instead of
  wasting the 128x128 MXU on a 1-in/1-out-channel conv. Measured at the
  production encoder shapes in scripts/bench_mask_conv.py; padding
  semantics mirror `circular_conv2d` (fused path) / `_conv2d` (TF-style
  padding string).
  """
  sh, sw = _to_pair(strides)
  if kh == 1 and kw == 1 and fused_pad == 0:
    # A 1x1 ones-conv is the identity; SAME/VALID 1x1 pads nothing, so
    # striding is a plain subsample.
    return mask if (sh == 1 and sw == 1) else mask[:, ::sh, ::sw, :]

  def rw(x, hpad, wpad):
    return jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        window_dimensions=(1, kh, kw, 1), window_strides=(1, sh, sw, 1),
        padding=((0, 0), hpad, wpad, (0, 0)))

  if fused_pad:
    p = fused_pad
    if prewrapped:
      # Input already carries a wrapped width margin: pad height only.
      return rw(mask, (p, p), (0, 0))
    if circular and not train and p > 0:
      return rw(pad2d(mask, p, circular_pad=True, train=False),
                (0, 0), (0, 0))
    return rw(mask, (p, p), (p, p))
  pads = jax.lax.padtype_to_pads(
      mask.shape, (1, kh, kw, 1), (1, sh, sw, 1), padding.upper())
  return rw(mask, tuple(pads[1]), tuple(pads[2]))


def circular_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, strides,
                    pad: int, circular: bool, train: bool,
                    border_fixup: bool = False,
                    prewrapped: bool = False) -> jnp.ndarray:
  """Fused equivalent of `pad2d(x, pad, circular, train)` + VALID conv.

  The reference pads every 3x3/7x7 conv input explicitly (PadLayer),
  which on TPU materialises a full copy of the activation before each
  conv (~26 ms per generator forward at 1024x512 eval). Training padding
  is pure zeros (circular is disabled, layers.py:67-71 reference), so it
  fuses into the convolution for free — that path is always taken.

  At eval the width padding wraps. Two equivalent implementations:
  explicit pad + VALID conv (default), or conv-native zero pad with the
  border output columns recomputed from a narrow wrapped strip
  (`border_fixup=True`). Both are bit-equal (tested); on the current
  v5e/relay toolchain the many small strip convs compile poorly and run
  *slower* end-to-end than the pad copies, so the fixup is opt-in.
  """
  sh, sw = _to_pair(strides)
  kh, kw = kernel.shape[0], kernel.shape[1]
  p = pad
  if prewrapped:
    # Input already carries a wrapped width margin (wrap_width); pad
    # height only and consume one margin column per side.
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(sh, sw), padding=((p, p), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  if circular and not train and p > 0 and not border_fixup:
    padded = pad2d(x, p, circular_pad=True, train=False)
    return jax.lax.conv_general_dilated(
        padded, kernel, window_strides=(sh, sw), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  out = jax.lax.conv_general_dilated(
      x, kernel, window_strides=(sh, sw), padding=((p, p), (p, p)),
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  if not (circular and not train) or p == 0:
    return out

  width = x.shape[2]
  w_out = (width + 2 * p - kw) // sw + 1
  # Output columns whose input window crosses the left/right edge.
  jl = -(-p // sw)  # ceil(p / sw)
  j_right_start = -(-(width + p - kw + 1) // sw)
  jr = w_out - j_right_start

  def strip_conv(strip):
    return jax.lax.conv_general_dilated(
        strip, kernel, window_strides=(sh, sw),
        padding=((p, p), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  if jl > 0:
    left_strip = jnp.concatenate(
        [x[:, :, width - p:], x[:, :, :(jl - 1) * sw - p + kw]], axis=2)
    left_fix = strip_conv(left_strip)
    out = jax.lax.dynamic_update_slice(out, left_fix, (0, 0, 0, 0))
  if jr > 0:
    wrap = (w_out - 1) * sw - p + kw - width
    right_strip = jnp.concatenate(
        [x[:, :, j_right_start * sw - p:], x[:, :, :wrap]], axis=2)
    right_fix = strip_conv(right_strip)
    out = jax.lax.dynamic_update_slice(
        out, right_fix, (0, 0, j_right_start, 0))
  return out


def spectral_normalize(w_flat: jnp.ndarray, u: jnp.ndarray,
                       eps: float = 1e-10):
  """One power-iteration step (reference layers.py:311-332).

  Args:
    w_flat: (K, O) flattened kernel.
    u: (1, O) power-iteration state.

  Returns:
    w_norm: (K, O) spectrally normalised kernel.
    u_hat: (1, O) updated state (caller decides whether to store it).
    sigma: (1, 1) estimated top singular value.
  """
  v = u @ w_flat.T
  v_hat = v / (jnp.linalg.norm(v) + eps)
  u_new = v_hat @ w_flat
  u_hat = u_new / (jnp.linalg.norm(u_new) + eps)
  u_hat = jax.lax.stop_gradient(u_hat)
  v_hat = jax.lax.stop_gradient(v_hat)
  sigma = (v_hat @ w_flat) @ u_hat.T
  w_norm = w_flat / (sigma + eps)
  return w_norm, u_hat, sigma


class SpectralConv(nn.Module):
  """Conv2D with spectral normalisation (reference SpectralConv).

  fused_pad > 0 replaces an explicit `pad2d(x, fused_pad, circular)` +
  VALID conv with the fused `circular_conv2d` (same math, no activation
  copy).
  """
  features: int
  kernel_size: Union[int, Tuple[int, int]]
  strides: Union[int, Tuple[int, int]] = 1
  padding: str = 'SAME'
  use_bias: bool = True
  activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
  fused_pad: int = 0
  circular: bool = False
  fold: bool = False  # kernel pre-normalised at load (models/folding.py)
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool = False,
               prewrapped: bool = False) -> jnp.ndarray:
    kh, kw = _to_pair(self.kernel_size)
    in_ch = x.shape[-1]
    kernel = self.param('kernel', conv_kernel_init,
                        (kh, kw, in_ch, self.features))
    if self.fold:
      # Inference fast path: sigma is constant at eval, so the kernel was
      # divided once at load time (fold_spectral_variables) — skipping a
      # full re-normalisation pass over every weight per forward.
      assert not train, 'folded spectral norm is eval-only'
      w_norm = kernel
    else:
      u = self.variable(
          'spectral', 'u',
          lambda: u_init(self.make_rng('params'), (1, self.features),
                         jnp.float32))
      w_flat = kernel.reshape(-1, self.features)
      w_norm, u_hat, _ = spectral_normalize(w_flat, u.value)
      if train and not self.is_initializing():
        u.value = u_hat
      w_norm = w_norm.reshape(kernel.shape)
    if self.fused_pad:
      out = circular_conv2d(x.astype(self.dtype), w_norm.astype(self.dtype),
                            self.strides, self.fused_pad, self.circular,
                            train, prewrapped=prewrapped)
    else:
      out = _conv2d(x.astype(self.dtype), w_norm.astype(self.dtype),
                    self.strides, self.padding.upper())
    if self.use_bias:
      bias = self.param('bias', nn.initializers.zeros, (self.features,))
      out = out + bias.astype(self.dtype)
    if self.activation is not None:
      out = self.activation(out)
    return out


class PartialConv(nn.Module):
  """Partial convolution with optional (inert) spectral norm.

  Returns (out, update_mask). See module docstring for the spectral-norm
  caveat: the reference computes w_norm but convolves with the raw kernel
  (layers.py:193-198), so `spectral_norm=True` only maintains `u`.
  """
  features: int
  kernel_size: Union[int, Tuple[int, int]]
  strides: Union[int, Tuple[int, int]] = 1
  padding: str = 'SAME'
  use_bias: bool = True
  spectral_norm: bool = False
  activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
  fused_pad: int = 0
  circular: bool = False
  fold: bool = False  # eval-only: skip the inert u maintenance entirely
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self,
               feature: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None,
               train: bool = False,
               prewrapped: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    kh, kw = _to_pair(self.kernel_size)
    in_ch = feature.shape[-1]
    kernel = self.param('kernel', conv_kernel_init,
                        (kh, kw, in_ch, self.features))
    if mask is None:
      mask = jnp.ones(feature.shape[:3] + (1,), feature.dtype)

    eps = 1e-6
    slide_window_size = kh * kw * 1
    # Window-sum instead of a ones-kernel conv: bit-exact on the 0/1
    # masks this layer propagates, and off the MXU (see mask_window_sum).
    update_mask = mask_window_sum(mask, kh, kw, self.strides,
                                  fused_pad=self.fused_pad,
                                  circular=self.circular, train=train,
                                  prewrapped=prewrapped,
                                  padding=self.padding)
    mask_ratio = slide_window_size / (update_mask + eps)
    update_mask = jnp.clip(update_mask, 0.0, 1.0)
    mask_ratio = mask_ratio * update_mask
    mask = jax.lax.stop_gradient(mask)
    update_mask = jax.lax.stop_gradient(update_mask)
    mask_ratio = jax.lax.stop_gradient(mask_ratio)

    if self.spectral_norm and not self.fold:
      u = self.variable(
          'spectral', 'u',
          lambda: u_init(self.make_rng('params'), (1, self.features),
                         jnp.float32))
      w_flat = kernel.reshape(-1, self.features)
      _, u_hat, _ = spectral_normalize(w_flat, u.value)
      if train and not self.is_initializing():
        u.value = u_hat
      # Reference bug preserved: the normalised kernel is NOT used below
      # — which also makes skipping this block under `fold` (eval) exact.

    out = feature * mask
    if self.fused_pad:
      out = circular_conv2d(out.astype(self.dtype),
                            kernel.astype(self.dtype), self.strides,
                            self.fused_pad, self.circular, train,
                            prewrapped=prewrapped)
    else:
      out = _conv2d(out.astype(self.dtype), kernel.astype(self.dtype),
                    self.strides, self.padding.upper())
    if self.use_bias:
      bias = self.param('bias', nn.initializers.zeros, (self.features,))
      bias = bias.reshape(1, 1, 1, -1).astype(self.dtype)
      out = (out - bias) * mask_ratio + bias
      out = out * update_mask
    else:
      out = out * mask_ratio
    if self.activation is not None:
      out = self.activation(out)
    return out, update_mask


def PartialSpectralConv(*args, **kwargs) -> PartialConv:
  """PartialConv with spectral_norm=True (reference PartialSpectralConv)."""
  kwargs['spectral_norm'] = True
  return PartialConv(*args, **kwargs)


class Conv2D(nn.Module):
  """Plain Conv2D with Keras defaults (glorot kernel, zero bias)."""
  features: int
  kernel_size: Union[int, Tuple[int, int]]
  strides: Union[int, Tuple[int, int]] = 1
  padding: str = 'SAME'
  use_bias: bool = True
  activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
  fused_pad: int = 0
  circular: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool = False,
               prewrapped: bool = False) -> jnp.ndarray:
    kh, kw = _to_pair(self.kernel_size)
    kernel = self.param('kernel', conv_kernel_init,
                        (kh, kw, x.shape[-1], self.features))
    if self.fused_pad:
      out = circular_conv2d(x.astype(self.dtype), kernel.astype(self.dtype),
                            self.strides, self.fused_pad, self.circular,
                            train, prewrapped=prewrapped)
    else:
      out = _conv2d(x.astype(self.dtype), kernel.astype(self.dtype),
                    self.strides, self.padding.upper())
    if self.use_bias:
      bias = self.param('bias', nn.initializers.zeros, (self.features,))
      out = out + bias.astype(self.dtype)
    if self.activation is not None:
      out = self.activation(out)
    return out


class Conv2DTranspose(nn.Module):
  """Transposed conv matching keras Conv2DTranspose output geometry."""
  features: int
  kernel_size: Union[int, Tuple[int, int]]
  strides: Union[int, Tuple[int, int]] = 1
  padding: str = 'SAME'
  use_bias: bool = True
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
    del train
    out = nn.ConvTranspose(
        features=self.features,
        kernel_size=_to_pair(self.kernel_size),
        strides=_to_pair(self.strides),
        padding=self.padding.upper(),
        use_bias=self.use_bias,
        kernel_init=conv_kernel_init,
        dtype=self.dtype,
        name='convt')(x)
    return out


class SyncBatchNorm(nn.Module):
  """BatchNorm over the global (sharded) batch.

  Under GSPMD jit, `jnp.mean` over a batch sharded across the `data` mesh
  axis lowers to a cross-device reduction automatically, reproducing the
  reference's SyncBatchNormalization (all-reduce of batch stats every
  forward pass) without explicit collectives.
  """
  momentum: float = BN_MOMENTUM
  epsilon: float = BN_EPSILON
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=self.momentum,
        epsilon=self.epsilon,
        dtype=self.dtype,
        name='bn')(x)


class InstanceNorm(nn.Module):
  """Instance normalisation (tfa InstanceNormalization defaults)."""
  epsilon: float = 1e-3
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
    del train
    c = x.shape[-1]
    gamma = self.param('gamma', nn.initializers.ones, (c,))
    beta = self.param('beta', nn.initializers.zeros, (c,))
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + self.epsilon)
    return (x - mean) * inv * gamma + beta


def max_pool_2x2_same(x: jnp.ndarray) -> jnp.ndarray:
  """MaxPool2D(pool=2, strides=2, padding=SAME)."""
  return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding='SAME')


def upsample_2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
  """Keras UpSampling2D() (nearest, x2)."""
  n, h, w, c = x.shape
  x = jnp.repeat(x, 2, axis=1)
  x = jnp.repeat(x, 2, axis=2)
  return x


def avg_pool_3x3_stride2_same(x: jnp.ndarray) -> jnp.ndarray:
  """tf.nn.avg_pool(ksize=3, strides=2, padding='SAME').

  TF average-pools with zero padding but divides by the count of *valid*
  (in-window, in-bounds) elements; flax nn.avg_pool divides by the full
  window size, so we normalise explicitly.
  """
  summed = jax.lax.reduce_window(
      x, 0.0, jax.lax.add, window_dimensions=(1, 3, 3, 1),
      window_strides=(1, 2, 2, 1), padding='SAME')
  counts = jax.lax.reduce_window(
      jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
      window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
      padding='SAME')
  return summed / counts


class Bottleneck(nn.Module):
  """ResNet bottleneck with mask threading (reference Bottleneck)."""
  filters: int = 128
  strides: int = 1
  expansion: int = 4
  has_downsample: bool = False
  circular_pad: bool = False
  spectral: bool = False  # selects PartialSpectralConv vs PartialConv
  fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, mask=None, train: bool = False,
               prewrapped: bool = False):
    # prewrapped: x and mask carry a wrapped width margin; conv2 (the
    # only 3x3) consumes one column per side, the residual is cropped.
    assert not (prewrapped and (self.strides != 1 or self.has_downsample))
    partial = functools.partial(PartialConv, spectral_norm=self.spectral,
                                fold=self.fold, dtype=self.dtype)
    residual = x[:, :, 1:-1] if prewrapped else x
    out, update_mask = partial(self.filters, kernel_size=1, strides=1,
                               padding='SAME', name='conv1')(x, mask,
                                                             train=train)
    out = SyncBatchNorm(dtype=self.dtype, name='act1_bn')(out, train=train)
    out = nn.relu(out)
    out, update_mask = partial(self.filters, kernel_size=3,
                               strides=self.strides, padding='VALID',
                               fused_pad=1, circular=self.circular_pad,
                               name='conv2')(out, update_mask, train=train,
                                             prewrapped=prewrapped)
    out = SyncBatchNorm(dtype=self.dtype, name='act2_bn')(out, train=train)
    out = nn.relu(out)
    out, update_mask = partial(self.expansion * self.filters, kernel_size=1,
                               strides=1, padding='SAME',
                               name='conv3')(out, update_mask, train=train)
    out = SyncBatchNorm(dtype=self.dtype, name='act3_bn')(out, train=train)
    if self.has_downsample:
      residual, _ = partial(self.filters * self.expansion, kernel_size=1,
                            strides=self.strides, padding='SAME',
                            use_bias=False,
                            name='downsample')(x, mask, train=train)
      residual = SyncBatchNorm(dtype=self.dtype, name='ds_norm')(
          residual, train=train)
    out = out + residual
    out = nn.relu(out)
    return out, update_mask


class ResStack(nn.Module):
  """Stack of Bottleneck blocks (reference ResStack)."""
  inplanes: int
  planes: int
  blocks: int
  strides: int = 1
  expansion: int = 4
  circular_pad: bool = False
  spectral: bool = False
  fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, mask=None, train: bool = False):
    has_downsample = (self.strides != 1
                      or self.inplanes != self.planes * self.expansion)
    out, update_mask = Bottleneck(
        filters=self.planes, strides=self.strides, expansion=self.expansion,
        has_downsample=has_downsample, circular_pad=self.circular_pad,
        spectral=self.spectral, fold=self.fold, dtype=self.dtype,
        name='block0')(x, mask, train=train)
    n_tail = self.blocks - 1
    # Eval circular padding: wrap once per chunk of stride-1 bottlenecks
    # (each consumes 1 margin column/side; the mask rides along) instead
    # of one feature + one mask pad copy per block. Chunk caps the extra
    # conv width at ~12.5%.
    wrap = self.circular_pad and not train and n_tail > 0
    if wrap:
      width = out.shape[2]
      chunk = max(1, min(n_tail, width // 16))
      i = 1
      while i <= n_tail:
        g = min(chunk, n_tail - i + 1)
        out = wrap_width(out, g)
        update_mask = wrap_width(update_mask, g)
        for j in range(g):
          out, update_mask = Bottleneck(
              filters=self.planes, expansion=self.expansion,
              circular_pad=self.circular_pad, spectral=self.spectral,
              fold=self.fold, dtype=self.dtype, name=f'block{i + j}')(
                  out, update_mask, train=train, prewrapped=True)
        i += g
    else:
      for i in range(1, self.blocks):
        out, update_mask = Bottleneck(
            filters=self.planes, expansion=self.expansion,
            circular_pad=self.circular_pad, spectral=self.spectral,
            fold=self.fold, dtype=self.dtype, name=f'block{i}')(out, update_mask, train=train)
    return out, update_mask


class TransBasicBlock(nn.Module):
  """Residual block with optional transposed-conv upsampling."""
  inplanes: int
  planes: int
  strides: int = 1
  has_upsample: bool = False
  circular_pad: bool = False
  spectral: bool = False  # conv_fn == SpectralConv in the reference
  fold: bool = False
  dtype: Dtype = jnp.float32

  def _conv(self, features, **kw):
    if self.spectral:
      return SpectralConv(features, fold=self.fold, dtype=self.dtype, **kw)
    return Conv2D(features, dtype=self.dtype, **kw)

  @nn.compact
  def __call__(self, x, train: bool = False, prewrapped: bool = False):
    # prewrapped: x carries a wrapped width margin (wrap_width); the two
    # 3x3 convs consume one column per side each, and the residual is
    # cropped to match. Only valid for the stride-1 (non-convt) shape.
    assert not (prewrapped and self.strides != 1)
    residual = x[:, :, 2:-2] if prewrapped else x
    out = self._conv(self.inplanes, kernel_size=3, strides=1, padding='VALID',
                     use_bias=False, fused_pad=1, circular=self.circular_pad,
                     name='main_conv1')(x, train=train, prewrapped=prewrapped)
    out = SyncBatchNorm(dtype=self.dtype, name='main_bn1')(out, train=train)
    out = nn.relu(out)
    if self.has_upsample and self.strides != 1:
      out = Conv2DTranspose(self.planes, kernel_size=3, strides=self.strides,
                            padding='SAME', use_bias=False, dtype=self.dtype,
                            name='main_convt')(out)
    else:
      out = self._conv(self.planes, kernel_size=3, strides=self.strides,
                       padding='VALID', use_bias=False, fused_pad=1,
                       circular=self.circular_pad,
                       name='main_conv2')(out, train=train,
                                          prewrapped=prewrapped)
    out = SyncBatchNorm(dtype=self.dtype, name='main_bn2')(out, train=train)

    if self.has_upsample:
      if self.strides != 1:
        residual = Conv2DTranspose(self.planes, kernel_size=2,
                                   strides=self.strides, padding='VALID',
                                   use_bias=False, dtype=self.dtype,
                                   name='up_convt')(x)
      else:
        residual = self._conv(self.planes, kernel_size=1, strides=self.strides,
                              use_bias=False, name='up_conv')(residual,
                                                              train=train)
      residual = SyncBatchNorm(dtype=self.dtype, name='up_bn')(residual,
                                                               train=train)
    out = out + residual
    out = nn.relu(out)
    return out


class ResStackTranspose(nn.Module):
  """Stack of TransBasicBlocks, upsampling at the end (reference)."""
  inplanes: int
  planes: int
  blocks: int
  strides: int = 1
  circular_pad: bool = False
  spectral: bool = False
  fold: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    has_upsample = self.strides != 1 or self.inplanes != self.planes
    out = x
    n_stride1 = self.blocks - 1
    # Eval circular padding: wrap once per chunk of stride-1 blocks (each
    # consumes 2 margin columns/side) instead of 2 pad copies per block.
    # Chunk size caps the extra conv width at ~12.5% of the pano width.
    wrap = self.circular_pad and not train and n_stride1 > 0
    if wrap:
      width = x.shape[2]
      chunk = max(1, min(n_stride1, width // 32))
      i = 0
      while i < n_stride1:
        g = min(chunk, n_stride1 - i)
        out = wrap_width(out, 2 * g)
        for j in range(g):
          out = TransBasicBlock(
              inplanes=self.inplanes, planes=self.inplanes,
              circular_pad=self.circular_pad, spectral=self.spectral,
              fold=self.fold, dtype=self.dtype, name=f'block{i + j}')(out, train=train,
                                                      prewrapped=True)
        i += g
    else:
      for i in range(n_stride1):
        out = TransBasicBlock(
            inplanes=self.inplanes, planes=self.inplanes,
            circular_pad=self.circular_pad, spectral=self.spectral,
            fold=self.fold, dtype=self.dtype, name=f'block{i}')(out, train=train)
    out = TransBasicBlock(
        inplanes=self.inplanes, planes=self.planes, strides=self.strides,
        has_upsample=has_upsample, circular_pad=self.circular_pad,
        spectral=self.spectral, fold=self.fold, dtype=self.dtype,
        name=f'block{self.blocks - 1}')(out, train=train)
    return out
