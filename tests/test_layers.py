"""Layer tests mirroring the reference test strategy (models/layers_test.py):
shape laws, masking semantics, golden padding tensors, partial-conv
equivalence with plain conv when mask is absent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3ds_tpu.models import layers


def test_pad2d_constant_golden():
  x = jnp.arange(1 * 2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 1)
  out = layers.pad2d(x, 1, circular_pad=False, train=True)
  expected = np.zeros((1, 4, 4, 1), np.float32)
  expected[0, 1:3, 1:3, 0] = np.arange(4).reshape(2, 2)
  np.testing.assert_array_equal(out, expected)


def test_pad2d_circular_eval_vs_train():
  x = jnp.arange(1 * 2 * 4 * 1, dtype=jnp.float32).reshape(1, 2, 4, 1)
  # train=True: circular disabled, zero padding.
  out_train = layers.pad2d(x, 1, circular_pad=True, train=True)
  assert float(out_train[0, 1, 0, 0]) == 0.0
  # train=False: width wraps.
  out_eval = layers.pad2d(x, 1, circular_pad=True, train=False)
  np.testing.assert_array_equal(out_eval[0, 1:3, 0, 0], x[0, :, -1, 0])
  np.testing.assert_array_equal(out_eval[0, 1:3, -1, 0], x[0, :, 0, 0])
  # Height is still zero padded.
  assert float(jnp.sum(jnp.abs(out_eval[0, 0]))) == 0.0


def test_pad2d_symmetric():
  x = jnp.arange(1 * 2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 1)
  out = layers.pad2d(x, 1, circular_pad=False, mode='SYMMETRIC', train=True)
  expected = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)),
                    mode='symmetric')
  np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize('kh,kw,strides,fused_pad,circular,train,prewrapped,padding', [
    (1, 1, 1, 0, False, False, False, 'SAME'),    # bottleneck conv1/conv3
    (1, 1, 2, 0, False, False, False, 'SAME'),    # strided downsample 1x1
    (3, 3, 1, 1, True, False, True, 'SAME'),      # prewrapped eval 3x3
    (3, 3, 1, 1, True, False, False, 'SAME'),     # circular eval 3x3
    (3, 3, 2, 1, True, True, False, 'SAME'),      # train 3x3 s2 (zero pad)
    (7, 7, 2, 3, True, False, False, 'SAME'),     # stem 7x7 s2 circular
    (7, 7, 2, 3, True, True, False, 'SAME'),      # stem 7x7 s2 train
    (3, 3, 1, 0, False, False, False, 'SAME'),    # non-fused SAME path
    (3, 3, 2, 0, False, False, False, 'SAME'),    # non-fused SAME s2
    (3, 3, 1, 0, False, False, False, 'VALID'),   # non-fused VALID path
])
def test_mask_window_sum_equals_ones_conv(kh, kw, strides, fused_pad,
                                          circular, train, prewrapped,
                                          padding):
  """mask_window_sum must be BITWISE equal to the ones-kernel conv it
  replaces (reference layers.py:152-163) on 0/1 masks, for every padding
  path PartialConv exercises. Sums of 0/1s are small exact integers, so
  equality is exact, not approximate — do not loosen."""
  rng = np.random.default_rng(42)
  mask = jnp.asarray(
      (rng.random((2, 12, 16, 1)) > 0.4).astype(np.float32))
  if prewrapped:
    mask = layers.wrap_width(mask, fused_pad)
  kernel = jnp.ones((kh, kw, 1, 1), mask.dtype)
  if fused_pad:
    ref = layers.circular_conv2d(mask, kernel, strides, fused_pad,
                                 circular, train, prewrapped=prewrapped)
  else:
    ref = layers._conv2d(mask, kernel, strides, padding.upper())
  got = layers.mask_window_sum(mask, kh, kw, strides, fused_pad=fused_pad,
                               circular=circular, train=train,
                               prewrapped=prewrapped, padding=padding)
  assert got.shape == ref.shape
  np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_partial_conv_equals_plain_conv_without_mask():
  """PartialConv with a full mask reduces to a plain convolution wherever
  the sliding window is fully covered (everywhere, with VALID padding)."""
  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(rng, (2, 8, 8, 3))
  pc = layers.PartialConv(4, kernel_size=3, strides=1, padding='VALID')
  variables = pc.init(rng, x)
  out, update_mask = pc.apply(variables, x)
  np.testing.assert_allclose(np.asarray(update_mask), 1.0)

  # Plain conv with the same kernel/bias.
  kernel = variables['params']['kernel']
  bias = variables['params']['bias']
  plain = jax.lax.conv_general_dilated(
      x, kernel, (1, 1), 'VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
  np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=1e-4)


def test_partial_conv_masked_pixel_invariance():
  """Editing a masked-out pixel must not change the output
  (reference layers_test.py:64-86)."""
  rng = jax.random.PRNGKey(1)
  x = jax.random.normal(rng, (1, 8, 8, 3))
  mask = jnp.ones((1, 8, 8, 1)).at[0, 4, 4, 0].set(0.0)
  pc = layers.PartialConv(4, kernel_size=3, strides=1, padding='SAME')
  variables = pc.init(rng, x, mask)
  out1, _ = pc.apply(variables, x, mask)
  x2 = x.at[0, 4, 4, :].set(1000.0)
  out2, _ = pc.apply(variables, x2, mask)
  np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_spectral_conv_normalises_kernel():
  rng = jax.random.PRNGKey(2)
  x = jax.random.normal(rng, (2, 8, 8, 3))
  sc = layers.SpectralConv(4, kernel_size=3)
  variables = sc.init(rng, x)
  out = sc.apply(variables, x)
  assert out.shape == (2, 8, 8, 4)
  # After many power iterations the effective kernel has top singular
  # value ~1.
  w = variables['params']['kernel'].reshape(-1, 4)
  u = variables['spectral']['u']
  for _ in range(50):
    w_norm, u, _ = layers.spectral_normalize(w, u)
  _, u_hat, sigma = layers.spectral_normalize(w, u)
  top_sv = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
  np.testing.assert_allclose(float(sigma[0, 0]), top_sv, rtol=1e-3)


def test_spectral_conv_updates_u_only_when_training():
  rng = jax.random.PRNGKey(3)
  x = jax.random.normal(rng, (1, 4, 4, 2))
  sc = layers.SpectralConv(3, kernel_size=3)
  variables = sc.init(rng, x)
  u0 = variables['spectral']['u']
  # train=False: no mutation requested -> same u.
  _ = sc.apply(variables, x, train=False)
  out, mutated = sc.apply(variables, x, train=True, mutable=['spectral'])
  assert not np.allclose(np.asarray(mutated['spectral']['u']), np.asarray(u0))


@pytest.mark.parametrize('strides,expected_hw', [(1, (8, 16)), (2, (4, 8))])
def test_res_stack_shapes(strides, expected_hw):
  rng = jax.random.PRNGKey(4)
  x = jax.random.normal(rng, (2, 8, 16, 8))
  mask = jnp.ones((2, 8, 16, 1))
  stack = layers.ResStack(inplanes=8, planes=4, blocks=2, strides=strides)
  variables = stack.init(rng, x, mask)
  out, update_mask = stack.apply(variables, x, mask)
  assert out.shape == (2,) + expected_hw + (16,)
  assert update_mask.shape == (2,) + expected_hw + (1,)


@pytest.mark.parametrize('strides,expected_hw', [(1, (8, 16)), (2, (16, 32))])
def test_res_stack_transpose_shapes(strides, expected_hw):
  rng = jax.random.PRNGKey(5)
  x = jax.random.normal(rng, (2, 8, 16, 8))
  stack = layers.ResStackTranspose(inplanes=8, planes=4, blocks=2,
                                   strides=strides)
  variables = stack.init(rng, x)
  out = stack.apply(variables, x)
  assert out.shape == (2,) + expected_hw + (4,)


def test_avg_pool_matches_tf_edge_normalisation():
  """TF avg_pool divides by the valid count at borders."""
  x = jnp.ones((1, 5, 5, 1))
  out = layers.avg_pool_3x3_stride2_same(x)
  np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_instance_norm_statistics():
  rng = jax.random.PRNGKey(6)
  x = jax.random.normal(rng, (2, 16, 16, 3)) * 5 + 2
  inorm = layers.InstanceNorm()
  variables = inorm.init(rng, x)
  out = inorm.apply(variables, x)
  m = np.asarray(jnp.mean(out, axis=(1, 2)))
  s = np.asarray(jnp.std(out, axis=(1, 2)))
  np.testing.assert_allclose(m, 0.0, atol=1e-4)
  np.testing.assert_allclose(s, 1.0, atol=1e-2)


@pytest.mark.parametrize('k,s', [(3, 1), (7, 2), (4, 2), (1, 1)])
@pytest.mark.parametrize('train', [True, False])
def test_circular_conv2d_matches_pad_then_valid(k, s, train):
  """Fused pad+conv (both the default and border-fixup eval variants) is
  bit-equal to explicit pad2d + VALID conv."""
  rng = np.random.RandomState(0)
  p = k // 2
  x = jnp.asarray(rng.rand(2, 16, 64, 5).astype(np.float32))
  kern = jnp.asarray(rng.rand(k, k, 5, 4).astype(np.float32))
  ref = layers._conv2d(
      layers.pad2d(x, p, circular_pad=True, train=train), kern, s, 'VALID')
  for fixup in (False, True):
    got = layers.circular_conv2d(x, kern, s, p, circular=True, train=train,
                                 border_fixup=fixup)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_wrap_once_chain_matches_per_conv_circular_pads():
  """wrap_width(m) + m prewrapped convs == m circular pad+VALID convs,
  bit-equal, including interleaved elementwise nonlinearities (the
  OutputHead/GlobalContext eval fast path)."""
  rng = np.random.RandomState(3)
  x = jnp.asarray(rng.randn(2, 8, 16, 4).astype(np.float32))
  kernels = [jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.2)
             for _ in range(3)]

  ref = x
  for k in kernels:
    ref = layers.circular_conv2d(ref, k, 1, pad=1, circular=True,
                                 train=False)
    ref = jax.nn.leaky_relu(ref, 0.3)

  out = layers.wrap_width(x, 3)
  for k in kernels:
    out = layers.circular_conv2d(out, k, 1, pad=1, circular=True,
                                 train=False, prewrapped=True)
    out = jax.nn.leaky_relu(out, 0.3)

  assert out.shape == ref.shape
  np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_output_head_eval_width_preserved():
  """OutputHead's wrap-once eval path returns the unwrapped width."""
  from se3ds_tpu.models import generator as gen_lib
  head = gen_lib.OutputHead(hidden_dims=4, out_channels=3,
                            circular_pad=True)
  x = jnp.ones((1, 8, 16, 4))
  v = head.init(jax.random.PRNGKey(0), x, train=False)
  out_eval = head.apply(v, x, train=False)
  out_train = head.apply(v, x, train=True,
                         mutable=['batch_stats', 'spectral'])[0]
  assert out_eval.shape == (1, 8, 16, 3)
  assert out_train.shape == (1, 8, 16, 3)


def test_wrap_once_margin_wider_than_pano():
  """Chains longer than the pano width (tiny bottlenecks) still match
  per-conv circular pads — the mod-gather path."""
  rng = np.random.RandomState(4)
  x = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
  kernels = [jnp.asarray(rng.randn(3, 3, 3, 3).astype(np.float32) * 0.2)
             for _ in range(4)]
  ref = x
  for k in kernels:
    ref = layers.circular_conv2d(ref, k, 1, pad=1, circular=True,
                                 train=False)
  out = layers.wrap_width(x, 4)
  for k in kernels:
    out = layers.circular_conv2d(out, k, 1, pad=1, circular=True,
                                 train=False, prewrapped=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_trans_basic_block_prewrapped_matches_circular():
  """Stride-1 TransBasicBlock on a wrapped input (prewrapped=True) equals
  the per-conv circular-pad path, bit-equal."""
  block = layers.TransBasicBlock(inplanes=6, planes=6, circular_pad=True)
  rng = np.random.RandomState(5)
  x = jnp.asarray(rng.randn(2, 8, 16, 6).astype(np.float32))
  v = block.init(jax.random.PRNGKey(0), x, train=False)
  ref = block.apply(v, x, train=False)
  out = block.apply(v, layers.wrap_width(x, 2), train=False, prewrapped=True)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_res_stack_transpose_wrap_chunks_match_blockwise():
  """ResStackTranspose's chunked wrap-once eval path equals chaining the
  same blocks with per-conv circular pads (same params)."""
  stack = layers.ResStackTranspose(inplanes=6, planes=6, blocks=3,
                                   strides=1, circular_pad=True)
  rng = np.random.RandomState(6)
  # Width 16 < 32 -> chunk 1, exercising the re-wrap-every-block path;
  # width 72 >= 64 -> chunk 2, exercising multi-block chunks.
  for width in (16, 72):
    x = jnp.asarray(rng.randn(1, 8, width, 6).astype(np.float32))
    v = stack.init(jax.random.PRNGKey(1), x, train=False)
    out = stack.apply(v, x, train=False)

    def block_vars(i):
      return {c: {'__d': v[c][f'block{i}']}['__d'] for c in v
              if f'block{i}' in v[c]}

    ref = x
    for i in range(2):
      blk = layers.TransBasicBlock(inplanes=6, planes=6, circular_pad=True)
      ref = blk.apply(block_vars(i), ref, train=False)
    last = layers.TransBasicBlock(inplanes=6, planes=6, strides=1,
                                  has_upsample=False, circular_pad=True)
    ref = last.apply(block_vars(2), ref, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_res_stack_wrap_chunks_match_blockwise():
  """ResStack's chunked wrap-once eval path (features AND mask) equals
  chaining the same bottlenecks with per-conv circular pads."""
  stack = layers.ResStack(inplanes=8, planes=2, blocks=3, strides=1,
                          circular_pad=True)
  rng = np.random.RandomState(8)
  for width in (16, 72):
    x = jnp.asarray(rng.randn(1, 8, width, 8).astype(np.float32))
    mask = jnp.asarray(
        (rng.rand(1, 8, width, 1) > 0.3).astype(np.float32))
    v = stack.init(jax.random.PRNGKey(2), x, mask, train=False)
    out, out_mask = stack.apply(v, x, mask, train=False)

    def block_vars(i):
      return {c: v[c][f'block{i}'] for c in v if f'block{i}' in v[c]}

    ref, ref_mask = layers.Bottleneck(
        filters=2, strides=1, has_downsample=False,
        circular_pad=True).apply(block_vars(0), x, mask, train=False)
    for i in (1, 2):
      ref, ref_mask = layers.Bottleneck(
          filters=2, circular_pad=True).apply(block_vars(i), ref, ref_mask,
                                              train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))
