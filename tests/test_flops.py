"""Tests for the analytic FLOP counter (utils/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from se3ds_tpu.utils import flops as flops_lib


def test_dense_matmul_flops_exact():
  a = jnp.zeros((64, 128))
  b = jnp.zeros((128, 32))
  f = flops_lib.count_flops(lambda x, y: x @ y, a, b)
  assert f == 2 * 64 * 128 * 32


def test_conv_flops_exact():
  x = jnp.zeros((2, 8, 16, 4))
  k = jnp.zeros((3, 3, 4, 10))
  def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  f = flops_lib.count_flops(conv, x, k)
  # out: (2, 8, 16, 10); MACs/output = 3*3*4.
  assert f == 2 * (2 * 8 * 16 * 10) * (3 * 3 * 4)


def test_scan_multiplies_by_length():
  a = jnp.zeros((16, 16))
  def step(carry, _):
    return carry @ a, None
  def scanned(x):
    out, _ = jax.lax.scan(step, x, None, length=5)
    return out
  f = flops_lib.count_flops(scanned, jnp.zeros((16, 16)))
  assert f == 5 * 2 * 16 * 16 * 16


def test_generator_forward_flops_scale():
  """Generator FLOPs scale ~4x with gen_dims doubling (conv-dominated)."""
  from se3ds_tpu.models import generator as gen_lib
  def fwd_flops(dims):
    m = gen_lib.ResNetGenerator(image_size=32, gen_dims=dims, z_dim=4,
                                resnet_version='tiny')
    cond = {
        'proj_image': jnp.zeros((1, 32, 64, 3)),
        'proj_depth': jnp.zeros((1, 32, 64, 1)),
        'proj_mask': jnp.ones((1, 32, 64, 1)),
        'blurred_mask': jnp.zeros((1, 32, 64, 1)),
    }
    v = m.init(jax.random.PRNGKey(0), cond, train=False)
    return flops_lib.count_flops(
        lambda vv, cc: m.apply(vv, cc, train=False), v, cond)
  f8, f16 = fwd_flops(8), fwd_flops(16)
  assert f8 > 0
  assert 3.0 < f16 / f8 < 4.5
