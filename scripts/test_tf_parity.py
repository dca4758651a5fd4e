"""End-to-end TF->Flax checkpoint-conversion parity check.

Builds the *reference* generator under TF (tf_keras), saves a checkpoint
in the released-bundle format, converts it with
se3ds_tpu.train.tf_import.convert_tf_checkpoint, and compares forward
outputs (eval mode) between the reference TF model and this framework's
Flax model on the same inputs.

Covers the production grammar (configs/lowres/lowres.gin:29-33): the
generator at resnet_version '50' AND '101' (small gen_dims so CPU can
build it), and the discriminator at both the toy (n_layers=3) and the
production (n_dis=2, n_layers=6) depths. Asserts the fp32-achievable
tolerance (observed ~1e-7 max; asserted <= 1e-5, PARITY.md).

Also exercises scripts/convert_tf_checkpoint.py end-to-end (TF ckpt ->
CLI -> Orbax -> restore -> forward parity), see convert_cli_parity().

Run on CPU: JAX_PLATFORMS=cpu python scripts/test_tf_parity.py
Env: SE3DS_PARITY_GEN_VERSIONS (default "50,101"),
     SE3DS_PARITY_DIS_LAYERS (default "3,6"),
     SE3DS_PARITY_CLI (default "1": run the CLI round-trip case).
"""

import os

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np

TOLERANCE = 1e-5  # fp32-achievable; observed ~1e-7 (PARITY.md)


def generator_parity(version: str):
  import jax
  import jax.numpy as jnp
  import tensorflow as tf
  from _ref_tf import import_reference_models
  from se3ds_tpu.models import generator as gen_lib
  from se3ds_tpu.train import tf_import

  image_models = import_reference_models()

  size, gen_dims = 64, 4
  h, w = size, size * 2
  rng = np.random.RandomState(0)
  cond_np = {
      'proj_image': rng.rand(1, h, w, 3).astype(np.float32),
      'proj_depth': rng.rand(1, h, w, 1).astype(np.float32),
      'proj_mask': (rng.rand(1, h, w, 1) > 0.4).astype(np.float32),
      'blurred_mask': np.zeros((1, h, w, 1), np.float32),
  }

  # Reference model forward + checkpoint.
  tf_gen = image_models.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, z_dim=4, resnet_version=version)
  tf_inputs = {k: tf.constant(v) for k, v in cond_np.items()}
  tf_outs = tf_gen(inputs=[tf_inputs, None], training=False)
  tf_rgb = tf_outs[6].numpy()
  tf_depth = tf_outs[3].numpy()
  ckpt = tf.train.Checkpoint(ema_generator=tf_gen)
  ckpt_dir = tempfile.mkdtemp()
  ckpt_path = ckpt.save(os.path.join(ckpt_dir, 'ck'))
  print(f'[gen R{version}] reference forward + checkpoint done')

  # Flax model template + conversion.
  flax_gen = gen_lib.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, z_dim=4, resnet_version=version)
  cond = {k: jnp.asarray(v) for k, v in cond_np.items()}
  template = flax_gen.init(jax.random.PRNGKey(0), cond, train=False)
  variables = tf_import.convert_tf_checkpoint(ckpt_path, template)
  print(f'[gen R{version}] conversion resolved every leaf')

  outs = flax_gen.apply(variables, cond, train=False)
  jax_rgb = np.asarray(outs[6])
  jax_depth = np.asarray(outs[3])

  rgb_err = np.abs(jax_rgb - tf_rgb).max()
  depth_err = np.abs(jax_depth - tf_depth).max()
  print(f'[gen R{version}] max |rgb diff| = {rgb_err:.2e}, '
        f'max |depth diff| = {depth_err:.2e}')
  assert rgb_err < TOLERANCE, rgb_err
  assert depth_err < TOLERANCE, depth_err
  print(f'[gen R{version}] PARITY OK: converted checkpoint reproduces '
        'reference outputs')


def convert_cli_parity(version: str = '50'):
  """End-to-end proof of scripts/convert_tf_checkpoint.py: reference TF
  checkpoint -> CLI -> Orbax -> restore -> forward parity."""
  import jax
  import jax.numpy as jnp
  import tensorflow as tf
  from _ref_tf import import_reference_models
  import convert_tf_checkpoint as cli
  from se3ds_tpu.models import generator as gen_lib
  from se3ds_tpu.train import checkpoints

  image_models = import_reference_models()
  size, gen_dims = 64, 4
  h, w = size, size * 2
  rng = np.random.RandomState(2)
  cond_np = {
      'proj_image': rng.rand(1, h, w, 3).astype(np.float32),
      'proj_depth': rng.rand(1, h, w, 1).astype(np.float32),
      'proj_mask': (rng.rand(1, h, w, 1) > 0.4).astype(np.float32),
      'blurred_mask': np.zeros((1, h, w, 1), np.float32),
  }
  tf_gen = image_models.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, z_dim=4, resnet_version=version)
  tf_inputs = {k: tf.constant(v) for k, v in cond_np.items()}
  tf_rgb = tf_gen(inputs=[tf_inputs, None], training=False)[6].numpy()
  ckpt = tf.train.Checkpoint(ema_generator=tf_gen)
  ckpt_path = ckpt.save(os.path.join(tempfile.mkdtemp(), 'ck'))

  out_dir = os.path.join(tempfile.mkdtemp(), 'orbax')
  # Directory form of --tf_ckpt exercises resolve_ckpt_prefix too.
  cli.main(['--tf_ckpt', os.path.dirname(ckpt_path), '--output', out_dir,
            '--image_height', str(size), '--gen_dims', str(gen_dims),
            '--z_dim', '4', '--resnet_version', version])

  variables = checkpoints.restore_ema_generator(out_dir)
  flax_gen = gen_lib.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, z_dim=4, resnet_version=version)
  cond = {k: jnp.asarray(v) for k, v in cond_np.items()}
  jax_rgb = np.asarray(flax_gen.apply(variables, cond, train=False)[6])
  err = np.abs(jax_rgb - tf_rgb).max()
  print(f'[convert-cli R{version}] max |rgb diff| = {err:.2e}')
  assert err < TOLERANCE, err
  print(f'[convert-cli R{version}] CLI ROUND-TRIP PARITY OK')


def discriminator_parity(n_layers: int, n_dis: int = 2):
  import jax
  import jax.numpy as jnp
  import tensorflow as tf
  from _ref_tf import import_reference_models
  from se3ds_tpu.models import discriminator as disc_lib
  from se3ds_tpu.train import tf_import

  image_models = import_reference_models()
  dis_dims = 4
  rng = np.random.RandomState(1)
  x = rng.rand(2, 64, 128, 4).astype(np.float32)

  tf_d = image_models.SNMultiScaleDiscriminator(
      image_size=64, n_dis=n_dis, dis_dims=dis_dims, n_layers=n_layers)
  tf_out = tf_d(tf.constant(x))
  ckpt = tf.train.Checkpoint(discriminator=tf_d)
  ckpt_path = ckpt.save(os.path.join(tempfile.mkdtemp(), 'ck'))

  flax_d = disc_lib.SNMultiScaleDiscriminator(
      n_dis=n_dis, dis_dims=dis_dims, n_layers=n_layers)
  template = flax_d.init(jax.random.PRNGKey(0), jnp.asarray(x))
  variables = tf_import.convert_tf_checkpoint(
      ckpt_path, template, root='discriminator',
      path_map=tf_import.discriminator_path_map(n_layers))
  flax_out = flax_d.apply(variables, jnp.asarray(x))
  max_err = 0.0
  for sub_tf, sub_fx in zip(tf_out, flax_out):
    for a, b in zip(sub_tf, sub_fx):
      max_err = max(max_err, float(np.abs(a.numpy() - np.asarray(b)).max()))
  print(f'[dis n_layers={n_layers} n_dis={n_dis}] max |diff| = {max_err:.2e}')
  assert max_err < TOLERANCE, max_err
  print(f'[dis n_layers={n_layers} n_dis={n_dis}] DISCRIMINATOR PARITY OK')


def main():
  import jax
  if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
  versions = os.environ.get('SE3DS_PARITY_GEN_VERSIONS', '50,101')
  for version in [v for v in versions.split(',') if v]:
    generator_parity(version)
  layer_counts = os.environ.get('SE3DS_PARITY_DIS_LAYERS', '3,6')
  for n_layers in [int(v) for v in layer_counts.split(',') if v]:
    discriminator_parity(n_layers)
  if os.environ.get('SE3DS_PARITY_CLI', '1') == '1':
    convert_cli_parity()
  print('ALL PARITY CASES OK')


if __name__ == '__main__':
  main()
