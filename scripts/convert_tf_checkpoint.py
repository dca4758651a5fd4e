"""One-command converter: released SE3DS TF checkpoint -> Orbax.

Takes a reference `tf.train.Checkpoint` bundle (the released 17 GB
`mp3d_ckpt` / `re10k_ckpt` format, reference README.md:27-39 +
models/models.py:100-104) and writes a TF-free Orbax checkpoint that
`SE3DSConfig.ckpt_path` / `train.checkpoints.restore_ema_generator`
loads directly.

Memory-bounded by construction: the variable template is built with
`jax.eval_shape` (no arrays, no model compute), and the TF checkpoint
reader materialises tensors one at a time — peak RSS is ~the size of
the CONVERTED branch (the ~4.4 GB ema_generator at gen_dims=128), not
the 17 GB bundle. The measured peak is printed at the end.

Usage (``--tf_ckpt`` takes a dir or a ckpt prefix)::

  python scripts/convert_tf_checkpoint.py --tf_ckpt /data/mp3d_ckpt \
      --output /data/se3ds_ckpt_orbax

  # RE10K bundle: add --no_blurred_mask

Model-shape flags default to the released production grammar
(image_height=512, gen_dims=128, resnet_version=101 — reference
model_config.py:22-52); override them only for non-release checkpoints.
Numerical parity of the conversion is proven by scripts/test_tf_parity.py
(<= 1e-5 asserted, ~1e-7 observed) and the CLI round-trip is exercised
end-to-end by convert_cli_parity() in that script.
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
  p.add_argument('--tf_ckpt', required=True,
                 help='TF checkpoint prefix (e.g. .../ckpt-100) or a '
                      'directory containing a `checkpoint` state file '
                      '(the extracted released tar).')
  p.add_argument('--output', required=True,
                 help='Output Orbax checkpoint directory (created; must '
                      'not already exist).')
  p.add_argument('--root', default='ema_generator',
                 choices=['ema_generator', 'generator'],
                 help='Checkpoint object branch to convert (inference '
                      'restores ema_generator, reference models.py:100-104).')
  p.add_argument('--image_height', type=int, default=512)
  p.add_argument('--gen_dims', type=int, default=128)
  p.add_argument('--z_dim', type=int, default=32)
  p.add_argument('--resnet_version', default='101')
  p.add_argument('--no_blurred_mask', action='store_true',
                 help='RE10K grammar: the generator input has no '
                      'blurred-mask channel (model_config.py:45-52).')
  return p.parse_args(argv)


def resolve_ckpt_prefix(path: str) -> str:
  """Accepts a checkpoint prefix or a directory (uses the latest)."""
  if os.path.isdir(path):
    import tensorflow as tf  # Conversion-time only.
    latest = tf.train.latest_checkpoint(path)
    if latest is None:
      raise SystemExit(
          f'{path} is a directory but contains no TF checkpoint state '
          '(no `checkpoint` file). Pass the ckpt prefix directly, e.g. '
          f'{path}/ckpt-100.')
    return latest
  return path


def main(argv=None):
  args = parse_args(argv)
  if os.path.exists(args.output):
    raise SystemExit(f'--output {args.output} already exists; refusing to '
                     'overwrite.')
  os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
  import jax
  if jax.default_backend() != 'cpu':
    # Conversion is a host job; keep the arrays off any accelerator.
    jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  from se3ds_tpu.models import generator as gen_lib
  from se3ds_tpu.train import checkpoints, tf_import

  ckpt_prefix = resolve_ckpt_prefix(args.tf_ckpt)
  print(f'[convert] TF checkpoint: {ckpt_prefix}')

  h, w = args.image_height, args.image_height * 2
  model = gen_lib.ResNetGenerator(
      image_size=args.image_height, gen_dims=args.gen_dims,
      z_dim=args.z_dim, resnet_version=args.resnet_version,
      use_blurred_mask=not args.no_blurred_mask)
  cond = {
      'proj_image': jnp.zeros((1, h, w, 3)),
      'proj_depth': jnp.zeros((1, h, w, 1)),
      'proj_mask': jnp.zeros((1, h, w, 1)),
      'blurred_mask': jnp.zeros((1, h, w, 1)),
  }
  # Abstract template: shapes/dtypes only, no init compute, no arrays.
  template = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0), cond, train=False))
  import numpy as np
  n_params = sum(
      int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(template))
  print(f'[convert] template: {n_params:,} values '
        f'(R{args.resnet_version}, gen_dims={args.gen_dims}, '
        f'{w}x{h})')

  t0 = time.perf_counter()
  variables = tf_import.convert_tf_checkpoint(
      ckpt_prefix, template, root=args.root)
  print(f'[convert] every leaf resolved in {time.perf_counter() - t0:.1f}s')

  checkpoints.save_ema_generator(args.output, variables)
  peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
  print(f'[convert] wrote {os.path.abspath(args.output)}')
  print(f'[convert] peak RSS {peak_gb:.2f} GB')
  print('[convert] load with: SE3DSConfig(ckpt_path='
        f'{os.path.abspath(args.output)!r}, '
        f'gen_dims={args.gen_dims}, image_height={args.image_height}, '
        f'resnet_version={args.resnet_version!r})')


if __name__ == '__main__':
  main()
