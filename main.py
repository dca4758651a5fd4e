"""Starts training and (possibly) evaluation jobs.

CLI parity with the reference main.py (flags --model_dir --mode
--gin_config --gin_bindings); the reference's --workdir/--model_dir
mismatch in train.sh/test.sh is fixed by accepting both.
"""

import argparse
import enum
import logging


class Mode(enum.Enum):
  TRAIN = 'TRAIN'
  TEST = 'TEST'
  TEST_UNSEEN = 'TEST_UNSEEN'


def main():
  parser = argparse.ArgumentParser(description='SE3DS-TPU launcher')
  parser.add_argument('--model_dir', '--workdir', dest='model_dir',
                      required=True, help='Directory to save the model in.')
  parser.add_argument('--mode', default='TRAIN',
                      choices=[m.value for m in Mode] + [
                          m.value.lower() for m in Mode])
  parser.add_argument('--gin_config', action='append', default=[],
                      help='Paths to gin config files.')
  parser.add_argument('--gin_bindings', action='append', default=[],
                      help='Individual gin bindings.')
  parser.add_argument('--use_tpu', action='store_true',
                      help='Kept for surface parity; device selection is '
                           'automatic under JAX.')
  parser.add_argument('--platform', default='auto',
                      choices=['auto', 'cpu', 'tpu'],
                      help='Force a JAX platform (the TPU-native analogue '
                           'of the reference strategy pick, main.py:48-63). '
                           '"auto" uses whatever JAX finds.')
  args = parser.parse_args()

  logging.basicConfig(level=logging.INFO)

  import jax
  if args.platform != 'auto':
    # Must happen before the backend initialises; env vars alone are
    # ignored by some site configurations (see tests/conftest.py).
    jax.config.update('jax_platforms', args.platform)

  from se3ds_tpu import config as config_lib
  from se3ds_tpu.train import trainer as trainer_lib

  config_lib.parse_config_files_and_bindings(args.gin_config,
                                             args.gin_bindings)
  logging.info('JAX devices: %s', jax.devices())

  mode = Mode(args.mode.upper())
  if mode is Mode.TRAIN:
    model = config_lib.apply_config('GAN', model_dir=args.model_dir)
    model.train()
  elif mode is Mode.TEST:
    model = config_lib.apply_config('GAN', model_dir=args.model_dir)
    model.test()
  elif mode is Mode.TEST_UNSEEN:
    model = config_lib.apply_config('GAN', model_dir=args.model_dir,
                                    test_split='val_unseen')
    model.test()


if __name__ == '__main__':
  main()
