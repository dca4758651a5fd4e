"""Hyperparameter sweep definition for the lowres config (reference
configs/lowres/sweep.py — an XManager-style seed sweep stub)."""

import itertools


def get_sweep():
  """Returns a list of gin-binding dicts, one per trial."""
  seeds = [0, 1, 2]
  sweep = []
  for (seed,) in itertools.product(seeds):
    sweep.append({'GAN.seed': seed})
  return sweep


if __name__ == '__main__':
  for i, trial in enumerate(get_sweep()):
    bindings = ' '.join(f'--gin_bindings="{k} = {v}"'
                        for k, v in trial.items())
    print(f'# trial {i}\npython main.py --model_dir=/tmp/model_{i} '
          f'--gin_config=configs/lowres/lowres.gin --mode=TRAIN {bindings}')
