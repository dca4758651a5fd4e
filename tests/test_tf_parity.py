"""Checkpoint-conversion parity against the live TF reference.

Runs scripts/test_tf_parity.py in a subprocess (TF must own its process:
importing TF after jax-on-CPU in-process is fine, but keras state is
cleaner isolated). Skipped when TF/tf_keras are unavailable.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get('SE3DS_SKIP_SLOW') == '1',
                    reason='slow TF parity test')
def test_reference_checkpoint_conversion_parity():
  pytest.importorskip('tensorflow')
  pytest.importorskip('tf_keras')
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  env['TF_USE_LEGACY_KERAS'] = '1'
  result = subprocess.run(
      [sys.executable, os.path.join(REPO, 'scripts', 'test_tf_parity.py')],
      capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
  assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
  assert 'PARITY OK' in result.stdout
  assert 'DISCRIMINATOR PARITY OK' in result.stdout
