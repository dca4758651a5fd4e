"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere.
"""

import os

# Force CPU for tests (the ambient environment points JAX at the tunneled
# TPU, which makes every jit compile cross the tunnel). Set SE3DS_TEST_TPU=1
# to run the suite against the real chip.
if not os.environ.get('SE3DS_TEST_TPU'):
  os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get('SE3DS_TEST_TPU'):
  # The axon sitecustomize force-registers the TPU backend regardless of
  # JAX_PLATFORMS; override via the config API before any computation.
  import jax
  jax.config.update('jax_platforms', 'cpu')
