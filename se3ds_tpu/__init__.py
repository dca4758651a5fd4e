"""SE3DS-TPU: a TPU-native JAX framework for indoor 3D scene synthesis.

Re-implements the capabilities of google-research/se3ds (arXiv 2204.02960)
with a TPU-first architecture: pure-functional Flax models, GSPMD data
parallelism over a `jax.sharding.Mesh`, static-shape point-cloud memory,
and fused splat kernels.
"""

__version__ = '0.1.0'
