"""Measures the fast-splat deviation AT THE GENERATOR OUTPUT.

`scripts/measure_fast_splat_deviation.py` quantifies how the default
`splat_mode='fast'` guidance differs from the exact reference rule
(/root/reference/utils/point_cloud_utils.py:157-176) at the GUIDANCE
level (18-23% of valid pixels on adversarial scenes). But the parity
claim is about the model's OUTPUT: this script runs both guidances
through the real generator on realistic (smooth-texture) overlapping
scenes and reports the predicted-RGB delta distribution, which is what
decides whether 'fast' stays the inference default
(SE3DSConfig.splat_mode).

Protocol: two room-like panos 0.5 m apart go into memory; the model
predicts at a third pose with splat_mode='fast' and splat_mode='scatter'
(exact) sharing IDENTICAL variables; outputs are compared as uint8 RGB.

Caveat (documented in PERF.md): the released MP3D checkpoint is not
present on this box (zero egress), so the generator runs with
spectrally-normalised random-init weights — per-layer Lipschitz ~1, the
same regime a trained SN-GAN generator operates in, but not the trained
filters themselves.

Usage: python scripts/measure_fast_output_deviation.py        # real chip
       JAX_PLATFORMS=cpu SE3DS_DEV_HEIGHT=64 SE3DS_DEV_GENDIMS=8 \
           SE3DS_DEV_RESNET=tiny python ...                   # CPU smoke
Env: SE3DS_DEV_HEIGHT (512), SE3DS_DEV_GENDIMS (128),
     SE3DS_DEV_RESNET (101), SE3DS_DEV_SEEDS (3),
     SE3DS_DEV_MODES (comma list vs 'scatter'; default 'fast,fast_exact').
"""

import json
import os
import sys

import jax
import numpy as np

if __name__ == '__main__':
  if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_fast_splat_deviation import make_room_pano  # noqa: E402
from se3ds_tpu.models import inference, model_config  # noqa: E402


def build_model(splat_mode, height, gen_dims, resnet, variables=None):
  cfg = model_config.SE3DSConfig(
      ckpt_path=None, image_height=height, gen_dims=gen_dims,
      resnet_version=resnet, memory_frames=2, compute_dtype='bfloat16',
      splat_mode=splat_mode)
  rng = jax.random.PRNGKey(0)
  return inference.SE3DSModel(cfg, variables=variables, rng=rng)


def predict(model, seed, height):
  """Two overlapping smooth-texture panos into memory; predict at a third
  pose. Returns (pred_rgb u8, proj_rgb u8, proj_mask) as numpy."""
  model.reset_memory()
  depth_scale = model.depth_scale
  positions = [np.zeros(3, np.float32),
               np.array([0.5, 0.2, 0.0], np.float32)]
  rng = np.random.RandomState(seed)
  for i, pos in enumerate(positions):
    rgb, depth = make_room_pano(height, seed * 16 + i, depth_scale,
                                texture='smooth')
    sem = rng.randint(1, 42, (1, height, height * 2, 1)).astype(np.int32)
    model.add_to_memory(rgb, sem, depth, pos[None])
  out = model(np.array([[0.25, 0.1, 0.0]], np.float32))
  return (np.asarray(out.pred_rgb), np.asarray(out.proj_rgb),
          np.asarray(out.proj_mask))


def measure(height, gen_dims, resnet, seeds, modes):
  exact = build_model('scatter', height, gen_dims, resnet)
  results = []
  for seed in seeds:
    ref_pred, ref_proj, ref_mask = predict(exact, seed, height)
    row = dict(seed=seed, height=height, gen_dims=gen_dims,
               guidance_coverage=round(float(ref_mask.mean()), 4))
    for mode in modes:
      model = build_model(mode, height, gen_dims, resnet,
                          variables=exact.variables)
      pred, proj, _ = predict(model, seed, height)
      # Guidance-level delta (context for the output-level one).
      gdiff = np.abs(proj.astype(np.int32) - ref_proj.astype(np.int32))
      # Output-level delta: the decision metric.
      odiff = np.abs(pred.astype(np.int32) - ref_pred.astype(np.int32))
      row[mode] = dict(
          guidance_pct_pixels_any_diff=round(
              100.0 * float((gdiff.max(axis=-1) > 0).mean()), 3),
          guidance_mean_abs=round(float(gdiff.mean()), 4),
          output_pct_pixels_any_diff=round(
              100.0 * float((odiff.max(axis=-1) > 0).mean()), 3),
          output_pct_pixels_diff_gt2=round(
              100.0 * float((odiff.max(axis=-1) > 2).mean()), 3),
          output_mean_abs=round(float(odiff.mean()), 4),
          output_p99_abs=int(np.percentile(odiff, 99)),
          output_max_abs=int(odiff.max()),
      )
    results.append(row)
  return results


if __name__ == '__main__':
  height = int(os.environ.get('SE3DS_DEV_HEIGHT', 512))
  gen_dims = int(os.environ.get('SE3DS_DEV_GENDIMS', 128))
  resnet = os.environ.get('SE3DS_DEV_RESNET', '101')
  seeds = list(range(int(os.environ.get('SE3DS_DEV_SEEDS', 3))))
  modes = os.environ.get('SE3DS_DEV_MODES', 'fast,fast_exact').split(',')
  for row in measure(height, gen_dims, resnet, seeds, modes):
    print(json.dumps(row))
