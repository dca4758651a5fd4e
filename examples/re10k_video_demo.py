"""RE10K perspective video synthesis demo (reference
notebooks/SE3DS_RE10K_Colab.ipynb cells 10/15/17).

Pipeline: perspective RGB + (inverse) depth -> project to equirectangular
-> unproject to point cloud -> splat at a new camera pose -> generator
inpaints -> extract perspective view.
"""

import argparse
import os
import sys

# Runnable as `python examples/<demo>.py` from anywhere: put the repo
# root (the parent of examples/) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--out', default='/tmp/se3ds_re10k_demo')
  parser.add_argument('--ckpt', default=None)
  parser.add_argument('--height', type=int, default=256)
  parser.add_argument('--gen_dims', type=int, default=128)
  parser.add_argument('--frames', type=int, default=3)
  args = parser.parse_args()

  import jax.numpy as jnp
  from se3ds_tpu.data import png as png_lib
  from se3ds_tpu.models import inference, model_config
  from se3ds_tpu.ops import geometry

  os.makedirs(args.out, exist_ok=True)
  config = model_config.SE3DSConfig(
      ckpt_path=args.ckpt, image_height=args.height, gen_dims=args.gen_dims,
      resnet_version='101', use_blurred_mask=False,
      memory_frames=args.frames + 1,
      # RE10K panos are written unmasked (mask_blurred=False below), so
      # the pole-compacted RGB layout does not apply.
      pole_compact=False)
  model = inference.SE3DSModel(config)

  # Synthetic perspective source (stand-in for an RE10K frame + MiDaS
  # depth; swap in real data via PNG paths as needed).
  rng = np.random.RandomState(0)
  ph, pw = args.height, args.height
  persp_rgb = rng.randint(0, 256, (ph, pw, 3)).astype(np.float32)
  persp_depth = rng.uniform(0.1, 0.5, (ph, pw, 1)).astype(np.float32)

  fov = jnp.array([0.8, 0.8])
  pano_rgb = geometry.project_perspective_image(
      jnp.asarray(persp_rgb), fov, output_height=args.height,
      pad_value=-1.0)
  pano_depth = geometry.project_perspective_image(
      jnp.asarray(persp_depth), fov, output_height=args.height,
      pad_value=0.0)[..., 0]

  rgb = np.clip(np.asarray(pano_rgb), 0, 255).astype(np.int32)[None]
  depth = np.clip(np.asarray(pano_depth), 0, 1)[None]
  semantic = np.zeros((1, args.height, args.height * 2, 1), np.int32)
  model.add_to_memory(rgb, semantic, depth, np.zeros((1, 3), np.float32),
                      mask_blurred=False)

  position = np.zeros((1, 3), np.float32)
  for i in range(args.frames):
    position = position + np.array([[0.1, 0.05, 0.0]], np.float32)
    out = model(position, add_preds_to_memory=True)
    pano = np.asarray(out.pred_rgb[0]).astype(np.float32)
    persp = geometry.get_perspective_from_equirectangular_image(
        jnp.asarray(pano), jnp.eye(3) * np.array([[pw, ph, 1.0]]).T,
        jnp.eye(3), height=ph, width=pw)
    frame = np.clip(np.asarray(persp), 0, 255).astype(np.uint8)
    with open(os.path.join(args.out, f'persp_{i}.png'), 'wb') as f:
      f.write(png_lib.encode_png(frame))
    print(f'frame {i}: wrote {args.out}/persp_{i}.png')


if __name__ == '__main__':
  main()
