"""MP3D trajectory synthesis demo (reference MP3D trajectory notebook,
README.md:46).

Loads (or randomly initialises) an SE3DS model, seeds the point-cloud
memory with a source RGB-D pano, then autoregressively synthesises a
trajectory of target views, writing PNG frames and a .ply point cloud.

Usage:
  python examples/mp3d_trajectory_demo.py --out /tmp/se3ds_demo \
      [--ckpt data/se3ds_ckpt] [--height 512] [--frames 4]
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
  parser.add_argument('--out', default='/tmp/se3ds_demo')
  parser.add_argument('--ckpt', default=None)
  parser.add_argument('--height', type=int, default=256)
  parser.add_argument('--gen_dims', type=int, default=128)
  parser.add_argument('--resnet', default='101')
  parser.add_argument('--frames', type=int, default=4)
  parser.add_argument('--rgb', default=None, help='Source pano PNG path.')
  parser.add_argument('--depth', default=None,
                      help='Source 16-bit depth PNG path.')
  parser.add_argument('--fused', action='store_true',
                      help='Synthesise the whole trajectory with one '
                      'predict_trajectory call (single XLA program) '
                      'instead of per-frame host dispatch.')
  args = parser.parse_args()

  from se3ds_tpu.data import png as png_lib
  from se3ds_tpu.models import inference, model_config

  os.makedirs(args.out, exist_ok=True)
  config = model_config.SE3DSConfig(
      ckpt_path=args.ckpt, image_height=args.height, gen_dims=args.gen_dims,
      resnet_version=args.resnet, memory_frames=args.frames + 1)
  model = inference.SE3DSModel(config)

  h, w = args.height, args.height * 2
  rng = np.random.RandomState(0)
  if args.rgb:
    rgb = png_lib.decode_png(open(args.rgb, 'rb').read()).astype(np.int32)
    rgb = rgb[None]
  else:
    rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  if args.depth:
    depth = png_lib.decode_png(open(args.depth, 'rb').read())
    depth = (depth.astype(np.float32) / 65535.0)[None]
  else:
    depth = rng.uniform(0.05, 0.6, (1, h, w)).astype(np.float32)
  semantic = np.zeros((1, h, w, 1), np.int32)

  model.add_to_memory(rgb, semantic, depth, np.zeros((1, 3), np.float32))
  step = np.array([[0.4, 0.0, 0.0]], np.float32)

  def write_frame(i, frame, coverage):
    with open(os.path.join(args.out, f'frame_{i}.png'), 'wb') as f:
      f.write(png_lib.encode_png(frame))
    print(f'frame {i}: wrote {args.out}/frame_{i}.png '
          f'(guidance coverage {coverage:.3f})')

  if args.fused:
    positions = step[0] * np.arange(1, args.frames + 1)[:, None]
    traj = model.predict_trajectory(positions.astype(np.float32))
    masks = np.asarray(traj.proj_mask)
    for i in range(args.frames):
      write_frame(i, np.asarray(traj.pred_rgb[i, 0]), float(masks[i].mean()))
  else:
    position = np.zeros((1, 3), np.float32)
    for i in range(args.frames):
      position = position + step
      out = model(position, add_preds_to_memory=True)
      write_frame(i, np.asarray(out.pred_rgb[0]),
                  float(np.asarray(out.proj_mask).mean()))
  model.write_memory_as_pointcloud(os.path.join(args.out, 'memory.ply'))
  print(f'wrote {args.out}/memory.ply')


if __name__ == '__main__':
  main()
