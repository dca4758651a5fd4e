"""Misc math utilities (reference utils/utils.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def create_label_colormap() -> np.ndarray:
  """Bit-shift label colormap for up to 256 labels (utils.py:24-41)."""
  colormap = np.zeros((256, 3), dtype=int)
  ind = np.arange(256, dtype=int)
  for shift in reversed(range(8)):
    for channel in range(3):
      colormap[:, channel] |= ((ind >> channel) & 1) << shift
    ind >>= 3
  return colormap


def cmap_to_label(image_tensor, cmap) -> np.ndarray:
  """Inverse of create_label_colormap (utils.py:44-56)."""
  rgb_equal = np.all(np.asarray(image_tensor)[..., None, :] == cmap, axis=-1)
  return np.argmax(rgb_equal, axis=-1)


def compute_kl(mu1, logvar1, mu2, logvar2) -> jnp.ndarray:
  """KL(P||Q) for diagonal Gaussians (utils.py:59-85)."""
  if not mu1.shape == logvar1.shape == mu2.shape == logvar2.shape:
    raise ValueError('Arguments to compute KLD should have the same shape.')
  sigma1 = jnp.exp(0.5 * logvar1)
  sigma2 = jnp.exp(0.5 * logvar2)
  return (jnp.log(sigma2 / sigma1)
          + (jnp.exp(logvar1) + (mu1 - mu2)**2) / (2 * jnp.exp(logvar2))
          - 0.5)


def reparameterize(rng, mu, logvar) -> jnp.ndarray:
  """Reparameterisation trick with explicit PRNG (utils.py:88-92)."""
  sigma = jnp.exp(0.5 * logvar)
  eps = jax.random.normal(rng, sigma.shape, dtype=mu.dtype)
  return eps * sigma + mu


def _divide_no_nan(a, b):
  return jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b))


def compute_sequence_iou(one_hot_pred, one_hot_true, mask,
                         spatial_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Masked per-frame mIoU over (N, T, H, W, C) one-hots (utils.py:95-126)."""
  if spatial_mask is None:
    spatial_mask = jnp.ones_like(one_hot_pred)[..., 0]
  intersect = jnp.sum(
      one_hot_pred * one_hot_true * spatial_mask[..., None], axis=(2, 3, 4))
  union = jnp.sum(
      (one_hot_pred + one_hot_true) * spatial_mask[..., None],
      axis=(2, 3, 4)) - intersect
  seq_iou = _divide_no_nan(intersect * mask, union * mask)
  mask_length = jnp.sum(mask, axis=1)
  mean_iou = _divide_no_nan(jnp.sum(seq_iou, axis=1), mask_length)
  return seq_iou, jnp.mean(mean_iou)


def compute_sequence_accuracy(class_pred, class_gt, mask,
                              spatial_mask=None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Masked per-frame accuracy over (N, T, H, W) labels (utils.py:129-157)."""
  if spatial_mask is None:
    spatial_mask = jnp.ones_like(class_pred)
  equal = (class_pred == class_gt).astype(spatial_mask.dtype) * spatial_mask
  seq_accuracy = _divide_no_nan(
      jnp.sum(equal, axis=(2, 3)).astype(jnp.float32),
      jnp.sum(spatial_mask, axis=(2, 3)).astype(jnp.float32))
  mask_length = jnp.sum(mask, axis=1)
  mean_accuracy = _divide_no_nan(jnp.sum(seq_accuracy, axis=1), mask_length)
  return seq_accuracy, jnp.mean(mean_accuracy)


def nearest_neighbor_inpaint(image, void_class: int = 0) -> jnp.ndarray:
  """Fills void pixels with the nearest non-void value (utils.py:160-181).

  Static-shape formulation: instead of gathering variable-length
  nonzero/zero coordinate lists, computes for every pixel the argmin
  distance over all non-void pixels (masked). O(P^2) like the reference.
  """
  image = jnp.asarray(image)

  def one(img):
    h, w = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing='ij')
    coords = jnp.stack([ys.reshape(-1), xs.reshape(-1)], -1)  # (P, 2)
    flat = img.reshape(-1)
    nonzero = flat != void_class
    d2 = jnp.sum((coords[:, None, :] - coords[None, :, :])**2, -1)
    # Rows: source (non-void); mask void sources with +inf.
    d2 = jnp.where(nonzero[:, None], d2, jnp.inf)
    closest = jnp.argmin(d2, axis=0)  # for each target pixel
    filled = jnp.where(nonzero, flat, flat[closest])
    return filled.reshape(h, w)

  return jax.vmap(one)(image)


def get_local_ckpt_path(ckpt_path: str) -> str:
  """Copies a checkpoint to the working directory (utils.py:184-194)."""
  import glob
  import os
  import shutil
  glob_path = ckpt_path + '*'
  if os.path.isdir(ckpt_path):
    glob_path = os.path.join(ckpt_path, '*')
  for path in glob.glob(glob_path):
    local_path = path.split('/')[-1]
    if not os.path.exists(local_path):
      if os.path.isdir(path):
        shutil.copytree(path, local_path)
      else:
        shutil.copy(path, local_path)
  return ckpt_path.split('/')[-1]
