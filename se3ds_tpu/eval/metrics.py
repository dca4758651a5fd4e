"""FID/RMSE evaluation with autoregressive rollout (reference
utils/eval_metric.py).

The rollout replicates the reference protocol exactly: a point-cloud
memory accumulates frames (frame 0: pole-masked ground truth; frames
t>0: the generator's own RGB output and predicted depth), each next frame
is conditioned on the memory splat at its pose, per-frame-index Inception
pools and depth RMSE are collected for frames 1..eval_seq_len-1.

TPU-native differences: the memory is a fixed-capacity buffer (static
shapes under jit, one compile for the whole rollout), and Inception
pooling runs on device in the same jit program.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se3ds_tpu import constants
from se3ds_tpu.eval import fid as fid_lib
from se3ds_tpu.eval import inception as inception_lib
from se3ds_tpu.ops import geometry

log = logging.getLogger('se3ds_tpu')


def _augment_crop_for_inception(images, rng):
  """Random roll + flip, then pole crop (reference eval_metric.py:118-119,
  245-246: indoor_datasets.augment + crop_pano).

  Op-for-op with the reference augment (indoor_datasets.py:34-61): the
  roll amount is a single scalar for the whole batch
  (`tf.random.uniform(())`, indoor_datasets.py:55-57) while the flip is
  drawn independently per image (`tf.image.random_flip_left_right` on a
  4-D batch flips each image independently, indoor_datasets.py:59-60).
  """
  k1, k2 = jax.random.split(rng)
  width = images.shape[2]
  roll = jax.random.randint(k1, (), -width // 2, width // 2)
  images = jnp.roll(images, roll, axis=2)
  flip = jax.random.bernoulli(k2, shape=(images.shape[0],))
  images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :],
                     images)
  return geometry.crop_pano(images, resize_to_original=False)


def rollout_generated(generator_apply: Callable,
                      variables: Any,
                      batch: Dict[str, jnp.ndarray],
                      eval_seq_len: int,
                      depth_scale: float,
                      predict_depth: bool = True,
                      splat_mode: str = 'sorted'):
  """Runs the autoregressive rollout; returns per-frame generated RGB and
  depth RMSE (reference eval_metric.py:144-252 inner step_fn).

  The default splat mode is 'sorted' — exact reference winner selection
  (min depth + 0.1 m window + per-channel max,
  point_cloud_utils.py:157-176) — so FID-parity eval reproduces the
  reference protocol; pass 'fast' to trade exactness for speed.

  Args:
    generator_apply: fn(variables, cond_dict) -> 7-output list.
    variables: generator variables.
    batch: video batch with image (N,T,H,W,3), depth (N,T,H,W,1),
      position (N,T,4), depth_scale (N,), dataset_type (N,).
    eval_seq_len: frames to roll out (<= T).
    depth_scale: metres.

  Returns:
    generated: dict frame_idx -> (N,H,W,3) for frames 0..eval_seq_len-1.
    rmse: dict frame_idx -> (N,) for frames 0..eval_seq_len-1.
    aux: dict of per-frame families for the eval image grid / PNG dumps
      (reference gan_manager.py:560-617): 'pred_depth' (the depth fed to
      memory — GT at frame 0, the generator's depth_out for frames > 0
      when predict_depth), 'projected' (splatted guidance RGB in [0,1]),
      'blurred_mask', 'proj_mask'; each frame_idx -> (N,H,W,C).
      Callers that only need RGB can ignore it — under jit, XLA dead-code
      eliminates unused outputs.
  """
  n, t, height, width, _ = batch['image'].shape
  capacity = eval_seq_len * height * width

  memory_coords = jnp.zeros((n, 4, capacity), jnp.float32)
  memory_feats = jnp.full((n, capacity, 3),
                          float(constants.INVALID_RGB_VALUE), jnp.float32)

  prev_rgb = jnp.zeros((n, height, width, 3), jnp.float32)
  depth_tensor = batch['depth'][:, 0]
  all_generated = {}
  all_rmse = {}
  aux = {'pred_depth': {}, 'projected': {}, 'blurred_mask': {},
         'proj_mask': {}}

  for frame_idx in range(eval_seq_len):
    target_depth = batch['depth'][:, frame_idx]
    rgb_tensor = batch['image'][:, frame_idx]
    if not predict_depth or frame_idx == 0:
      depth_tensor = batch['depth'][:, frame_idx]

    relative_position = batch['position'][:, frame_idx]
    # Live-extent splat: only frame_idx frames have been written; the
    # tail of the capacity buffer is void (splat-skipped), so slicing it
    # off is exact and keeps splat cost proportional to frames-so-far.
    extent = max(1, frame_idx) * height * width
    relative_coords = (memory_coords[:, :, :extent]
                       - relative_position[..., None])
    pred_depth, pred_rgb = geometry.project_feats_to_equirectangular(
        memory_feats[:, :extent], relative_coords, height, width,
        void_class=constants.INVALID_RGB_VALUE, depth_scale=depth_scale,
        splat_mode=splat_mode)
    pred_mask = ((pred_depth > 0) & (pred_depth < 1)
                 & jnp.all(pred_rgb != constants.INVALID_RGB_VALUE, axis=-1)
                 ).astype(jnp.float32)[..., None]
    pred_depth = pred_depth[..., None]
    pred_rgb = jnp.clip(pred_rgb / 255.0, 0.0, 1.0)
    blurred_mask = jnp.zeros_like(pred_depth)

    generator_inputs = {
        'prev_image': prev_rgb,
        'proj_image': pred_rgb,
        'proj_mask': pred_mask,
        'proj_depth': pred_depth,
        'blurred_mask': blurred_mask,
    }
    _, _, _, depth_out, _, _, generated = generator_apply(
        variables, generator_inputs)

    if frame_idx == 0:
      prev_rgb = rgb_tensor
      rgb_tensor = geometry.mask_pano(
          rgb_tensor, masked_region_value=constants.INVALID_RGB_VALUE)
    else:
      rgb_tensor = generated
      prev_rgb = generated
      if depth_out is not None and predict_depth:
        depth_tensor = depth_out

    # Grid/PNG families (reference gan_manager.py:520-556: pred_depth is
    # appended after the depth_tensor<-depth_out switch, so it is exactly
    # the depth that feeds the memory below).
    aux['pred_depth'][frame_idx] = depth_tensor
    aux['projected'][frame_idx] = pred_rgb
    aux['blurred_mask'][frame_idx] = blurred_mask
    aux['proj_mask'][frame_idx] = pred_mask

    # RMSE on the depth used for the memory (pred depth for frames > 0).
    target_mask = ((target_depth > 0) & (target_depth < 1)).astype(
        jnp.float32)
    depth_diff = (depth_tensor - target_depth)**2 * target_mask
    depth_diff = jnp.sum(depth_diff, axis=(1, 2, 3)) / jnp.maximum(
        jnp.sum(target_mask, axis=(1, 2, 3)), 1.0)
    all_rmse[frame_idx] = jnp.sqrt(depth_diff)

    # Unproject and write into the static memory window.
    pc_rgb = jnp.clip((rgb_tensor * 255).astype(jnp.int32),
                      constants.INVALID_RGB_VALUE, 255)
    xyz1, feats = geometry.equirectangular_to_pointcloud(
        pc_rgb, depth_tensor[..., 0],
        void_class=constants.INVALID_RGB_VALUE, depth_scale=depth_scale)
    xyz1 = xyz1 + relative_position[..., None]
    offset = frame_idx * height * width
    memory_coords = jax.lax.dynamic_update_slice(
        memory_coords, xyz1.astype(jnp.float32), (0, 0, offset))
    memory_feats = jax.lax.dynamic_update_slice(
        memory_feats, feats.astype(jnp.float32), (0, offset, 0))
    all_generated[frame_idx] = generated

  return all_generated, all_rmse, aux


class EvalMetric:
  """FID + RMSE evaluator (reference eval_metric.py:66-343)."""

  def __init__(self,
               ds_factory: Callable[[], Any],
               eval_num: int,
               batch_size: int,
               avg_num: int = 3,
               num_splits: int = 1,
               eval_seq_len: int = 5,
               depth_scale: float = constants.DEPTH_SCALE,
               predict_depth: bool = True,
               inception_variables=None,
               splat_mode: str = 'sorted',
               rng: Optional[jax.Array] = None):
    self.ds_factory = ds_factory
    self.eval_num = eval_num
    self.batch_size = batch_size
    self.avg_num = avg_num
    self.num_splits = num_splits
    self.eval_seq_len = eval_seq_len
    self.depth_scale = depth_scale
    self.predict_depth = predict_depth
    self.splat_mode = splat_mode
    self._rng = rng if rng is not None else jax.random.PRNGKey(0)
    self._inception_vars = (inception_variables
                            if inception_variables is not None
                            else inception_lib.init_variables())
    self._pool = self._get_real_pool_for_evaluation()

  def _next_rng(self):
    self._rng, out = jax.random.split(self._rng)
    return out

  @functools.cached_property
  def _real_pool_fn(self):
    @jax.jit
    def fn(images, rng):  # images: (N, T, H, W, 3)
      out = {}
      keys = jax.random.split(rng, self.eval_seq_len)
      for i in range(1, self.eval_seq_len):
        aug = _augment_crop_for_inception(images[:, i], keys[i])
        pool, _ = inception_lib.get_inception(aug, self._inception_vars)
        out[i] = pool
      return out
    return fn

  def _get_real_pool_for_evaluation(self):
    log.info('Get pool for %d samples', self.eval_num)
    n_iter = (self.eval_num // self.batch_size) + 1
    pools = {i: [] for i in range(1, self.eval_seq_len)}
    ds = self.ds_factory()
    for j in range(n_iter):
      try:
        batch = next(ds)
      except StopIteration:
        ds = self.ds_factory()
        batch = next(ds)
      vals = self._real_pool_fn(jnp.asarray(batch['original_image']),
                                self._next_rng())
      for i in range(1, self.eval_seq_len):
        pools[i].append(np.asarray(vals[i]))
      if j % 10 == 0:
        log.info('Real pool: %d / %d', j, n_iter)
    return {k: np.concatenate(v, 0)[:self.eval_num]
            for k, v in pools.items()}

  def _make_generated_pool_fn(self, generator_apply):
    @jax.jit
    def fn(variables, batch, rng):
      generated, rmse, _ = rollout_generated(
          generator_apply, variables, batch, self.eval_seq_len,
          self.depth_scale, self.predict_depth,
          splat_mode=self.splat_mode)
      pools, logits = {}, {}
      keys = jax.random.split(rng, self.eval_seq_len)
      for i in range(1, self.eval_seq_len):
        aug = _augment_crop_for_inception(generated[i], keys[i])
        pools[i], logits[i] = inception_lib.get_inception(
            aug, self._inception_vars)
      return pools, logits, rmse
    return fn

  def _get_generated_pool_for_evaluation(self, pool_fn, variables):
    n_iter = (self.eval_num // self.batch_size) + 1
    pools = {i: [] for i in range(1, self.eval_seq_len)}
    logits = {i: [] for i in range(1, self.eval_seq_len)}
    rmse = {i: [] for i in range(1, self.eval_seq_len)}
    ds = self.ds_factory()
    for j in range(n_iter):
      try:
        batch = next(ds)
      except StopIteration:
        ds = self.ds_factory()
        batch = next(ds)
      jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                if k in ('image', 'depth', 'position', 'depth_scale',
                         'dataset_type')}
      p, l, r = pool_fn(variables, jbatch, self._next_rng())
      for i in range(1, self.eval_seq_len):
        pools[i].append(np.asarray(p[i]))
        logits[i].append(np.asarray(l[i]))
        rmse[i].append(np.asarray(r[i]))
      if j % 10 == 0:
        log.info('Generated pool: %d / %d', j, n_iter)
    trim = lambda d: {k: np.concatenate(v, 0)[:self.eval_num]
                      for k, v in d.items()}
    return trim(pools), trim(logits), trim(rmse)

  def calculate_fid_score(self, generator_apply, variables):
    """Returns (fid, fid_std, rmse, inception_score) dicts keyed by frame
    index 1..T-1.

    Inception score uses the reference's split-KL formula
    (inception_utils.py:224-242) on the generated-pool softmax logits;
    the reference defines it but never wires it into the eval results —
    here it rides along with FID for free (SURVEY §6 'FID / IS').
    """
    pool_fn = self._make_generated_pool_fn(generator_apply)
    fid_list = {i: [] for i in range(1, self.eval_seq_len)}
    rmse_list = {i: [] for i in range(1, self.eval_seq_len)}
    is_list = {i: [] for i in range(1, self.eval_seq_len)}
    log.info('Calculate Generator Statistics')
    for _ in range(self.avg_num):
      generated_pool, logits, rmse_total = (
          self._get_generated_pool_for_evaluation(pool_fn, variables))
      for i in range(1, self.eval_seq_len):
        fid_list[i].append(
            fid_lib.calculate_fid(generated_pool[i], self._pool[i]))
        rmse_list[i].append(np.mean(rmse_total[i]))
        num_splits = max(1, min(10, logits[i].shape[0] // 2))
        is_list[i].append(
            fid_lib.calculate_inception_score(logits[i], num_splits)[0])
    fid = {k: float(np.mean(v)) for k, v in fid_list.items()}
    fid_std = {k: float(np.std(v)) for k, v in fid_list.items()}
    rmse = {k: float(np.mean(v)) for k, v in rmse_list.items()}
    inception_score = {k: float(np.mean(v)) for k, v in is_list.items()}
    return fid, fid_std, rmse, inception_score
