"""Stateful pretrained-model inference API (reference models/models.py).

TPU-native redesign of the reference `SE3DSModel`: the point-cloud memory
is a *fixed-capacity* buffer (capacity = memory_frames * H * W points) with
a write cursor, instead of the reference's unboundedly-growing `tf.concat`
(models.py:239-245). Every frame writes exactly H*W slots; invalid points
keep their void feature value, which the z-buffer splat skips, so no
compaction is needed and every shape stays static under `jit`. The
reference's void-point *filtering* (models.py:229-237) thereby becomes a
no-op semantically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se3ds_tpu import constants
from se3ds_tpu.models import generator as generator_lib
from se3ds_tpu.models import model_config
from se3ds_tpu.ops import geometry


class PanoData(NamedTuple):
  """Data corresponding to a Matterport3D panorama
  (reference models.py:26-39).

  position: (3,) float xyz coordinates.
  rgb: (H, W, 3) int32 RGB panorama.
  semantic: (H, W) int32 semantic segmentation panorama.
  depth: (H, W) float32 depth in [0, 1].
  """
  position: jnp.ndarray
  rgb: jnp.ndarray
  semantic: jnp.ndarray
  depth: jnp.ndarray


class MemoryState(NamedTuple):
  """Fixed-capacity point-cloud memory.

  coords: (N, 4, CAP) float32 homogeneous coordinates (semantic cloud).
  feats: (N, CAP, 1) float32 semantic features (void == INVALID_SEM_VALUE).
  rgb_coords: (N, 4, CAP) float32 homogeneous coordinates (RGB cloud).
  rgb: (N, CAP, 3) float32 RGB features in [0, 255] (void == -1).
  cursor: () int32 number of slots written.
  """
  coords: jnp.ndarray
  feats: jnp.ndarray
  rgb_coords: jnp.ndarray
  rgb: jnp.ndarray
  cursor: jnp.ndarray


class OutputData(NamedTuple):
  """Prediction outputs (reference models.py:40-74).

  The last five fields are navigation-graph vestiges the reference
  declares but never populates in this release (models.py:70-74 —
  nothing in the repo writes them); they exist here so client code
  ported from the reference can read them (always None).
  """
  proj_semantic: jnp.ndarray
  pred_semantic: jnp.ndarray
  proj_rgb: jnp.ndarray
  pred_rgb: jnp.ndarray
  proj_depth: jnp.ndarray
  pred_depth: jnp.ndarray
  mu: jnp.ndarray
  logvar: jnp.ndarray
  proj_mask: Optional[jnp.ndarray] = None
  heading_enc: Optional[np.ndarray] = None
  pitch_enc: Optional[np.ndarray] = None
  features_enc: Optional[np.ndarray] = None
  predicted_bucket_probs: Optional[jnp.ndarray] = None
  predicted_node_xyz: Optional[list] = None


def init_memory(batch_size: int, capacity: int,
                rgb_capacity: Optional[int] = None) -> MemoryState:
  """Creates an empty memory; all slots hold void features.

  Args:
    batch_size: N.
    capacity: Semantic-cloud slot count.
    rgb_capacity: RGB-cloud slot count; defaults to `capacity`. Smaller
      when pole compaction is on (see `pole_valid_rows`).
  """
  rgb_capacity = capacity if rgb_capacity is None else rgb_capacity
  return MemoryState(
      coords=jnp.zeros((batch_size, 4, capacity), jnp.float32),
      feats=jnp.full((batch_size, capacity, 1),
                     float(constants.INVALID_SEM_VALUE), jnp.float32),
      rgb_coords=jnp.zeros((batch_size, 4, rgb_capacity), jnp.float32),
      rgb=jnp.full((batch_size, rgb_capacity, 3),
                   float(constants.INVALID_RGB_VALUE), jnp.float32),
      cursor=jnp.zeros((), jnp.int32),
  )


def pole_valid_rows(height: int, proportion: float = 0.125) -> Tuple[int, int]:
  """Row slice [start, stop) surviving `geometry.mask_pano`.

  mask_pano keeps rows where `mh <= row <= height - mh` with
  `mh = int(height * proportion)` (reference pano_utils.py:245-265), so
  the survivors are rows [mh, height - mh + 1).
  """
  mh = int(height * proportion)
  return mh, height - mh + 1


def _transform_position(xyz: jnp.ndarray) -> jnp.ndarray:
  """(N, 3) -> (N, 4) with homogeneous 0 (reference models.py:120-125)."""
  return jnp.concatenate([xyz, jnp.zeros_like(xyz[:, :1])], axis=1)


def memory_add_pano(memory: MemoryState,
                    pano_rgb: jnp.ndarray,
                    pano_semantic: jnp.ndarray,
                    pano_depth: jnp.ndarray,
                    position: jnp.ndarray,
                    depth_scale: float,
                    mask_blurred: bool = True,
                    pole_compact: bool = False,
                    write_slot: Optional[jnp.ndarray] = None) -> MemoryState:
  """Unprojects an RGB-D pano and writes it into the memory buffer.

  Mirrors reference add_to_memory (models.py:180-245) with cursor-based
  writes instead of concatenation.

  Args:
    memory: Current memory state.
    pano_rgb: (N, H, W, 3) int/float RGB in [0, 255].
    pano_semantic: (N, H, W, 1) semantic class image.
    pano_depth: (N, H, W) depth in [0, 1].
    position: (N, 3) world position.
    depth_scale: Maximum depth in metres.
    mask_blurred: Blank top/bottom 1/8th before unprojection.
    pole_compact: Statically drop the pole-masked rows from the RGB
      cloud (requires mask_blurred=True; those rows' points are void
      and splat-skipped, so the drop is exact — the reference discards
      them dynamically, models.py:229-237). The memory's RGB buffers
      must be laid out with `pole_valid_rows(H)` rows per frame (the
      SE3DSConfig.pole_compact layout).
    write_slot: Optional () int32 FRAME slot to write (may be traced).
      Defaults to the next slot after the cursor; `SE3DSModel` passes
      `total_frames % memory_frames` in ring mode so a full buffer
      wraps onto the oldest frame. The cursor then tracks the VALID
      slot count (saturating at capacity) rather than the write offset.

  Returns:
    Updated MemoryState (cursor advanced by H*W, saturating at capacity).
  """
  if pole_compact and not mask_blurred:
    raise ValueError(
        'pole_compact drops the pole-masked RGB rows, which only exist '
        'with mask_blurred=True. Pass mask_blurred=True or build the '
        'model with SE3DSConfig(pole_compact=False).')
  pano_rgb = pano_rgb.astype(jnp.int32)
  pano_semantic = pano_semantic.astype(jnp.int32)
  if mask_blurred:
    pano_rgb = geometry.mask_pano(
        pano_rgb, masked_region_value=constants.INVALID_RGB_VALUE)

  transformed_position = _transform_position(position.astype(jnp.float32))
  xyz1, feats = geometry.equirectangular_to_pointcloud(
      pano_semantic[..., 0], pano_depth, constants.INVALID_SEM_VALUE,
      depth_scale, interpolation_method='nearest')
  rgb_xyz1, rgb_feats = geometry.equirectangular_to_pointcloud(
      pano_rgb, pano_depth, constants.INVALID_RGB_VALUE,
      depth_scale, interpolation_method='bilinear')

  xyz1 = xyz1 + transformed_position[:, :, None]
  rgb_xyz1 = rgb_xyz1 + transformed_position[:, :, None]

  height, width = pano_depth.shape[1], pano_depth.shape[2]
  if pole_compact:
    # XLA folds the slice into the unprojection, so the dropped rows'
    # trig/feature work is dead-code-eliminated, not just discarded.
    r0, r1 = pole_valid_rows(height)
    n = rgb_xyz1.shape[0]
    rgb_xyz1 = rgb_xyz1.reshape(n, 4, height, width)[:, :, r0:r1].reshape(
        n, 4, -1)
    rgb_feats = rgb_feats.reshape(n, height, width, -1)[:, r0:r1].reshape(
        n, -1, rgb_feats.shape[-1])

  # NOTE: past capacity, dynamic_update_slice clamps the start index, so
  # a write beyond the last slot would silently overwrite the final
  # frame's range. This low-level function stays clamp-only (jit-safe,
  # no data-dependent error); the host wrapper `SE3DSModel` raises
  # before dispatch instead (see _check_memory_capacity).
  num_new = xyz1.shape[-1]
  cap = memory.coords.shape[-1]
  rgb_new = rgb_xyz1.shape[-1]
  rgb_cap = memory.rgb_coords.shape[-1]
  if num_new > cap or rgb_new > rgb_cap:
    raise ValueError(f'Frame has {num_new}/{rgb_new} points > memory '
                     f'capacity {cap}/{rgb_cap}.')
  if write_slot is None:
    # The cursor counts semantic slots; each frame writes exactly
    # `num_new` of them, so the next frame slot is cursor // num_new.
    cur = memory.cursor
    rgb_cur = (cur // num_new) * rgb_new
  else:
    slot = jnp.asarray(write_slot, jnp.int32)
    cur = slot * num_new
    rgb_cur = slot * rgb_new
  # Valid-slot count: explicit-slot writes may land BEHIND the cursor
  # (ring wrap), so the count never decreases; both forms saturate at
  # capacity.
  new_cursor = jnp.minimum(jnp.maximum(memory.cursor, cur + num_new), cap)

  coords = jax.lax.dynamic_update_slice(
      memory.coords, xyz1.astype(jnp.float32), (0, 0, cur))
  feats_buf = jax.lax.dynamic_update_slice(
      memory.feats, feats[..., None].astype(jnp.float32), (0, cur, 0))
  rgb_coords = jax.lax.dynamic_update_slice(
      memory.rgb_coords, rgb_xyz1.astype(jnp.float32), (0, 0, rgb_cur))
  rgb_buf = jax.lax.dynamic_update_slice(
      memory.rgb, rgb_feats.astype(jnp.float32), (0, rgb_cur, 0))
  return MemoryState(coords=coords, feats=feats_buf, rgb_coords=rgb_coords,
                     rgb=rgb_buf, cursor=new_cursor.astype(jnp.int32))


def memory_project(memory: MemoryState, position: jnp.ndarray, height: int,
                   width: int, depth_scale: float,
                   splat_mode: str = 'fast',
                   project_semantics: bool = True,
                   mesh=None, mesh_axis: str = 'data'):
  """Splats the memory at a target pose into guidance images.

  Returns (proj_semantic (N,H,W,1) f32, proj_depth (N,H,W), proj_rgb
  (N,H,W,3), proj_mask (N,H,W,1)). With `project_semantics=False` the
  semantic splat — which only feeds OutputData, never the generator —
  is skipped and proj_semantic is all-zero (~9 ms/frame saved at
  1024x512, see SE3DSConfig.project_semantics).

  With `mesh`, the point dimension of both splats is sharded over
  `mesh_axis` (parallel/splat_shard.py): each device scatters M/n
  points and the z-buffers merge over ICI — bit-identical combines,
  near-linear splat scaling in devices for long-trajectory memories.

  splat_mode='dual_sorted' fuses the pair into ONE shared-sort splat
  (exact semantics, geometry.project_dual_to_equirectangular); it
  requires project_semantics=True and no mesh. Measured SLOWER than two
  'fast' splats at trajectory scale (PERF.md "Shared-sort dual splat") —
  kept as the exact-mode fusion record.
  """
  if splat_mode == 'dual_sorted':
    if mesh is not None or not project_semantics:
      raise ValueError(
          "splat_mode='dual_sorted' fuses the semantic+RGB pair, so it "
          'needs project_semantics=True and has no sharded path.')
    relative_position = _transform_position(position.astype(jnp.float32))
    proj_depth, proj_semantic, proj_rgb = (
        geometry.project_dual_to_equirectangular(
            memory.feats, memory.coords - relative_position[..., None],
            memory.rgb, memory.rgb_coords - relative_position[..., None],
            height, width, sem_void_class=constants.INVALID_SEM_VALUE,
            rgb_void_class=constants.INVALID_RGB_VALUE,
            depth_scale=depth_scale))
    proj_mask = (
        (proj_depth > 0) & (proj_depth < 1)
        & jnp.all(proj_rgb != constants.INVALID_RGB_VALUE, axis=-1)
    ).astype(jnp.float32)[..., None]
    return proj_semantic, proj_depth, proj_rgb, proj_mask
  if mesh is not None:
    from se3ds_tpu.parallel import splat_shard  # lazy import
    project = functools.partial(
        splat_shard.project_feats_to_equirectangular_sharded,
        mesh=mesh, axis=mesh_axis, splat_mode=splat_mode)
  else:
    project = functools.partial(
        geometry.project_feats_to_equirectangular, splat_mode=splat_mode)
  relative_position = _transform_position(position.astype(jnp.float32))
  relative_rgb_coords = memory.rgb_coords - relative_position[..., None]
  if project_semantics:
    relative_coords = memory.coords - relative_position[..., None]
    _, proj_semantic = project(
        memory.feats, relative_coords, height, width,
        constants.INVALID_SEM_VALUE, depth_scale)
  else:
    batch = memory.coords.shape[0]
    proj_semantic = jnp.zeros((batch, height, width, 1), jnp.float32)
  proj_depth, proj_rgb = project(
      memory.rgb, relative_rgb_coords, height, width,
      constants.INVALID_RGB_VALUE, depth_scale)
  proj_mask = (
      (proj_depth > 0) & (proj_depth < 1)
      & jnp.all(proj_rgb != constants.INVALID_RGB_VALUE, axis=-1)
  ).astype(jnp.float32)[..., None]
  return proj_semantic, proj_depth, proj_rgb, proj_mask


class SE3DSModel:
  """Interface to use a pretrained SE3DS model for predictions.

  Mirrors the reference `SE3DSModel` (models.py:90-366). The heavy paths
  (`add_to_memory`, `__call__`) are jit-compiled with static shapes.
  """

  def __init__(self, config: model_config.SE3DSConfig,
               variables=None, rng: Optional[jax.Array] = None,
               mesh=None, mesh_axis: str = 'data'):
    """Args beyond the reference surface:

    mesh/mesh_axis: optional `jax.sharding.Mesh` — shards the point
      dimension of the memory splats over `mesh_axis`
      (parallel/splat_shard.py; bit-identical combines), so splat
      wall-clock scales ~linearly with devices on long trajectories.
      Requires a splat_mode the sharded path supports ('fast',
      'fast_exact', 'scatter'). If the mesh also has a 'spatial' axis
      of size > 1, the generator forward is spatially partitioned:
      activations shard the pano height over 'spatial' (GSPMD inserts
      the conv halo exchanges), dividing per-device generator FLOPs and
      activation memory for high-resolution panoramas. The reference
      has no distributed inference at all (models.py:239-245 is a
      single-device concat).
    """
    if config.splat_mode in ('pallas', 'pallas_exact') and mesh is None:
      # Warm the Mosaic probe EAGERLY (it cannot run inside a jit trace;
      # unwarmed, every traced program would silently degrade).
      from se3ds_tpu.ops import splat_pallas  # lazy import
      if config.splat_mode == 'pallas':
        splat_pallas.pallas_available()
      else:
        splat_pallas.pallas_exact_available()
    if mesh is not None and config.splat_mode in ('pallas', 'pallas_exact'):
      # The pallas modes are always safe to request (they auto-degrade
      # wherever the Mosaic kernel is unavailable, ops/geometry.py);
      # each sharded degradation target is the mode whose semantics the
      # kernel reproduces bit-for-bit ('fast' / exact 'scatter').
      import dataclasses  # lazy
      config = dataclasses.replace(
          config,
          splat_mode='fast' if config.splat_mode == 'pallas' else 'scatter')
    if mesh is not None and config.splat_mode not in (
        'fast', 'fast_exact', 'scatter'):
      raise ValueError(
          f"splat_mode={config.splat_mode!r} has no sharded path; use "
          "'fast', 'fast_exact', or 'scatter' with a mesh.")
    self.mesh = mesh
    self.mesh_axis = mesh_axis
    self._spatial_shard = bool(
        mesh is not None and 'spatial' in mesh.axis_names
        and mesh.shape['spatial'] > 1)
    self.config = config
    # The reference hard-requires batch_size == 1 (models.py:95-96); here
    # every path (memory buffers, splats, generator) carries a leading
    # batch axis, so N independent scenes advance in lockstep through one
    # program — batched serving the reference cannot do. Each batch
    # element owns its own point cloud; the frame cursor is shared (all
    # elements add/predict together). `.ply` export stays batch-0-only.
    if config.batch_size < 1:
      raise ValueError(f'batch_size must be >= 1, got {config.batch_size}.')
    if config.memory_mode not in ('strict', 'ring'):
      raise ValueError(f"memory_mode must be 'strict' or 'ring', got "
                       f'{config.memory_mode!r}.')
    # Ring mode: writes past capacity wrap onto the oldest frame's slots
    # (sliding window) instead of raising — unbounded streaming
    # trajectories at constant HBM (see SE3DSConfig.memory_mode).
    self._ring = config.memory_mode == 'ring'
    self.batch_size = config.batch_size
    self.height = config.image_height
    self.width = config.image_height * 2
    self.depth_scale = config.depth_scale
    self.capacity = config.memory_frames * self.height * self.width
    if config.pole_compact:
      r0, r1 = pole_valid_rows(self.height)
      self._rgb_frame_points = (r1 - r0) * self.width
    else:
      self._rgb_frame_points = self.height * self.width
    self.rgb_capacity = config.memory_frames * self._rgb_frame_points
    dtype = jnp.bfloat16 if config.compute_dtype == 'bfloat16' else jnp.float32

    self.model = generator_lib.ResNetGenerator(
        image_size=config.image_height,
        resnet_version=config.resnet_version, gen_dims=config.gen_dims,
        use_blurred_mask=config.use_blurred_mask, dtype=dtype)
    if variables is not None:
      self.variables = variables
    elif config.ckpt_path is not None:
      from se3ds_tpu.train import checkpoints  # lazy import
      self.variables = checkpoints.restore_ema_generator(config.ckpt_path)
      print('Restored from', config.ckpt_path)
    else:
      rng = rng if rng is not None else jax.random.PRNGKey(0)
      cond = {
          'proj_image': jnp.zeros((1, self.height, self.width, 3)),
          'proj_depth': jnp.zeros((1, self.height, self.width, 1)),
          'proj_mask': jnp.zeros((1, self.height, self.width, 1)),
          'blurred_mask': jnp.zeros((1, self.height, self.width, 1)),
      }
      # Jit the init: eagerly, Flax init EXECUTES the whole forward op by
      # op — hundreds of separate device programs (minutes through the
      # axon relay, each op a round trip). Under jit the discarded
      # forward is dead-code-eliminated, leaving one small program of
      # parameter initializers.
      self.variables = jax.jit(
          functools.partial(self.model.init, train=False))(rng, cond)
      print('Initializing SE3DS model from scratch.')

    if config.fold_spectral:
      if 'spectral' in self.variables:
        # Fold sigma into the kernels once (bitwise-equal at eval) and
        # pre-cast conv kernels to the compute dtype — skips ~2 full
        # passes over every weight per forward (models/folding.py).
        from se3ds_tpu.models import folding  # lazy import
        cond = {
            'proj_image': jnp.zeros((1, self.height, self.width, 3)),
            'proj_depth': jnp.zeros((1, self.height, self.width, 1)),
            'proj_mask': jnp.zeros((1, self.height, self.width, 1)),
            'blurred_mask': jnp.zeros((1, self.height, self.width, 1)),
        }
        self.variables = folding.fold_spectral_variables(
            self.model, self.variables, cond, cast_dtype=dtype)
      # Folded variables — just produced, or passed in PRE-folded from
      # another model instance (variables=other.variables) — need the
      # fold-aware module (PartialConv skips the spectral-u lookup).
      self.model = generator_lib.ResNetGenerator(
          image_size=config.image_height,
          resnet_version=config.resnet_version, gen_dims=config.gen_dims,
          use_blurred_mask=config.use_blurred_mask, dtype=dtype,
          spectral_fold=True)

    self.prev_rgb_frame = None
    # The three memory-MUTATING programs donate the memory buffers (and
    # the previous-frame feedback): XLA aliases the donated input with
    # the returned state, so the dynamic_update_slice writes happen
    # in place instead of copying the full-capacity buffers (~170 MB at
    # 8-frame 1024x512 capacity) every call. Model-owned buffers are the
    # only ones ever donated — `get_memory_state`/`set_memory_state`
    # copy at the API boundary, so client-held states stay valid.
    # Read-only programs (`_jit_call`, `_jit_poses`) donate nothing.
    donate = (('memory', 'prev_rgb_frame') if config.donate_memory
              else ())
    self._jit_add = jax.jit(functools.partial(
        memory_add_pano, depth_scale=self.depth_scale,
        pole_compact=config.pole_compact),
        static_argnames=('mask_blurred',),
        donate_argnames=('memory',) if config.donate_memory else ())
    self._jit_call = jax.jit(
        self._forward, static_argnames=('num_frames', 'feed', 'sem_frames'))
    self._jit_trajectory = jax.jit(
        self._trajectory_forward,
        static_argnames=('start_frames', 'sem_frames'),
        donate_argnames=donate)
    self._jit_poses = jax.jit(
        self._poses_forward, static_argnames=('num_frames', 'sem_frames'))
    self._jit_step = jax.jit(
        self._step_forward,
        static_argnames=('num_frames', 'use_projected_rgb', 'sem_frames'),
        donate_argnames=donate)
    self.reset_memory()

  # -- memory management ----------------------------------------------------

  def reset_memory(self):
    self._memory = init_memory(self.batch_size, self.capacity,
                               self.rgb_capacity)
    # _frames_written = VALID frames (live splat extent; <= memory_frames);
    # _total_frames = frames ever written (unbounded; drives the ring
    # write slot). Equal until the first ring wrap.
    self._frames_written = 0
    self._total_frames = 0
    # Per-slot host bookkeeping: True where the slot holds REAL semantics
    # (written by add_to_memory). Predicted frames write all-void
    # semantics (pred_semantic == 0 == the void class), so their slots
    # stay False and the semantic splat statically skips them
    # (_live_memory sem_frames) — bit-exact, and the semantic scatter
    # cost stops growing with trajectory length.
    self._sem_real = [False] * self.config.memory_frames

  def _next_write_slot(self) -> int:
    """Frame slot the next write lands in (wraps in ring mode)."""
    return self._total_frames % self.config.memory_frames

  def _sem_frames_live(self) -> int:
    """Static semantic-cloud extent: 1 + the highest slot holding real
    semantics (0 when none — _live_memory clamps to one void frame,
    which splats to an all-void image, exactly as the full extent
    would). Slots holding predicted frames inside the extent are void
    and splat-skipped either way; only the BOUND must cover every real
    slot."""
    real = [i for i, r in enumerate(self._sem_real) if r]
    return (max(real) + 1) if real else 0

  def _count_frames(self, new_frames: int = 1):
    self._total_frames += new_frames
    self._frames_written = min(self.config.memory_frames,
                               self._frames_written + new_frames)

  def get_memory_state(self, copy: bool = True) -> MemoryState:
    """Returns the current memory state.

    With `copy=True` (default) the buffers are device-copied so the
    returned state stays valid forever: the model's own buffers are
    DONATED to the next mutating call (`add_to_memory`,
    `add_preds_to_memory=True`, `predict_trajectory`) and reused in
    place. `copy=False` returns the live buffers without the copy —
    cheaper, but they are invalidated by the next mutating call (JAX
    raises on use of a donated buffer, so misuse fails loudly).
    """
    if not copy:
      return self._memory
    return jax.tree.map(jnp.copy, self._memory)

  def set_memory_state(self, state: MemoryState):
    if state.rgb_coords.shape[-1] != self.rgb_capacity:
      raise ValueError(
          f'MemoryState RGB capacity {state.rgb_coords.shape[-1]} does not '
          f'match this model\'s layout ({self.rgb_capacity}; '
          f'pole_compact={self.config.pole_compact}). States are only '
          'portable between models with the same pole_compact setting.')
    # Defensive copy: the model donates its own buffers to mutating
    # calls; adopting the caller's arrays directly would invalidate the
    # caller's state object on the next add/predict.
    self._memory = jax.tree.map(jnp.copy, state)
    # Recover the live extent from the cursor (host fetch; non-hot path).
    # The cursor counts VALID slots, so a ring-wrapped state restores as
    # "full"; subsequent ring writes start over at slot 0 (slot 0 is the
    # oldest frame by convention after a restore).
    frame_points = self.height * self.width
    self._frames_written = min(
        self.config.memory_frames,
        -(-int(np.asarray(state.cursor)) // frame_points))
    self._total_frames = self._frames_written
    # A restored state carries no per-slot provenance: conservatively
    # treat every written slot as holding real semantics (exact — the
    # semantic splat merely loses the predicted-frame elision until
    # those slots are overwritten).
    self._sem_real = [i < self._frames_written
                      for i in range(self.config.memory_frames)]

  def write_memory_as_pointcloud(self, filename: str):
    """Writes valid RGB memory points of batch 0 to an ASCII .ply file."""
    mem = self._memory
    xyz = np.asarray(mem.rgb_coords[0, 0:3]).T  # (RGB_CAP, 3)
    rgb = np.asarray(mem.rgb[0])  # (RGB_CAP, 3)
    cursor = self._frames_written * self._rgb_frame_points
    valid = np.all(rgb[:cursor] != constants.INVALID_RGB_VALUE, axis=-1)
    xyz, rgb = xyz[:cursor][valid], rgb[:cursor][valid]
    with open(filename, 'w') as fp:
      fp.write('ply\n')
      fp.write('format ascii 1.0 \n')
      fp.write('element vertex %d\n' % xyz.shape[0])
      fp.write('property float x\n')
      fp.write('property float y\n')
      fp.write('property float z\n')
      fp.write('property uchar red\n')
      fp.write('property uchar green\n')
      fp.write('property uchar blue\n')
      fp.write('end_header\n')
      for i in range(xyz.shape[0]):
        fp.write('{} {} {} {} {} {} \n'.format(
            xyz[i, 0], xyz[i, 1], xyz[i, 2], int(rgb[i, 0]), int(rgb[i, 1]),
            int(rgb[i, 2])))

  def _check_memory_capacity(self):
    """Raises when another frame would not fit.

    The reference grows its memory unboundedly (models.py:239-245); our
    fixed-capacity buffer cannot, and silently overwriting the last
    frame's slots would be a behavioural cliff for long trajectories —
    so the host API fails loudly instead. Raise `memory_frames` in the
    config (or `reset_memory()`) to continue. Ring mode never raises:
    writes wrap onto the oldest frame (SE3DSConfig.memory_mode).
    """
    if self._ring:
      return
    if self._frames_written >= self.config.memory_frames:
      raise ValueError(
          f'Point-cloud memory is full ({self.config.memory_frames} frames'
          f' = {self.capacity} points). Increase'
          ' SE3DSConfig.memory_frames or call reset_memory().')

  def add_to_memory(self, pano_rgb, pano_semantic, pano_depth, position,
                    mask_blurred: bool = True):
    """Adds an equirectangular observation to memory (models.py:180-245)."""
    self._check_memory_capacity()
    pano_rgb = jnp.asarray(pano_rgb)
    self.prev_rgb_frame = (pano_rgb / 255).astype(jnp.float32)
    slot = self._next_write_slot()
    self._memory = self._jit_add(
        self._memory, pano_rgb, jnp.asarray(pano_semantic),
        jnp.asarray(pano_depth), jnp.asarray(position),
        mask_blurred=mask_blurred, write_slot=jnp.int32(slot))
    self._sem_real[slot] = True
    self._count_frames()

  # -- forward --------------------------------------------------------------

  @staticmethod
  def _pow2_bucket(n: int) -> int:
    """Next power of two >= n: bounds distinct compiled shape variants at
    log2 instead of linear (each compile costs minutes on relay
    backends)."""
    return 1 << max(0, n - 1).bit_length()

  def _sem_bucket(self) -> int:
    """Pow2-bucketed semantic extent for the host-dispatched (read/step)
    programs — like the frame bucket, any extent >= the real-semantics
    extent is exact (the extra frames are void and splat-skipped), and
    bucketing bounds compile variants at log2."""
    return min(self._pow2_bucket(max(1, self._sem_frames_live())),
               self.config.memory_frames)

  @staticmethod
  def _to_output_data(out, slice_to: Optional[int] = None) -> OutputData:
    """Maps a jitted-forward output dict to the public OutputData (the
    uint8 views are produced in-jit; see _forward)."""
    cut = (lambda x: x[:slice_to]) if slice_to is not None else (lambda x: x)
    return OutputData(
        proj_semantic=cut(out['proj_semantic_u8']),
        pred_semantic=cut(out['pred_semantic_u8']),
        proj_rgb=cut(out['proj_rgb_u8']),
        pred_rgb=cut(out['pred_rgb_u8']),
        proj_depth=cut(out['proj_depth']),
        pred_depth=cut(out['pred_depth']),
        mu=cut(out['mu']),
        logvar=cut(out['logvar']),
        proj_mask=cut(out['proj_mask']))

  def _live_memory(self, memory: MemoryState, num_frames: int,
                   sem_frames: Optional[int] = None) -> MemoryState:
    """Statically slices memory to the written extent (exact: the tail
    is void slots the splat skips anyway).

    `sem_frames` (default: `num_frames`) bounds the SEMANTIC cloud
    separately: predicted frames feed `pred_semantic == 0` into memory
    (the release generator's seg head is all-zero, see _forward) and
    class 0 IS the void sentinel (constants.INVALID_SEM_VALUE), so
    every point of a predicted frame fails the splat validity test
    (`feats != input_void_class`, ops/splat.pixel_coords). Slicing those
    frames off statically is bit-exact and removes their scatter cost —
    in a trajectory the semantic splat stays proportional to the
    OBSERVED frames instead of growing with every predicted frame
    (reference equivalent: those rows scatter-and-drop every frame,
    point_cloud_utils.py:146-148)."""
    extent_frames = max(1, min(num_frames, self.config.memory_frames))
    extent = extent_frames * self.height * self.width
    sem_extent_frames = (extent_frames if sem_frames is None
                         else max(1, min(sem_frames, extent_frames)))
    sem_extent = sem_extent_frames * self.height * self.width
    # The RGB cloud may be pole-compacted (fewer points per frame);
    # derive its frame stride from the buffer itself so the slice stays
    # correct for either layout.
    rgb_extent = extent_frames * (
        memory.rgb_coords.shape[-1] // self.config.memory_frames)
    return MemoryState(
        coords=memory.coords[:, :, :sem_extent],
        feats=memory.feats[:, :sem_extent],
        rgb_coords=memory.rgb_coords[:, :, :rgb_extent],
        rgb=memory.rgb[:, :rgb_extent],
        cursor=memory.cursor)

  def _forward(self, variables, memory: MemoryState, prev_rgb_frame,
               position, num_frames: int, feed: bool = False,
               sem_frames: Optional[int] = None):
    # Live-extent splat: only `num_frames` frames of memory have ever
    # been written (host-side counter); the remaining capacity is void
    # slots the splat would skip anyway, so slicing them off is exact
    # and makes splat cost proportional to frames-so-far instead of
    # full capacity. `num_frames` is static (one compile per distinct
    # frame count, <= memory_frames). `sem_frames` additionally bounds
    # the semantic cloud to the frames holding REAL semantics (predicted
    # frames are statically all-void there; see _live_memory).
    live = self._live_memory(memory, num_frames, sem_frames)
    proj_semantic, proj_depth, proj_rgb, proj_mask = memory_project(
        live, position, self.height, self.width, self.depth_scale,
        splat_mode=self.config.splat_mode,
        project_semantics=self.config.project_semantics,
        mesh=self.mesh, mesh_axis=self.mesh_axis)
    proj_semantic_img = proj_semantic[..., 0]
    proj_rgb_norm = jnp.clip(proj_rgb / 255.0, 0.0, 1.0)

    inputs = {
        'prev_image': prev_rgb_frame,
        'proj_image': proj_rgb_norm,
        'proj_depth': proj_depth[..., None],
        'proj_mask': proj_mask,
        'blurred_mask': jnp.zeros_like(proj_mask),
    }
    if self._spatial_shard:
      # Spatially partitioned generator: shard the pano height (NHWC
      # axis 1) over the mesh 'spatial' axis. GSPMD propagates the
      # annotation through every conv (inserting halo exchanges) so the
      # whole forward runs height-partitioned; the width axis carries
      # the circular wrap and stays whole.
      from jax.sharding import NamedSharding, PartitionSpec  # lazy
      row_sharding = NamedSharding(self.mesh, PartitionSpec(None, 'spatial'))
      inputs = {k: jax.lax.with_sharding_constraint(v, row_sharding)
                for k, v in inputs.items()}
    (mu, logvar, _, pred_depth, pred_semantic, _, generated_rgb
     ) = self.model.apply(variables, inputs, train=False)
    pred_depth = jnp.clip(pred_depth[..., 0], 0.0, 1.0)
    pred_rgb = (jnp.clip(generated_rgb, 0, 1) * 255).astype(jnp.int32)
    # seg_out is all-zero by the release contract (image_models.py:179-182);
    # argmax of zeros is class 0 — emit it directly instead of
    # materialising the (N, H, W, 42) zero tensor on device.
    pred_semantic = jnp.zeros(pred_semantic.shape[:-1], jnp.int32)
    # Lean output set: exactly what OutputData needs (~10 MB/frame at
    # 1024x512). uint8 views are produced inside the jitted program: on
    # relay backends every eager op outside jit is a separate device
    # dispatch, and per-dispatch overhead scales with OUTPUT BYTES
    # (~0.25 ms/MB measured), so the f32/int32 memory-feed tensors
    # (~28 MB/frame) are only returned when `feed=True`
    # (add_preds_to_memory).
    out = dict(
        proj_depth=proj_depth,
        proj_mask=proj_mask,
        mu=mu, logvar=logvar,
        pred_depth=pred_depth,
        proj_semantic_u8=proj_semantic_img.astype(jnp.uint8),
        pred_semantic_u8=pred_semantic.astype(jnp.uint8),
        proj_rgb_u8=(proj_rgb_norm * 255).astype(jnp.uint8),
        pred_rgb_u8=jnp.clip(pred_rgb, 0, 255).astype(jnp.uint8),
    )
    if feed:
      out.update(
          proj_semantic=proj_semantic_img.astype(jnp.int32),
          proj_rgb=proj_rgb_norm,
          pred_semantic=pred_semantic,
          pred_rgb=pred_rgb,
          pc_rgb=jnp.clip((generated_rgb * 255).astype(jnp.int32),
                          constants.INVALID_RGB_VALUE, 255),
          generated_rgb=generated_rgb,
      )
    return out

  _LEAN_KEYS = ('proj_semantic_u8', 'pred_semantic_u8', 'proj_rgb_u8',
                'pred_rgb_u8', 'proj_depth', 'pred_depth', 'mu', 'logvar',
                'proj_mask')

  def _step_forward(self, variables, memory: MemoryState, prev_rgb_frame,
                    position, write_slot, num_frames: int,
                    use_projected_rgb: bool = False,
                    sem_frames: Optional[int] = None):
    """One feedback frame — splat -> generate -> unproject -> memory
    write — in ONE traced program. The per-frame sibling of
    `_trajectory_forward` (which chains it T times): the ~28 MB of
    f32/int32 memory-feed tensors never leave the device, and the
    forward + memory write is one dispatch instead of two.

    Returns (lean output dict, new memory, new prev_rgb_frame).
    """
    out = self._forward(variables, memory, prev_rgb_frame, position,
                        num_frames=num_frames, feed=True,
                        sem_frames=sem_frames)
    # The memory feed is always the generator's raw outputs, independent
    # of use_projected_rgb (reference models.py:335-347).
    new_memory = memory_add_pano(
        memory, out['pc_rgb'], out['pred_semantic'][..., None],
        out['pred_depth'], position, depth_scale=self.depth_scale,
        mask_blurred=True, pole_compact=self.config.pole_compact,
        write_slot=write_slot)
    new_prev = out['generated_rgb']
    lean = {k: out[k] for k in self._LEAN_KEYS}
    if use_projected_rgb:
      # Reference models.py:327-333: returned predictions add the
      # projected guidance; the previous-frame feedback becomes the raw
      # generated RGB re-quantised through the memory int path.
      pred_rgb = (out['proj_rgb'] * 255).astype(jnp.int32) + out['pc_rgb']
      lean['pred_rgb_u8'] = jnp.clip(pred_rgb, 0, 255).astype(jnp.uint8)
      lean['pred_semantic_u8'] = (
          out['proj_semantic'] + out['pred_semantic']).astype(jnp.uint8)
      lean['pred_depth'] = out['proj_depth'] + out['pred_depth']
      new_prev = (jnp.clip(out['pc_rgb'], 0, 255) / 255).astype(jnp.float32)
    return lean, new_memory, new_prev

  def _trajectory_forward(self, variables, memory: MemoryState,
                          prev_rgb_frame, positions, start_slot,
                          start_frames: int, sem_frames: int):
    """T autoregressive frames in ONE traced program (see
    predict_trajectory). `start_slot` is traced (ring wrap positions add
    no compile variants); `start_frames`/`sem_frames` are static (live
    extents — `sem_frames` stays CONSTANT across the trajectory because
    predicted frames never extend the real-semantics extent)."""
    num_frames = positions.shape[0]
    cap = self.config.memory_frames
    per_frame = []
    for t in range(num_frames):
      # Exact live extents (no power-of-two bucketing): the whole
      # trajectory is one compile, so there is no per-extent compile
      # cost to amortise — each frame splats exactly the frames written.
      lean, memory, prev_rgb_frame = self._step_forward(
          variables, memory, prev_rgb_frame, positions[t],
          write_slot=(start_slot + t) % cap,
          num_frames=max(1, min(start_frames + t, cap)),
          sem_frames=sem_frames)
      per_frame.append(lean)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_frame)
    return stacked, memory, prev_rgb_frame

  def predict_trajectory(self, positions) -> OutputData:
    """Autoregressively predicts a whole trajectory in one jitted program.

    Equivalent to calling `self(position, add_preds_to_memory=True)` for
    each position in turn (the VLN/video-synthesis loop, reference
    models.py:335-347 driven per-frame from Python), but the splat ->
    generate -> unproject -> memory-write chain for ALL T frames is one
    XLA program: no host round-trip between frames, one compile per
    (T, frames-already-written) pair, and the memory feedback never
    leaves the device. The reference has no fused-trajectory path.

    Args:
      positions: (T, 3) or (T, N, 3) world positions, one per frame.

    Returns:
      OutputData with a leading trajectory axis on every field, i.e.
      pred_rgb is (T, N, H, W, 3) uint8. Memory, the previous-frame
      feedback, and the frame counter advance by T, exactly as T
      `add_preds_to_memory=True` calls would.
    """
    positions = jnp.asarray(positions, jnp.float32)
    if positions.ndim == 2:
      positions = positions[:, None, :]
    if (positions.ndim != 3 or positions.shape[-1] != 3
        or positions.shape[1] not in (1, self.batch_size)):
      raise ValueError(
          f'positions must be (T, 3) or (T, N, 3) with N in '
          f'{{1, {self.batch_size}}}, got {positions.shape}. A singleton '
          'scene axis broadcasts one pose to every scene.')
    num_frames = positions.shape[0]
    if num_frames < 1:
      raise ValueError('positions must contain at least one frame.')
    assert self.prev_rgb_frame is not None
    if (not self._ring
        and self._frames_written + num_frames > self.config.memory_frames):
      raise ValueError(
          f'Trajectory of {num_frames} frames would exceed memory capacity '
          f'({self._frames_written} written, {self.config.memory_frames} '
          'total). Increase SE3DSConfig.memory_frames, reset_memory(), or '
          "use memory_mode='ring' for unbounded streaming.")
    start_slot = self._next_write_slot()
    # Exact (unbucketed) semantic extent: the trajectory is one compile
    # anyway. Predicted frames only ever turn slots void, so the extent
    # computed BEFORE the trajectory stays a valid bound for every frame
    # inside it, even across ring wraps onto real slots.
    out, new_memory, new_prev = self._jit_trajectory(
        self.variables, self._memory, self.prev_rgb_frame, positions,
        jnp.int32(start_slot),
        start_frames=self._frames_written,
        sem_frames=min(max(1, self._sem_frames_live()),
                       self.config.memory_frames))
    self._memory = new_memory
    self.prev_rgb_frame = new_prev
    cap = self.config.memory_frames
    for t in range(num_frames):
      self._sem_real[(start_slot + t) % cap] = False
    self._count_frames(num_frames)
    return self._to_output_data(out)

  def _poses_forward(self, variables, memory: MemoryState, prev_rgb_frame,
                     positions, num_frames: int,
                     sem_frames: Optional[int] = None):
    """K read-only forwards against ONE scene's memory (see
    predict_poses). The broadcast happens inside jit: XLA fuses it into
    the per-pose coordinate subtraction the splat needs anyway, so the
    memory buffers are never copied K-fold on transfer."""
    k = positions.shape[0]
    bcast = lambda x: jnp.broadcast_to(x, (k,) + x.shape[1:])
    mem_k = MemoryState(
        coords=bcast(memory.coords), feats=bcast(memory.feats),
        rgb_coords=bcast(memory.rgb_coords), rgb=bcast(memory.rgb),
        cursor=memory.cursor)
    return self._forward(variables, mem_k, bcast(prev_rgb_frame), positions,
                         num_frames=num_frames, feed=False)

  def predict_poses(self, positions) -> OutputData:
    """Predicts K poses from the CURRENT scene memory in one program.

    The VLN-augmentation inner loop (reference notebook cell 13 +
    models.py:247-366) evaluates many candidate viewpoints around one
    source pano, one `model(position)` host dispatch per pose; here all
    K read-only forwards — K splats of the shared point cloud + one
    batch-K generator pass — are a single XLA program. Memory is NOT
    modified. Requires batch_size == 1 (one scene, many poses; use
    `SE3DSConfig.batch_size` for many scenes).

    Args:
      positions: (K, 3) world positions.

    Returns:
      OutputData batched over poses: pred_rgb is (K, H, 2H, 3) uint8.
      K is padded to the next power of two internally (one compile per
      bucket, not per K); outputs are sliced back to K.
    """
    if self.batch_size != 1:
      raise ValueError('predict_poses serves many poses of ONE scene; '
                       f'model batch_size is {self.batch_size}.')
    positions = jnp.asarray(positions, jnp.float32)
    if positions.ndim != 2 or positions.shape[-1] != 3:
      raise ValueError(f'positions must be (K, 3), got {positions.shape}.')
    k = positions.shape[0]
    if k < 1:
      raise ValueError('positions must contain at least one pose.')
    bucket = self._pow2_bucket(k)  # pad: bounds compiles at log2
    if bucket != k:
      positions = jnp.concatenate(
          [positions, jnp.zeros((bucket - k, 3), jnp.float32)])
    assert self.prev_rgb_frame is not None
    frame_bucket = self._pow2_bucket(max(1, self._frames_written))
    out = self._jit_poses(
        self.variables, self._memory, self.prev_rgb_frame, positions,
        num_frames=min(frame_bucket, self.config.memory_frames),
        sem_frames=self._sem_bucket())
    return self._to_output_data(out, slice_to=k)

  def __call__(self, position, add_preds_to_memory: bool = False,
               sample_noise: bool = False,
               use_projected_rgb: bool = False,
               z=None) -> OutputData:
    """Predicts the frame at `position` (reference models.py:247-366).

    `sample_noise` and `z` are accepted for reference signature parity
    but ignored: the release generator's VAE branch emits zeros for
    mu/logvar and consumes no noise (reference image_models.py:172-182),
    so they have no effect there either.
    """
    del sample_noise, z
    position = jnp.asarray(position, jnp.float32)
    assert self.prev_rgb_frame is not None
    # Bucket the static frame count to the next power of two (capped at
    # memory_frames): any extent >= frames_written is exact (the extra
    # slots are void and splat-skipped), and bucketing bounds the number
    # of compiled variants at log2(memory_frames)+1 instead of
    # memory_frames — each compile costs minutes on relay backends.
    bucket = self._pow2_bucket(max(1, self._frames_written))
    num_frames = min(bucket, self.config.memory_frames)
    sem_frames = self._sem_bucket()
    if add_preds_to_memory:
      # Fused feedback step: forward + memory write in one program (the
      # feed tensors never leave the device; one dispatch, not two).
      self._check_memory_capacity()
      slot = self._next_write_slot()
      out, new_memory, new_prev = self._jit_step(
          self.variables, self._memory, self.prev_rgb_frame, position,
          jnp.int32(slot), num_frames=num_frames,
          use_projected_rgb=use_projected_rgb, sem_frames=sem_frames)
      self._memory = new_memory
      self.prev_rgb_frame = new_prev
      self._sem_real[slot] = False  # predicted semantics are all-void
      self._count_frames()
      return self._to_output_data(out)
    out = self._jit_call(self.variables, self._memory, self.prev_rgb_frame,
                         position, num_frames=num_frames, feed=False,
                         sem_frames=sem_frames)
    return self._to_output_data(out)
