"""Inference runtime tests, mirroring the reference models_test.py:
memory round-trip and the analytic-plane test that pins coordinate
conventions."""

import numpy as np
import jax.numpy as jnp
import pytest

from se3ds_tpu import constants
from se3ds_tpu.models import inference, model_config


@pytest.fixture(scope='module')
def model():
  return inference.SE3DSModel(model_config.get_test_config())


def _synthetic_pano(h, seed=0):
  rng = np.random.RandomState(seed)
  w = h * 2
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.8, (1, h, w)).astype(np.float32)
  return rgb, sem, depth


def test_memory_roundtrip_reprojection(model):
  """Add a pano at a pose and re-project at the same pose: most visible
  pixels should return their original RGB (reference models_test.py:62-68)."""
  model.reset_memory()
  h = model.height
  rgb, sem, depth = _synthetic_pano(h)
  # Constant-ish depth so neighbouring pixels do not occlude each other.
  depth = np.full_like(depth, 0.5)
  pos = np.zeros((1, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos, mask_blurred=False)

  proj_sem, proj_depth, proj_rgb, proj_mask = inference.memory_project(
      model.get_memory_state(), jnp.asarray(pos), model.height, model.width,
      model.depth_scale)
  proj_rgb = np.asarray(proj_rgb)
  mask = np.asarray(proj_mask[..., 0]) > 0
  # Compare where projection is valid.
  close = np.abs(proj_rgb - rgb) <= 1.0
  frac = np.mean(np.all(close, axis=-1)[mask])
  assert frac > 0.95, frac


def test_memory_analytic_plane(model):
  """A constant-depth vertical column maps to points at the correct world
  coordinate (reference models_test.py:81-137)."""
  model.reset_memory()
  h = model.height
  w = model.width
  rgb = np.full((1, h, w, 3), 128, np.int32)
  sem = np.ones((1, h, w, 1), np.int32)
  depth_m = 1.0  # metres
  depth = np.full((1, h, w), depth_m / model.depth_scale, np.float32)
  pos = np.zeros((1, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos, mask_blurred=False)
  mem = model.get_memory_state()
  cursor = int(mem.cursor)
  coords = np.asarray(mem.coords[0, :, :cursor])
  feats = np.asarray(mem.feats[0, :cursor, 0])
  valid = feats != constants.INVALID_SEM_VALUE
  radius = np.linalg.norm(coords[:3, valid], axis=0)
  np.testing.assert_allclose(radius, depth_m, atol=1e-3)
  # Pixel at the image centre row, column at 3/4 width: heading = 0
  # (x-axis); the unprojection heading grid runs 1.5pi -> -0.5pi, so
  # column w*3/4 corresponds to heading 0 => point on the +x axis.
  idx = (h // 2) * w + (3 * w) // 4
  np.testing.assert_allclose(coords[0, idx], depth_m, atol=0.05)
  np.testing.assert_allclose(coords[1, idx], 0.0, atol=0.05)
  np.testing.assert_allclose(coords[2, idx], 0.0, atol=0.2)


def test_forward_output_contract(model):
  model.reset_memory()
  h = model.height
  rgb, sem, depth = _synthetic_pano(h, seed=3)
  pos = np.zeros((1, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos)
  out = model(np.array([[0.5, 0.0, 0.0]], np.float32))
  assert out.pred_rgb.shape == (1, h, h * 2, 3)
  assert out.pred_rgb.dtype == jnp.uint8
  assert out.pred_depth.shape == (1, h, h * 2)
  assert out.proj_mask.shape == (1, h, h * 2, 1)
  assert float(jnp.max(out.pred_depth)) <= 1.0


def test_autoregressive_memory_growth(model):
  model.reset_memory()
  h = model.height
  rgb, sem, depth = _synthetic_pano(h, seed=4)
  pos = np.zeros((1, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos)
  c0 = int(model.get_memory_state().cursor)
  _ = model(np.array([[0.3, 0.2, 0.0]], np.float32),
            add_preds_to_memory=True)
  c1 = int(model.get_memory_state().cursor)
  assert c1 == c0 + h * h * 2
  # Capacity is bounded: buffers never grow.
  assert model.get_memory_state().coords.shape[-1] == model.capacity


def test_ply_export(tmp_path, model):
  model.reset_memory()
  h = model.height
  rgb, sem, depth = _synthetic_pano(h, seed=5)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32),
                      mask_blurred=False)
  path = tmp_path / 'cloud.ply'
  model.write_memory_as_pointcloud(str(path))
  lines = path.read_text().splitlines()
  assert lines[0] == 'ply'
  n = int([l for l in lines if l.startswith('element vertex')][0].split()[-1])
  assert n > 0
  assert len(lines) == 10 + n


def test_live_extent_splat_matches_full_capacity():
  """The live-extent slice must be invisible: forcing the splat to run
  over the FULL capacity (as before the optimisation) yields bitwise
  identical outputs, because the tail slots are void points the z-buffer
  skips."""
  config = model_config.get_test_config()
  model = inference.SE3DSModel(config)
  rng = np.random.RandomState(11)
  h, w = config.image_height, config.image_height * 2
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  target = np.array([[0.4, 0.2, 0.0]], np.float32)

  out_live = model(target)
  assert model._frames_written == 1
  model._frames_written = config.memory_frames  # force full-capacity path
  # Also force the full-capacity SEMANTIC cloud (the real-semantics
  # elision would otherwise keep it at one frame).
  model._sem_real = [True] * config.memory_frames
  out_full = model(target)

  for field in out_live._fields:
    a, b = getattr(out_live, field), getattr(out_full, field)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=field)


def test_predicted_frame_semantic_elision_bit_exact():
  """Predicted frames write pred_semantic == 0 (the void class) into
  memory, so the semantic splat statically skips their slots
  (_live_memory sem_frames). Forcing those slots back INTO the splat
  must change nothing, on every output, at every step — the elided
  points are void and the z-buffer drops them anyway."""
  config = model_config.get_test_config()
  # Both models init from the default PRNGKey(0): identical weights
  # (passing model.variables would hand the control pre-folded kernels,
  # which its own folding pass cannot consume).
  model = inference.SE3DSModel(config)
  control = inference.SE3DSModel(config)
  rng = np.random.RandomState(5)
  h, w = config.image_height, config.image_height * 2
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  pos = np.zeros((1, 3), np.float32)
  steps = [np.array([[0.3, 0.1, 0.0]], np.float32),
           np.array([[0.5, -0.2, 0.0]], np.float32),
           np.array([[-0.2, 0.4, 0.0]], np.float32)]

  def assert_same(a, b, ctx):
    for field in a._fields:
      np.testing.assert_array_equal(
          np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
          err_msg=f'{ctx}/{field}')

  for m in (model, control):
    m.add_to_memory(rgb, sem, depth, pos)

  def force_full(m):
    # Defeat the elision: pretend every written slot holds real
    # semantics, so the splat covers the full live extent as before.
    m._sem_real = [i < m._frames_written
                   for i in range(config.memory_frames)]

  for i, target in enumerate(steps[:2]):
    force_full(control)
    assert_same(model(target, add_preds_to_memory=True),
                control(target, add_preds_to_memory=True), f'step{i}')
  # The optimised model tracked exactly one real-semantics frame while
  # the control covered all written frames.
  assert model._sem_frames_live() == 1
  assert model._frames_written == 3
  force_full(control)
  assert_same(model(steps[2]), control(steps[2]), 'readonly')

  # Restored states carry no provenance: conservatively all-real.
  model.set_memory_state(control.get_memory_state())
  assert model._sem_frames_live() == model._frames_written


def test_memory_overflow_raises():
  """Adding past capacity must fail loudly, not silently overwrite the
  last frame's slots (the reference grows unboundedly, models.py:239-245;
  our fixed-capacity buffer defines the cliff explicitly)."""
  config = model_config.get_test_config()
  model = inference.SE3DSModel(config)
  h, w = config.image_height, config.image_height * 2
  rgb, sem, depth = _synthetic_pano(h, seed=3)
  pos = np.zeros((1, 3), np.float32)
  for _ in range(config.memory_frames):
    model.add_to_memory(rgb, sem, depth, pos, mask_blurred=False)
  with pytest.raises(ValueError, match='memory is full'):
    model.add_to_memory(rgb, sem, depth, pos, mask_blurred=False)
  # The autoregressive write path raises too...
  with pytest.raises(ValueError, match='memory is full'):
    model(np.array([[0.1, 0, 0]], np.float32), add_preds_to_memory=True)
  # ...but a read-only prediction at full capacity is fine.
  out = model(np.array([[0.1, 0, 0]], np.float32))
  assert out.pred_rgb.shape == (1, h, w, 3)


def test_forward_compiles_are_bucketed():
  """num_frames is bucketed to powers of two, bounding compiled _forward
  variants at log2(memory_frames)+1 (advisor finding r2: each compile
  costs minutes on relay backends)."""
  config = model_config.get_test_config()
  model = inference.SE3DSModel(config)
  h, w = config.image_height, config.image_height * 2
  rgb, sem, depth = _synthetic_pano(h, seed=7)
  pos = np.zeros((1, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos, mask_blurred=False)
  for i in range(config.memory_frames - 1):
    model(np.array([[0.2 * i, 0, 0]], np.float32), add_preds_to_memory=True)
    model(np.array([[0.2 * i, 0, 0]], np.float32))  # read-only path too
  max_compiles = (config.memory_frames - 1).bit_length() + 1
  for jitted in (model._jit_call, model._jit_step):
    assert jitted._cache_size() <= max_compiles, (
        jitted._cache_size(), max_compiles)


def test_project_semantics_off_bit_identical_rgb():
  """project_semantics=False skips the semantic splat: proj/pred_semantic
  come back all-zero, every other output is bit-identical."""
  import dataclasses
  rgb, sem, depth = _synthetic_pano(32, seed=7)
  pos = np.zeros((1, 3), np.float32)
  target = np.asarray([[0.2, 0.1, 0.0]], np.float32)

  outs = {}
  for flag in (True, False):
    config = dataclasses.replace(model_config.get_test_config(),
                                 project_semantics=flag)
    m = inference.SE3DSModel(config)
    m.add_to_memory(rgb, sem, depth, pos)
    outs[flag] = m(target)

  on, off = outs[True], outs[False]
  assert np.any(np.asarray(on.proj_semantic) != 0)
  assert not np.any(np.asarray(off.proj_semantic))
  for field in ('proj_rgb', 'pred_rgb', 'proj_depth', 'pred_depth',
                'proj_mask'):
    np.testing.assert_array_equal(
        np.asarray(getattr(on, field)), np.asarray(getattr(off, field)),
        err_msg=field)


def test_predict_trajectory_matches_per_frame_loop():
  """The fused-trajectory program must be bitwise identical to driving
  `__call__(add_preds_to_memory=True)` per frame from the host — the
  fusion removes dispatch, not math (live-extent slices are exact at any
  extent, so bucketed vs exact extents cannot differ)."""
  config = model_config.get_test_config()  # memory_frames=3
  model = inference.SE3DSModel(config)
  rgb, sem, depth = _synthetic_pano(32, seed=21)
  pos = np.zeros((1, 3), np.float32)
  targets = np.asarray([[0.2, 0.1, 0.0], [-0.1, 0.3, 0.05]], np.float32)

  model.add_to_memory(rgb, sem, depth, pos)
  ref_outs = [model(t[None], add_preds_to_memory=True) for t in targets]
  ref_mem = model.get_memory_state()

  model.reset_memory()
  model.add_to_memory(rgb, sem, depth, pos)
  traj = model.predict_trajectory(targets)

  assert traj.pred_rgb.shape == (2, 1, 32, 64, 3)
  for i, ref in enumerate(ref_outs):
    for field in ref._fields:
      if getattr(ref, field) is None:  # vestigial nav-graph fields
        assert getattr(traj, field) is None
        continue
      np.testing.assert_array_equal(
          np.asarray(getattr(traj, field)[i]),
          np.asarray(getattr(ref, field)), err_msg=f'{field}[{i}]')
  new_mem = model.get_memory_state()
  for field in ref_mem._fields:
    np.testing.assert_array_equal(np.asarray(getattr(ref_mem, field)),
                                  np.asarray(getattr(new_mem, field)),
                                  err_msg=field)
  assert model._frames_written == 3
  with pytest.raises(ValueError, match='exceed'):
    model.predict_trajectory(np.zeros((1, 3), np.float32))


def test_pole_compact_bit_identical():
  """pole_compact=True statically drops the pole-masked RGB rows (the
  reference drops them dynamically, models.py:229-237): every output of
  every frame must be bitwise identical to the uncompacted layout, with
  ~25% fewer RGB cloud slots."""
  import dataclasses
  h = 32
  rgb, sem, depth = _synthetic_pano(h, seed=17)
  rgb2, sem2, depth2 = _synthetic_pano(h, seed=18)
  pos = np.zeros((1, 3), np.float32)
  pos2 = np.asarray([[0.3, 0.1, 0.0]], np.float32)
  targets = [np.asarray([[0.2, 0.1, 0.0]], np.float32),
             np.asarray([[-0.1, 0.4, 0.05]], np.float32)]

  outs = {}
  for flag in (False, True):
    config = dataclasses.replace(model_config.get_test_config(),
                                 pole_compact=flag)
    m = inference.SE3DSModel(config)
    m.add_to_memory(rgb, sem, depth, pos, mask_blurred=True)
    m.add_to_memory(rgb2, sem2, depth2, pos2, mask_blurred=True)
    # One read-only prediction + one autoregressive feedback write.
    outs[flag] = [m(targets[0]),
                  m(targets[1], add_preds_to_memory=True)]
    if flag:
      r0, r1 = inference.pole_valid_rows(h)
      assert m.rgb_capacity == config.memory_frames * (r1 - r0) * 2 * h
      assert m.get_memory_state().rgb.shape[1] == m.rgb_capacity
      assert m.rgb_capacity < m.capacity

  for out_off, out_on in zip(outs[False], outs[True]):
    for field in out_off._fields:
      if getattr(out_off, field) is None:
        assert getattr(out_on, field) is None
        continue
      np.testing.assert_array_equal(
          np.asarray(getattr(out_off, field)),
          np.asarray(getattr(out_on, field)), err_msg=field)


def test_pole_valid_rows_matches_mask_pano():
  """pole_valid_rows must stay in lockstep with geometry.mask_pano's row
  arithmetic (compaction exactness depends on it: drift would silently
  drop valid RGB points or keep void ones)."""
  from se3ds_tpu.ops import geometry
  for h in (16, 31, 32, 64, 512):
    img = jnp.ones((1, h, 2 * h, 3), jnp.int32)
    masked = np.asarray(geometry.mask_pano(img, masked_region_value=-99))
    surviving = np.where(~np.all(masked[0] == -99, axis=(1, 2)))[0]
    r0, r1 = inference.pole_valid_rows(h)
    assert (surviving[0], surviving[-1] + 1) == (r0, r1), h
    assert len(surviving) == r1 - r0, h


def test_pole_compact_rejects_unmasked_writes():
  """Compaction is only valid when the pole rows were masked to void;
  an unmasked write must fail loudly with a pointer to the config."""
  import dataclasses
  config = dataclasses.replace(model_config.get_test_config(),
                               pole_compact=True)
  m = inference.SE3DSModel(config)
  rgb, sem, depth = _synthetic_pano(32, seed=19)
  with pytest.raises(ValueError, match='pole_compact'):
    m.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32),
                    mask_blurred=False)
  # State layouts are not portable across pole_compact settings.
  other = inference.SE3DSModel(model_config.get_test_config())
  with pytest.raises(ValueError, match='RGB capacity'):
    m.set_memory_state(other.get_memory_state())


def test_pole_compact_ply_export(tmp_path):
  import dataclasses
  config = dataclasses.replace(model_config.get_test_config(),
                               pole_compact=True)
  m = inference.SE3DSModel(config)
  rgb, sem, depth = _synthetic_pano(32, seed=20)
  m.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  path = tmp_path / 'cloud_compact.ply'
  m.write_memory_as_pointcloud(str(path))
  lines = path.read_text().splitlines()
  n = int([l for l in lines if l.startswith('element vertex')][0].split()[-1])
  assert 0 < n <= m._rgb_frame_points
  assert len(lines) == 10 + n


def _mostly_equal(a, b, msg, frac=0.01):
  """Numerical equivalence across batch sizes: XLA tiles convolutions
  differently for different batch dims, so generator floats carry ~1e-7
  ULP deltas; quantisation to uint8/int32 can flip a unit at bin
  boundaries, and a flipped fed-back byte can (rarely) flip a splat
  winner. Integer fields: <frac of elements off by >1; float fields:
  <frac outside a tight isclose."""
  a, b = np.asarray(a), np.asarray(b)
  if a.dtype.kind in 'ui':
    bad = np.abs(a.astype(np.int64) - b.astype(np.int64)) > 1
  else:
    bad = ~np.isclose(a, b, rtol=1e-4, atol=1e-5)
  assert bad.mean() < frac, f'{msg}: {bad.mean():.4f} of elements differ'


def test_batched_serving_matches_single_scene_models():
  """batch_size=N serves N independent scenes in lockstep through one
  program (the reference requires batch 1, models.py:95-96). Splat
  guidance from shared memory must be bitwise identical to N separate
  batch-1 models; generator-derived fields agree to float tolerance
  (XLA tiles convs differently per batch size — batching is a
  throughput lever, not a math change)."""
  import dataclasses
  h = 32
  panos = [_synthetic_pano(h, seed=s) for s in (31, 32)]
  pos0 = np.zeros((2, 3), np.float32)
  # Distinct target positions per scene.
  targets = np.asarray([[0.2, 0.1, 0.0], [-0.3, 0.2, 0.05]], np.float32)

  base = model_config.get_test_config()
  batched = inference.SE3DSModel(dataclasses.replace(base, batch_size=2))
  rgb = np.concatenate([p[0] for p in panos])
  sem = np.concatenate([p[1] for p in panos])
  depth = np.concatenate([p[2] for p in panos])
  batched.add_to_memory(rgb, sem, depth, pos0)
  out_b = [batched(targets), batched(targets, add_preds_to_memory=True)]
  traj_b = batched.predict_trajectory(targets[None])  # (T=1, N=2, 3)
  assert traj_b.pred_rgb.shape == (1, 2, h, 2 * h, 3)

  exact_first_frame = ('proj_semantic', 'proj_rgb', 'proj_depth', 'proj_mask')
  for i, (rgb_i, sem_i, depth_i) in enumerate(panos):
    single = inference.SE3DSModel(base)
    single.add_to_memory(rgb_i, sem_i, depth_i, pos0[i:i + 1])
    out_s = [single(targets[i:i + 1]),
             single(targets[i:i + 1], add_preds_to_memory=True)]
    traj_s = single.predict_trajectory(targets[i:i + 1][None])
    # Pre-feedback memory is identical ints, so the guidance splat of the
    # first frame must be bitwise equal: batch elements are fully isolated.
    for field in exact_first_frame:
      np.testing.assert_array_equal(
          np.asarray(getattr(out_b[0], field)[i:i + 1]),
          np.asarray(getattr(out_s[0], field)),
          err_msg=f'{field}[scene {i}]')
    for ob, os_ in zip(out_b, out_s):
      for field in ob._fields:
        if getattr(ob, field) is None:
          continue
        _mostly_equal(getattr(ob, field)[i:i + 1], getattr(os_, field),
                      f'{field}[scene {i}]')
    for field in traj_b._fields:
      if getattr(traj_b, field) is None:
        continue
      _mostly_equal(getattr(traj_b, field)[:, i:i + 1],
                    getattr(traj_s, field), f'traj {field}[scene {i}]')


def test_use_projected_rgb_feedback(model):
  """use_projected_rgb (reference models.py:327-333): the RETURNED
  predictions add the projected guidance, while the memory feed and the
  previous-frame feedback stay the raw generated outputs."""
  model.reset_memory()
  rgb, sem, depth = _synthetic_pano(model.height, seed=51)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  target = np.asarray([[0.2, 0.1, 0.0]], np.float32)

  ro = model(target)  # read-only baseline (same extent bucket)
  upr = model(target, add_preds_to_memory=True, use_projected_rgb=True)
  # Guidance fields are untouched by the flag.
  for field in ('proj_semantic', 'proj_rgb', 'proj_depth', 'proj_mask'):
    np.testing.assert_array_equal(np.asarray(getattr(upr, field)),
                                  np.asarray(getattr(ro, field)), field)
  # Returned depth/rgb add the projection onto the raw predictions
  # (compared against a read-only call from a DIFFERENT program, so
  # generator floats carry ~1-ULP fusion-context deltas — tolerance,
  # not array_equal; the formula itself is pinned in _step_forward).
  np.testing.assert_allclose(
      np.asarray(upr.pred_depth),
      np.asarray(ro.proj_depth) + np.asarray(ro.pred_depth),
      rtol=1e-5, atol=1e-6)
  raw_int = np.asarray(ro.pred_rgb, np.int64)
  proj_int = np.asarray(ro.proj_rgb, np.int64)
  _mostly_equal(np.asarray(upr.pred_rgb, np.int64),
                np.clip(raw_int + proj_int, 0, 255), 'pred_rgb')
  # Memory advanced by one frame; prev feedback is the re-quantised raw
  # generated RGB, not the projected sum.
  assert model._frames_written == 2
  prev = np.asarray(model.prev_rgb_frame)
  assert prev.shape == (1, model.height, model.width, 3)
  assert prev.min() >= 0.0 and prev.max() <= 1.0


def test_predict_poses_matches_per_pose_calls(model):
  """K read-only poses of one scene in one program (the VLN inner loop;
  the reference dispatches per pose). Splat guidance must be bitwise
  equal to per-pose `__call__`s — min/max scatters are order-independent
  so batching cannot change winners; generator fields agree to float
  tolerance (conv tiling differs at batch K, incl. the pow2 padding)."""
  model.reset_memory()
  rgb, sem, depth = _synthetic_pano(model.height, seed=41)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  poses = np.asarray([[0.2, 0.1, 0.0], [-0.3, 0.2, 0.05], [0.0, -0.4, 0.0]],
                     np.float32)  # K=3 pads to bucket 4
  batch = model.predict_poses(poses)
  assert batch.pred_rgb.shape == (3, model.height, model.width, 3)
  for i in range(3):
    single = model(poses[i:i + 1])
    for field in ('proj_semantic', 'proj_rgb', 'proj_depth', 'proj_mask'):
      np.testing.assert_array_equal(
          np.asarray(getattr(batch, field)[i:i + 1]),
          np.asarray(getattr(single, field)), err_msg=f'{field}[pose {i}]')
    for field in batch._fields:
      if getattr(batch, field) is None:
        continue
      _mostly_equal(getattr(batch, field)[i:i + 1], getattr(single, field),
                    f'{field}[pose {i}]')
  # Memory untouched; multi-scene models are rejected.
  assert model._frames_written == 1
  with pytest.raises(ValueError, match=r'\(K, 3\)'):
    model.predict_poses(np.zeros((2, 1, 3), np.float32))


def test_spatial_sharded_generator_model_matches_single_device():
  """SE3DSModel on a (2 data x 4 spatial) mesh: splat points sharded
  over 'data' AND the generator spatially partitioned (pano height over
  'spatial', GSPMD conv halo exchange); outputs match the single-device
  model within conv-reassociation float tolerance."""
  import jax
  from se3ds_tpu.parallel import mesh as mesh_lib
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 devices')
  mesh24 = mesh_lib.create_mesh(num_data=2, num_spatial=4)

  rgb, sem, depth = _synthetic_pano(32, seed=13)
  pos = np.zeros((1, 3), np.float32)
  target = np.asarray([[0.2, 0.1, -0.05]], np.float32)

  outs = {}
  for mesh in (None, mesh24):
    config = model_config.get_test_config()
    m = inference.SE3DSModel(config, mesh=mesh)
    if mesh is not None:
      assert m._spatial_shard
    m.add_to_memory(rgb, sem, depth, pos)
    outs[mesh is None] = m(target)

  single, sharded = outs[True], outs[False]
  for field in ('proj_rgb', 'proj_semantic', 'proj_mask'):
    np.testing.assert_array_equal(
        np.asarray(getattr(single, field)),
        np.asarray(getattr(sharded, field)), err_msg=field)
  np.testing.assert_allclose(
      np.asarray(single.proj_depth), np.asarray(sharded.proj_depth),
      rtol=0, atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(single.pred_depth), np.asarray(sharded.pred_depth),
      rtol=0, atol=2e-3)
  assert np.max(np.abs(
      np.asarray(single.pred_rgb, np.int32)
      - np.asarray(sharded.pred_rgb, np.int32))) <= 1


def test_mesh_degrades_pallas_to_fast():
  """splat_mode='pallas' is always safe to request (auto-degrades where
  Mosaic is unavailable); with a mesh it must degrade to its semantic
  twin 'fast' — which has a sharded path — instead of raising, while
  'sorted' (different semantics, no sharded path) still fails loudly."""
  import dataclasses
  import jax
  from se3ds_tpu.parallel import mesh as mesh_lib
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 devices')
  mesh8 = mesh_lib.create_mesh(num_data=8, num_spatial=1)
  base = model_config.get_test_config()
  m = inference.SE3DSModel(
      dataclasses.replace(base, splat_mode='pallas'), mesh=mesh8)
  assert m.config.splat_mode == 'fast'
  m_exact = inference.SE3DSModel(
      dataclasses.replace(base, splat_mode='pallas_exact'), mesh=mesh8)
  assert m_exact.config.splat_mode == 'scatter'
  with pytest.raises(ValueError, match='no sharded path'):
    inference.SE3DSModel(
        dataclasses.replace(base, splat_mode='sorted'), mesh=mesh8)


def test_mesh_sharded_model_matches_single_device():
  """SE3DSModel(mesh=...) shards the splat point axis over 8 devices;
  outputs match the single-device model (projections bit-equal up to
  fusion ULPs in depth; generator outputs within float tolerance)."""
  import jax
  from se3ds_tpu.parallel import mesh as mesh_lib
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 devices')
  mesh8 = mesh_lib.create_mesh(num_data=8, num_spatial=1)

  rgb, sem, depth = _synthetic_pano(32, seed=11)
  pos = np.zeros((1, 3), np.float32)
  target = np.asarray([[0.3, -0.1, 0.05]], np.float32)

  outs = {}
  for mesh in (None, mesh8):
    config = model_config.get_test_config()
    m = inference.SE3DSModel(config, mesh=mesh)
    m.add_to_memory(rgb, sem, depth, pos)
    outs[mesh is None] = m(target)

  single, sharded = outs[True], outs[False]
  # Packed-feature projections are bit-equal (associative combines).
  for field in ('proj_rgb', 'proj_semantic', 'proj_mask'):
    np.testing.assert_array_equal(
        np.asarray(getattr(single, field)),
        np.asarray(getattr(sharded, field)), err_msg=field)
  # Depth and generator outputs may differ by fusion ULPs.
  np.testing.assert_allclose(
      np.asarray(single.proj_depth), np.asarray(sharded.proj_depth),
      rtol=0, atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(single.pred_depth), np.asarray(sharded.pred_depth),
      rtol=0, atol=1e-4)
  assert np.max(np.abs(
      np.asarray(single.pred_rgb, np.int32)
      - np.asarray(sharded.pred_rgb, np.int32))) <= 1


def test_memory_state_survives_donation(model):
  """The mutating paths DONATE the model's buffers (in-place memory
  writes); `get_memory_state` must return a state that stays valid and
  bit-identical across later mutations, and `set_memory_state` must not
  adopt (and thereby invalidate) the caller's arrays."""
  model.reset_memory()
  h = model.height
  rgb, sem, depth = _synthetic_pano(h, seed=11)
  pos = np.zeros((1, 3), np.float32)
  target = np.array([[0.2, 0.1, 0.0]], np.float32)

  model.add_to_memory(rgb, sem, depth, pos)
  snap = model.get_memory_state()
  snap_rgb = np.asarray(snap.rgb)
  out_a = model(target, add_preds_to_memory=True)  # donates internals

  # The snapshot is still readable and unchanged by the mutation.
  np.testing.assert_array_equal(np.asarray(snap.rgb), snap_rgb)
  assert int(snap.cursor) == h * h * 2

  # Restoring the snapshot reproduces the mutated step bit-for-bit, and
  # the caller's snapshot survives ANOTHER donation round after being
  # handed to set_memory_state.
  model.reset_memory()
  model.add_to_memory(rgb, sem, depth, pos)  # rebuild prev_rgb_frame
  model.set_memory_state(snap)
  out_b = model(target, add_preds_to_memory=True)
  np.testing.assert_array_equal(np.asarray(out_a.pred_rgb),
                                np.asarray(out_b.pred_rgb))
  np.testing.assert_array_equal(np.asarray(snap.rgb), snap_rgb)


def _ring_config(**kw):
  import dataclasses
  return dataclasses.replace(model_config.get_test_config(),
                             memory_mode='ring', **kw)


def test_ring_below_capacity_matches_strict(model):
  """Until the first wrap, ring mode is bit-identical to strict."""
  model.reset_memory()
  # Same deterministic PRNGKey(0) init as the fixture -> identical
  # weights (folded variables are not portable across models).
  ring = inference.SE3DSModel(_ring_config())
  h = model.height
  rgb, sem, depth = _synthetic_pano(h, seed=21)
  pos = np.zeros((1, 3), np.float32)
  targets = [np.array([[0.2, 0.0, 0.0]], np.float32),
             np.array([[0.3, 0.1, 0.0]], np.float32)]
  outs = {}
  for name, m in (('strict', model), ('ring', ring)):
    m.reset_memory()
    m.add_to_memory(rgb, sem, depth, pos)
    outs[name] = [m(t, add_preds_to_memory=True) for t in targets]
  for a, b in zip(outs['strict'], outs['ring']):
    np.testing.assert_array_equal(np.asarray(a.pred_rgb),
                                  np.asarray(b.pred_rgb))
    np.testing.assert_array_equal(np.asarray(a.pred_depth),
                                  np.asarray(b.pred_depth))


def test_ring_wrap_holds_last_k_frames():
  """Past capacity, ring writes overwrite the OLDEST frame's slots: the
  memory is a sliding window over the last `memory_frames` observations
  (strict mode raises instead, test_memory_overflow_raises)."""
  cfg = _ring_config(memory_frames=2)
  m = inference.SE3DSModel(cfg)
  h, w = m.height, m.width
  frame_pts = h * w
  depth = np.full((1, h, w), 0.5, np.float32)
  sem = np.ones((1, h, w, 1), np.int32)
  pos = np.zeros((1, 3), np.float32)

  for value in (10, 20, 30):  # 3 frames into a 2-frame ring
    rgb = np.full((1, h, w, 3), value, np.int32)
    m.add_to_memory(rgb, sem, depth, pos, mask_blurred=False)

  mem = m.get_memory_state()
  rgb_buf = np.asarray(mem.rgb)
  # Slot 0 was overwritten by frame 3; slot 1 still holds frame 2.
  assert set(np.unique(rgb_buf[0, :frame_pts])) == {30.0}
  assert set(np.unique(rgb_buf[0, frame_pts:2 * frame_pts])) == {20.0}
  assert int(mem.cursor) == m.capacity  # both slots valid
  assert m._frames_written == 2 and m._total_frames == 3

  # A 4th frame lands on slot 1 (the now-oldest frame 2).
  m.add_to_memory(np.full((1, h, w, 3), 40, np.int32), sem, depth, pos,
                  mask_blurred=False)
  rgb_buf = np.asarray(m.get_memory_state().rgb)
  assert set(np.unique(rgb_buf[0, :frame_pts])) == {30.0}
  assert set(np.unique(rgb_buf[0, frame_pts:2 * frame_pts])) == {40.0}


def test_ring_trajectory_matches_per_frame_across_wrap():
  """The fused trajectory and the per-frame feedback loop stay bitwise
  identical when the ring wraps mid-trajectory (traced write slots vs
  per-call host slots)."""
  cfg = _ring_config()  # memory_frames=3
  base = inference.SE3DSModel(cfg)
  h = base.height
  rgb, sem, depth = _synthetic_pano(h, seed=22)
  pos = np.zeros((1, 3), np.float32)
  targets = np.array([[0.2, 0.0, 0.0], [0.1, 0.2, 0.0], [0.3, 0.1, 0.0],
                      [0.0, 0.3, 0.0]], np.float32)  # 1 GT + 4 > capacity 3

  base.add_to_memory(rgb, sem, depth, pos)
  ref_outs = [base(t[None], add_preds_to_memory=True) for t in targets]
  assert base._total_frames == 5 and base._frames_written == 3

  fused = inference.SE3DSModel(cfg)  # same PRNGKey(0) init
  fused.add_to_memory(rgb, sem, depth, pos)
  traj = fused.predict_trajectory(targets)
  assert fused._total_frames == 5 and fused._frames_written == 3

  for t, ref in enumerate(ref_outs):
    np.testing.assert_array_equal(np.asarray(traj.pred_rgb[t]),
                                  np.asarray(ref.pred_rgb), err_msg=f't={t}')
    np.testing.assert_array_equal(np.asarray(traj.pred_depth[t]),
                                  np.asarray(ref.pred_depth))
  np.testing.assert_array_equal(
      np.asarray(fused.get_memory_state().rgb),
      np.asarray(base.get_memory_state().rgb))
