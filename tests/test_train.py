"""Train-step tests: single-device correctness + 8-device GSPMD DP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from se3ds_tpu.models import discriminator as disc_lib
from se3ds_tpu.models import generator as gen_lib
from se3ds_tpu.parallel import mesh as mesh_lib
from se3ds_tpu.train import state as state_lib

SIZE = 32


def _make_models():
  generator = gen_lib.ResNetGenerator(image_size=SIZE, gen_dims=2, z_dim=2,
                                      resnet_version='tiny')
  discriminator = disc_lib.SNMultiScaleDiscriminator(n_dis=2, dis_dims=2,
                                                     n_layers=3)
  return generator, discriminator


def _make_batch(rng, batch):
  k = jax.random.split(rng, 8)
  h, w = SIZE, SIZE * 2
  return {
      'image': jax.random.uniform(k[0], (batch, h, w, 3)),
      'depth': jax.random.uniform(k[1], (batch, h, w, 1)),
      'proj_image': jax.random.uniform(k[2], (batch, h, w, 3)),
      'proj_depth': jax.random.uniform(k[3], (batch, h, w, 1)),
      'proj_mask': (jax.random.uniform(k[4], (batch, h, w, 1)) > 0.3
                    ).astype(jnp.float32),
      'blurred_mask': jnp.zeros((batch, h, w, 1)),
  }


def _make_state(generator, discriminator, g_tx, d_tx, batch):
  rng = jax.random.PRNGKey(0)
  cond = {k: batch[k][:1] for k in
          ('proj_image', 'proj_depth', 'proj_mask', 'blurred_mask')}
  disc_in = jnp.concatenate([batch['image'][:1], batch['depth'][:1]], -1)
  return state_lib.create_train_state(rng, generator, discriminator, cond,
                                      disc_in, g_tx, d_tx)


@pytest.fixture(scope='module')
def setup():
  generator, discriminator = _make_models()
  g_tx, d_tx = state_lib.make_optimizers(1e-4, 4e-4, 0.5, 0.999)
  hp = state_lib.GANHParams(d_step_per_g_step=2, num_batched_steps=2)
  batch = _make_batch(jax.random.PRNGKey(1), 4)  # 2 chunks of 2
  st = _make_state(generator, discriminator, g_tx, d_tx, batch)
  import functools
  step_fn = jax.jit(functools.partial(
      state_lib.train_step, generator=generator,
      discriminator=discriminator, g_tx=g_tx, d_tx=d_tx, hp=hp))
  return generator, discriminator, g_tx, d_tx, hp, batch, st, step_fn


def test_train_step_runs_and_updates(setup):
  generator, discriminator, g_tx, d_tx, hp, batch, st, step_fn = setup
  new_state, metrics = step_fn(st, batch)
  assert int(new_state.step) == 1
  for k in ('gen/gen_loss', 'dis/disc_loss', 'gen/wc_loss',
            'gen/depth_loss', 'gen/grad_norm'):
    v = float(metrics[k])
    assert np.isfinite(v), (k, v)
  # Params changed.
  g0 = jax.tree_util.tree_leaves(st.g_params)[0]
  g1 = jax.tree_util.tree_leaves(new_state.g_params)[0]
  assert not np.allclose(np.asarray(g0), np.asarray(g1))
  # EMA assigned (first window): ema == new generator params.
  e1 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
  np.testing.assert_allclose(np.asarray(e1), np.asarray(g1))


def test_ema_decay_phase(setup):
  generator, discriminator, g_tx, d_tx, hp, batch, st, step_fn = setup
  st = st.replace(step=jnp.asarray(100, jnp.int32))  # past init window
  new_state, _ = step_fn(st, batch)
  g1 = jax.tree_util.tree_leaves(new_state.g_params)[0]
  e1 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
  e0 = jax.tree_util.tree_leaves(st.ema_params)[0]
  expected = np.asarray(e0) - (np.asarray(e0) - np.asarray(g1)) * (1 - 0.999)
  np.testing.assert_allclose(np.asarray(e1), expected, atol=1e-6)


def test_train_step_8device_dp(setup):
  """Full train step jitted over an 8-device data-parallel mesh."""
  generator, discriminator, g_tx, d_tx, hp, _, st, _step = setup
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  mesh = mesh_lib.create_mesh(num_data=8, num_spatial=1)
  batch = _make_batch(jax.random.PRNGKey(2), 16)  # 2 chunks of 8
  batch = mesh_lib.shard_batch(batch, mesh)
  rep = mesh_lib.replicated(mesh)
  st = jax.device_put(st, rep)

  import functools
  step_fn = jax.jit(
      functools.partial(state_lib.train_step, generator=generator,
                        discriminator=discriminator, g_tx=g_tx, d_tx=d_tx,
                        hp=hp),
      out_shardings=(rep, rep))
  new_state, metrics = step_fn(st, batch)
  assert np.isfinite(float(metrics['gen/gen_loss']))
  assert np.isfinite(float(metrics['dis/disc_loss']))


def test_dp_matches_single_device(setup):
  """DP over 8 devices must equal single-device on the same global batch
  (the GSPMD claim: global-mean losses/stats are partition-invariant)."""
  generator, discriminator, g_tx, d_tx, hp, _, st, _step = setup
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  batch = _make_batch(jax.random.PRNGKey(3), 16)

  import functools
  base = functools.partial(state_lib.train_step, generator=generator,
                           discriminator=discriminator, g_tx=g_tx, d_tx=d_tx,
                           hp=hp)
  # Single device.
  s1, m1 = jax.jit(base)(st, batch)
  # 8-device DP.
  mesh = mesh_lib.create_mesh(num_data=8, num_spatial=1)
  rep = mesh_lib.replicated(mesh)
  st8 = jax.device_put(st, rep)
  b8 = mesh_lib.shard_batch(batch, mesh)
  s8, m8 = jax.jit(base, out_shardings=(rep, rep))(st8, b8)
  np.testing.assert_allclose(float(m1['gen/gen_loss']),
                             float(m8['gen/gen_loss']), rtol=2e-3)
  g1 = np.asarray(jax.tree_util.tree_leaves(s1.g_params)[0])
  g8 = np.asarray(jax.tree_util.tree_leaves(s8.g_params)[0])
  np.testing.assert_allclose(g1, g8, atol=5e-4)


def test_train_cluster_scan_matches_loop(setup):
  """lax.scan-fused cluster == python loop of train steps."""
  generator, discriminator, g_tx, d_tx, hp, _, st, step_fn = setup
  import functools
  batches = _make_batch(jax.random.PRNGKey(9), 8)  # 2 steps of 4
  stacked = {k: v.reshape((2, 4) + v.shape[1:]) for k, v in batches.items()}
  cluster_fn = jax.jit(functools.partial(
      state_lib.train_cluster, generator=generator,
      discriminator=discriminator, g_tx=g_tx, d_tx=d_tx, hp=hp))
  s_scan, m_scan = cluster_fn(st, stacked)
  s_loop = st
  for i in range(2):
    chunk = {k: v[i] for k, v in stacked.items()}
    s_loop, m_loop = step_fn(s_loop, chunk)
  assert int(s_scan.step) == int(s_loop.step) == 2
  g_scan = np.asarray(jax.tree_util.tree_leaves(s_scan.g_params)[0])
  g_loop = np.asarray(jax.tree_util.tree_leaves(s_loop.g_params)[0])
  np.testing.assert_allclose(g_scan, g_loop, atol=1e-5)


def test_optimizer_state_sharding_zero1(setup):
  """ZeRO-1: sharded Adam moments produce the same training result as
  replicated state, with opt-state leaves actually distributed."""
  generator, discriminator, g_tx, d_tx, hp, _, st, _step = setup
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  import functools
  mesh = mesh_lib.create_mesh(num_data=8, num_spatial=1)
  batch = _make_batch(jax.random.PRNGKey(12), 16)
  b8 = mesh_lib.shard_batch(batch, mesh)

  shardings = mesh_lib.train_state_shardings(st, mesh, shard_opt_state=True)
  st8 = jax.device_put(st, shardings)
  # At least one Adam moment leaf is genuinely sharded.
  leaves = jax.tree_util.tree_leaves(st8.g_opt_state)
  assert any(not l.sharding.is_fully_replicated for l in leaves
             if hasattr(l, 'sharding') and l.ndim >= 1)

  step_fn = jax.jit(
      functools.partial(state_lib.train_step, generator=generator,
                        discriminator=discriminator, g_tx=g_tx, d_tx=d_tx,
                        hp=hp),
      out_shardings=(shardings, mesh_lib.replicated(mesh)))
  s_sharded, m_sharded = step_fn(st8, b8)

  base = functools.partial(state_lib.train_step, generator=generator,
                           discriminator=discriminator, g_tx=g_tx,
                           d_tx=d_tx, hp=hp)
  s_rep, m_rep = jax.jit(base)(st, batch)
  g1 = np.asarray(jax.tree_util.tree_leaves(s_sharded.g_params)[0])
  g2 = np.asarray(jax.tree_util.tree_leaves(s_rep.g_params)[0])
  np.testing.assert_allclose(g1, g2, atol=5e-4)


def test_spatial_sharded_inference():
  """High-res inference sharded over the spatial axis: generator +
  guidance splat jitted over a (1 data x 8 spatial) mesh, pano height
  partitioned across devices (XLA inserts conv halo exchanges)."""
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  import functools
  from jax.sharding import NamedSharding, PartitionSpec as P
  from se3ds_tpu.models import inference as inf_lib

  mesh = mesh_lib.create_mesh(num_data=1, num_spatial=8)
  generator = gen_lib.ResNetGenerator(image_size=SIZE, gen_dims=2, z_dim=2,
                                      resnet_version='tiny')
  h, w = SIZE, SIZE * 2
  cond = {
      'proj_image': jnp.zeros((1, h, w, 3)),
      'proj_depth': jnp.zeros((1, h, w, 1)),
      'proj_mask': jnp.ones((1, h, w, 1)),
      'blurred_mask': jnp.zeros((1, h, w, 1)),
  }
  variables = generator.init(jax.random.PRNGKey(0), cond, train=False)

  memory = inf_lib.init_memory(1, 2 * h * w)
  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.1, 0.8, (1, h, w)).astype(np.float32)
  memory = inf_lib.memory_add_pano(memory, jnp.asarray(rgb),
                                   jnp.asarray(sem), jnp.asarray(depth),
                                   jnp.zeros((1, 3)), depth_scale=20.0)

  def forward(variables, memory, position):
    _, proj_depth, proj_rgb, proj_mask = inf_lib.memory_project(
        memory, position, h, w, 20.0, splat_mode='scatter')
    cond = {
        'proj_image': jnp.clip(proj_rgb / 255.0, 0, 1),
        'proj_depth': proj_depth[..., None],
        'proj_mask': proj_mask,
        'blurred_mask': jnp.zeros_like(proj_mask),
    }
    outs = generator.apply(variables, cond, train=False)
    return outs[6], outs[3]

  pos = jnp.asarray([[0.4, 0.1, 0.0]], jnp.float32)
  # Single-device reference.
  rgb_ref, depth_ref = jax.jit(forward)(variables, memory, pos)

  # Spatially sharded: image height (axis 1 of NHWC) over 'spatial'.
  rep = mesh_lib.replicated(mesh)
  img_sharding = NamedSharding(mesh, P(None, 'spatial'))
  out = jax.jit(forward, out_shardings=(img_sharding, img_sharding))(
      jax.device_put(variables, rep), jax.device_put(memory, rep),
      jax.device_put(pos, rep))
  rgb_sp, depth_sp = out
  assert not rgb_sp.sharding.is_fully_replicated
  np.testing.assert_allclose(np.asarray(rgb_sp), np.asarray(rgb_ref),
                             atol=2e-3)
  np.testing.assert_allclose(np.asarray(depth_sp), np.asarray(depth_ref),
                             atol=2e-3)


def test_elastic_restore_across_mesh_sizes(setup, tmp_path):
  """Elastic resume (reference gan_manager.py:324-331): a checkpoint
  saved from an 8-device ZeRO-1 run must restore bit-identically onto
  4-device and 1-device meshes (checkpoints are saved via
  jax.device_get, i.e. fully gathered — trainer.py save path), and
  training must continue: one post-restore step on the smaller mesh
  matches the same step taken on the original mesh (DP invariance).
  Also covers restoring a sharded-opt-state save into
  shard_opt_state=False."""
  generator, discriminator, g_tx, d_tx, hp, _, st0, _step = setup
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  import functools
  from se3ds_tpu.train import checkpoints as ckpt_lib

  base = functools.partial(state_lib.train_step, generator=generator,
                           discriminator=discriminator, g_tx=g_tx,
                           d_tx=d_tx, hp=hp)

  # Train 2 steps on the 8-device mesh with ZeRO-1 sharded opt state.
  mesh8 = mesh_lib.create_mesh(num_data=8, num_spatial=1)
  sh8 = mesh_lib.train_state_shardings(st0, mesh8, shard_opt_state=True)
  st8 = jax.device_put(st0, sh8)
  step8 = jax.jit(base, out_shardings=(sh8, mesh_lib.replicated(mesh8)))
  for seed in (20, 21):
    st8, _ = step8(st8, mesh_lib.shard_batch(
        _make_batch(jax.random.PRNGKey(seed), 16), mesh8))

  mgr = ckpt_lib.CheckpointManager(str(tmp_path))
  saved_host = jax.device_get(st8)  # full gather — mesh-shape-agnostic
  mgr.save(int(st8.step), saved_host)

  next_batch = _make_batch(jax.random.PRNGKey(22), 16)
  ref_next, _ = step8(st8, mesh_lib.shard_batch(next_batch, mesh8))
  ref_g = np.asarray(jax.tree_util.tree_leaves(ref_next.g_params)[0])

  template = jax.device_get(st0)
  for num_data, shard_opt in ((4, True), (1, True), (8, False)):
    restored = mgr.restore(template)
    assert restored is not None and int(restored.step) == 2
    # Bit-identical state round-trip.
    for a, b in zip(jax.tree_util.tree_leaves(saved_host),
                    jax.tree_util.tree_leaves(restored)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mesh = mesh_lib.create_mesh(num_data=num_data, num_spatial=1,
                                devices=jax.devices()[:num_data])
    sh = mesh_lib.train_state_shardings(restored, mesh,
                                        shard_opt_state=shard_opt)
    st_new = jax.device_put(restored, sh)
    step_fn = jax.jit(base, out_shardings=(sh, mesh_lib.replicated(mesh)))
    st_next, metrics = step_fn(
        st_new, mesh_lib.shard_batch(next_batch, mesh))
    assert int(st_next.step) == 3
    assert np.isfinite(float(metrics['gen/gen_loss']))
    # The continued step matches the uninterrupted 8-device run (DP
    # partition invariance, same global batch).
    g = np.asarray(jax.tree_util.tree_leaves(st_next.g_params)[0])
    np.testing.assert_allclose(g, ref_g, atol=5e-4)


def test_remat_train_step_matches(setup):
  """hp.remat recomputes forwards in the backward pass; results must be
  numerically identical to the stored-activation path."""
  import functools
  generator, discriminator, g_tx, d_tx, hp, batch, st, _step = setup
  base = functools.partial(state_lib.train_step, generator=generator,
                           discriminator=discriminator, g_tx=g_tx,
                           d_tx=d_tx)
  s1, m1 = jax.jit(functools.partial(base, hp=hp))(st, batch)
  s2, m2 = jax.jit(functools.partial(
      base, hp=hp._replace(remat=True)))(st, batch)
  for k in m1:
    np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                               rtol=1e-5, atol=1e-6)
  g1 = jax.tree_util.tree_leaves(s1.g_params)[0]
  g2 = jax.tree_util.tree_leaves(s2.g_params)[0]
  np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
