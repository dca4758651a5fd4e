"""SE3DS-TPU benchmark: 1024x512 panoramas/sec/chip on MP3D inference.

Runs the flagship inference pipeline (point-cloud memory splat -> RGB-D
generator forward, `SE3DSModel.__call__` equivalent) at 1024x512 with the
production model config (gen_dims=128, ResNet-101) and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no GPU throughput numbers
(BASELINE.md); we anchor `vs_baseline` to an estimated reference-GPU
throughput of 2.0 panoramas/sec (V100-class, TF2 graph mode, 512x1024
RedNet-101 forward + TF scatter splat). The driver's north star is >=5x
that anchor.

Env knobs:
  SE3DS_BENCH_MODE   inference (default) | train | eval | trajectory | stream
  SE3DS_BENCH_SIZE   image height (default 512; train mode default 128)
  SE3DS_BENCH_DTYPE  float32|bfloat16 (default bfloat16)
  SE3DS_BENCH_FRAMES memory capacity in frames (default 2)
  SE3DS_BENCH_ITERS  timed iterations (default 10)
  SE3DS_BENCH_REPEATS measurement windows; the MEDIAN window is reported
                     and the spread printed to stderr (inference mode,
                     default 3 — relay load varies ~3% night-to-night)
  SE3DS_BENCH_GENDIMS generator dims (default 128)
  SE3DS_BENCH_SPLAT  any ops/splat mode: scatter|sorted|sorted_packed|
                     fast|fast_exact|pallas|pallas_exact (defaults:
                     inference/trajectory/stream 'fast'; eval
                     'pallas_exact' — the fastest EXACT mode, see
                     PERF.md round-4 mode menu)
  SE3DS_BENCH_BATCH  per-chip train batch (train mode, default 8);
                     scenes served in lockstep (inference mode, default 1)
  SE3DS_BENCH_SEM_ELIDE trajectory mode: 0 = defeat the real-semantics
                     splat elision for an A/B (default 1)
  SE3DS_BENCH_FUSED  trajectory mode: 1 = one XLA program for all T
                     frames (default), 0 = per-frame host loop A/B
  SE3DS_BENCH_BUDGET_S wall-clock budget in seconds from process start
                     (default 420). Window loops measure as many windows
                     as fit and report the median of those completed
                     (>=1). Timestamped heartbeats go to stderr; SIGTERM
                     emits the last completed-window result before dying.
  SE3DS_BENCH_CACHE_DIR persistent XLA compilation-cache dir (default
                     <repo>/.jax_cache; works through the axon relay, so
                     a warm cache removes the remote-compile wait)

The GPU anchor (2.0 panoramas/sec) is a conservative estimate for the
reference TF2 pipeline on a V100-class GPU: the generator alone is
6.3 TFLOPs/frame (~50 ms at full fp32 utilisation on 125 TFLOP/s tensor
cores, realistically 100-200 ms), plus two tf scatter-based splats.
"""

import json
import os
import signal
import sys
import time

GPU_BASELINE_PANOS_PER_SEC = 2.0
GPU_BASELINE_TRAIN_STEPS_PER_SEC = 1.0  # est. 128x256 batch-8 G+D step


V5E_PEAK_BF16_TFLOPS = 197.0

_T0 = time.perf_counter()
# Best-effort result updated after every completed measurement window; the
# SIGTERM handler emits it so an external `timeout` kill still yields a
# parseable line (the r04 driver capture died with zero output — never again).
_PARTIAL = {'result': None}


def hb(msg):
  """Timestamped stderr heartbeat so a timed-out run is diagnosable."""
  print(f'# [{time.strftime("%H:%M:%S")} +{time.perf_counter() - _T0:6.1f}s]'
        f' {msg}', file=sys.stderr, flush=True)


def emit(result):
  _PARTIAL['result'] = result
  print(json.dumps(result), flush=True)


def _sigterm_rescue(signum, frame):
  del frame
  hb(f'signal {signum} received')
  if _PARTIAL['result'] is not None:
    print(json.dumps(_PARTIAL['result']), flush=True)
    hb('emitted last completed-window result before dying')
  os._exit(0 if _PARTIAL['result'] is not None else 124)


def budget_deadline():
  """Wall-clock budget (from process start) for the measurement protocol.

  Default 420 s: well under typical external timeouts, generous next to the
  warm-cache path (~60 s end to end). Window loops measure as many windows
  as fit and report the median of however many completed (always >= 1).
  """
  return _T0 + float(os.environ.get('SE3DS_BENCH_BUDGET_S', 420))


def setup_cache():
  """Persistent XLA compilation cache: verified to work through the axon
  relay (entries serialized locally, reloaded across processes), so a
  cache-warm bench run skips the minutes-long remote compile that killed
  the round-4 driver capture (BENCH_r04.json rc=124)."""
  import jax
  cache_dir = os.environ.get(
      'SE3DS_BENCH_CACHE_DIR',
      os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
  try:
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # Keep the default min-compile-time threshold (1 s): caching EVERY
    # eager op round-trips each tiny compile through the relay and makes
    # param init minutes slower (measured: 487 entries, +5 min). Only the
    # big model programs — the ones whose remote compile killed the r04
    # capture — clear the threshold and get cached.
    hb(f'compilation cache at {cache_dir}')
  except Exception as e:  # never let cache plumbing kill the bench
    hb(f'compilation cache unavailable: {e}')


def bench_train():
  """G+D train-step throughput at the lowres recipe on this chip.

  Dispatches `SE3DS_BENCH_NBS`-step fused clusters (lax.scan, the same
  path Trainer.train uses, mirroring the reference's num_batched_steps
  fusion, gan_manager.py:376-385) and reports steps/sec + MFU (from the
  analytic utils/flops.py jaxpr-walk count vs the v5e bf16 peak; XLA's
  cost_analysis under-reports ~15x through the relay).

  The production gen_dims=128 G (1.1B params) exceeds one v5e's 16 GB
  HBM in optimizer state alone (PERF.md 'Memory limits'); ZeRO-1 over
  the data axis is the multi-chip answer. Single-chip numbers use the
  largest feasible width/batch (SE3DS_BENCH_GENDIMS/SE3DS_BENCH_BATCH).
  """
  import functools
  import jax
  import jax.numpy as jnp
  import numpy as np
  from se3ds_tpu.models import discriminator as disc_lib
  from se3ds_tpu.models import generator as gen_lib
  from se3ds_tpu.train import state as state_lib

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 128))
  batch = int(os.environ.get('SE3DS_BENCH_BATCH', 4))
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 3))
  nbs = int(os.environ.get('SE3DS_BENCH_NBS', 10))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 64))
  remat = os.environ.get('SE3DS_BENCH_REMAT', '0') == '1'
  dtype = (jnp.bfloat16 if os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
           == 'bfloat16' else jnp.float32)
  h, w = size, size * 2

  generator = gen_lib.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, resnet_version='101', dtype=dtype)
  discriminator = disc_lib.SNMultiScaleDiscriminator(
      dis_dims=gen_dims, n_dis=2, n_layers=6, dtype=dtype)
  g_tx, d_tx = state_lib.make_optimizers(1e-4, 4e-4, 0.5, 0.999)
  hp = state_lib.GANHParams(d_step_per_g_step=2, remat=remat)

  rng = jax.random.PRNGKey(0)
  keys = jax.random.split(rng, 8)
  full = batch * hp.d_step_per_g_step
  batch_data = {
      'image': jax.random.uniform(keys[0], (full, h, w, 3)),
      'depth': jax.random.uniform(keys[1], (full, h, w, 1)),
      'proj_image': jax.random.uniform(keys[2], (full, h, w, 3)),
      'proj_depth': jax.random.uniform(keys[3], (full, h, w, 1)),
      'proj_mask': jnp.ones((full, h, w, 1)),
      'blurred_mask': jnp.zeros((full, h, w, 1)),
  }
  cond = {k: batch_data[k][:1] for k in
          ('proj_image', 'proj_depth', 'proj_mask', 'blurred_mask')}
  disc_in = jnp.concatenate(
      [batch_data['image'][:1], batch_data['depth'][:1]], -1)
  st = state_lib.create_train_state(jax.random.PRNGKey(1), generator,
                                    discriminator, cond, disc_in, g_tx, d_tx)
  hb('train state built')
  cluster = {k: jnp.broadcast_to(v, (nbs,) + v.shape)
             for k, v in batch_data.items()}
  cluster_fn = jax.jit(functools.partial(
      state_lib.train_cluster, generator=generator,
      discriminator=discriminator, g_tx=g_tx, d_tx=d_tx, hp=hp),
      donate_argnums=(0,))

  # Analytic conv+matmul FLOPs (XLA's cost_analysis under-reports ~15x
  # through the relay backend; see utils/flops.py).
  from se3ds_tpu.utils import flops as flops_lib
  flops_per_cluster = flops_lib.count_flops(
      lambda s, c: state_lib.train_cluster(
          s, c, generator=generator, discriminator=discriminator,
          g_tx=g_tx, d_tx=d_tx, hp=hp),
      st, cluster)
  hb('analytic FLOP count done')

  st, metrics = cluster_fn(st, cluster)
  hb('warmup cluster dispatched; fetching (first fetch = remote compile)')
  _ = np.asarray(metrics['gen/gen_loss'])  # compile barrier (host fetch)
  hb('compile fetch done')
  t0 = time.perf_counter()
  _ = np.asarray(metrics['gen/gen_loss'])
  fetch_latency = time.perf_counter() - t0

  t0 = time.perf_counter()
  for _ in range(iters):
    st, metrics = cluster_fn(st, cluster)
  _ = np.asarray(metrics['gen/gen_loss'])
  elapsed = max(time.perf_counter() - t0 - fetch_latency, 1e-9)
  steps_per_sec = iters * nbs / elapsed
  tag = ', remat' if remat else ''
  result = {
      'metric': (f'{w}x{h} batch-{batch} gen_dims-{gen_dims} G+D train '
                 f'steps/sec/chip (d:g=2:1, {nbs}-step clusters{tag})'),
      'value': round(steps_per_sec, 4),
      'unit': 'steps/sec',
      'vs_baseline': round(
          steps_per_sec / GPU_BASELINE_TRAIN_STEPS_PER_SEC, 4),
  }
  if flops_per_cluster:
    tflops = flops_per_cluster * iters / elapsed / 1e12
    result['mfu'] = round(tflops / V5E_PEAK_BF16_TFLOPS, 4)
    result['tflops_per_sec'] = round(tflops, 2)
  emit(result)


def bench_eval():
  """FID-eval rollout throughput: autoregressive memory/splat/generate
  loop + on-device Inception pooling (the continuous-eval hot path,
  reference eval_metric.py:144-252), exact 'pallas_exact' splat (the
  trainer's eval default; SE3DS_BENCH_SPLAT overrides), lowres shapes.

  Env: SE3DS_BENCH_SIZE (default 128), SE3DS_BENCH_BATCH (default 8),
  SE3DS_BENCH_FRAMES (eval_seq_len, default 5), SE3DS_BENCH_GENDIMS
  (default 128), SE3DS_BENCH_ITERS (default 3).
  """
  import functools
  import jax
  import jax.numpy as jnp
  import numpy as np
  from se3ds_tpu.eval import inception as inception_lib
  from se3ds_tpu.eval import metrics as metrics_lib
  from se3ds_tpu.models import generator as gen_lib

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 128))
  batch = int(os.environ.get('SE3DS_BENCH_BATCH', 8))
  seq_len = int(os.environ.get('SE3DS_BENCH_FRAMES', 5))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 128))
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 3))
  dtype = (jnp.bfloat16 if os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
           == 'bfloat16' else jnp.float32)
  h, w = size, size * 2

  model = gen_lib.ResNetGenerator(image_size=size, gen_dims=gen_dims,
                                  resnet_version='101', dtype=dtype)
  cond = {
      'proj_image': jnp.zeros((batch, h, w, 3)),
      'proj_depth': jnp.zeros((batch, h, w, 1)),
      'proj_mask': jnp.ones((batch, h, w, 1)),
      'blurred_mask': jnp.zeros((batch, h, w, 1)),
  }
  variables = model.init(jax.random.PRNGKey(0), cond, train=False)
  inception_vars = inception_lib.init_variables()
  hb('models initialised')

  def generator_apply(v, c):
    full = dict(c)
    full.setdefault('blurred_mask', jnp.zeros_like(c['proj_mask']))
    return model.apply(v, full, train=False)

  rng = np.random.RandomState(0)
  video = {
      'image': jnp.asarray(
          rng.rand(batch, seq_len, h, w, 3).astype(np.float32)),
      'depth': jnp.asarray(
          rng.uniform(0.05, 0.9,
                      (batch, seq_len, h, w, 1)).astype(np.float32)),
      'position': jnp.asarray(
          rng.uniform(-1, 1, (batch, seq_len, 4)).astype(np.float32)
          * np.array([1, 1, 0.1, 0])),
  }

  splat_mode = os.environ.get('SE3DS_BENCH_SPLAT', 'pallas_exact')
  if splat_mode in ('pallas', 'pallas_exact'):
    # Eager Mosaic probe: first hit during the jit trace below would
    # silently degrade this program (see splat_pallas.pallas_available).
    from se3ds_tpu.ops import splat_pallas
    (splat_pallas.pallas_available if splat_mode == 'pallas'
     else splat_pallas.pallas_exact_available)()

  @jax.jit
  def eval_step(v, batch_in, key):
    generated, rmse, _ = metrics_lib.rollout_generated(
        generator_apply, v, batch_in, seq_len, 20.0, True,
        splat_mode=splat_mode)
    keys = jax.random.split(key, seq_len)
    pools = {}
    for i in range(1, seq_len):
      aug = metrics_lib._augment_crop_for_inception(generated[i], keys[i])
      pools[i], _ = inception_lib.get_inception(aug, inception_vars)
    return pools, rmse

  pools, rmse = eval_step(variables, video, jax.random.PRNGKey(1))
  hb('warmup rollout dispatched; fetching (first fetch = remote compile)')
  _ = np.asarray(pools[1][0, :2])
  hb('compile fetch done')
  t0 = time.perf_counter()
  _ = np.asarray(pools[1][0, :2])
  fetch_latency = time.perf_counter() - t0

  t0 = time.perf_counter()
  for _ in range(iters):
    pools, rmse = eval_step(variables, video, jax.random.PRNGKey(2))
  _ = np.asarray(pools[1][0, :2])
  elapsed = max(time.perf_counter() - t0 - fetch_latency, 1e-9)
  frames_per_sec = iters * batch * seq_len / elapsed
  result = {
      'metric': (f'{w}x{h} eval-rollout frames/sec/chip ({splat_mode} '
                 f'splat + Inception pools, T={seq_len}, batch {batch})'),
      'value': round(frames_per_sec, 4),
      'unit': 'frames/sec',
      # Each rollout frame is one guidance splat + generator forward,
      # same anchor as inference mode (2 frames/sec GPU estimate),
      # though at lowres eval resolution.
      'vs_baseline': round(frames_per_sec / GPU_BASELINE_PANOS_PER_SEC, 4),
  }
  emit(result)


def bench_stream():
  """Sustained streaming serving: a ring-buffer memory
  (`SE3DSConfig.memory_mode='ring'`) slides a `memory_frames` window
  over an UNBOUNDED autoregressive trajectory at constant HBM, so a
  steady state exists — every frame splats the full window and feeds
  its prediction back. The reference cannot run this workload at all:
  its memory grows by H*W points per frame (models.py:239-245), so
  frame time grows linearly until OOM. Reports steady-state
  panoramas/sec at the full window (production 1024x512 shapes).

  Env: SE3DS_BENCH_SIZE (512), SE3DS_BENCH_FRAMES (window size,
  default 4), SE3DS_BENCH_ITERS (timed steady-state frames, default
  10), SE3DS_BENCH_GENDIMS (128), SE3DS_BENCH_SPLAT.
  """
  import numpy as np
  from se3ds_tpu.models import inference, model_config

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 512))
  dtype = os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
  frames = int(os.environ.get('SE3DS_BENCH_FRAMES', 4))
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 10))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 128))

  config = model_config.SE3DSConfig(
      ckpt_path=None, image_height=size, gen_dims=gen_dims,
      resnet_version='101', memory_frames=frames, compute_dtype=dtype,
      memory_mode='ring',
      splat_mode=os.environ.get('SE3DS_BENCH_SPLAT', 'fast'))
  model = inference.SE3DSModel(config)

  h, w = size, size * 2
  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))

  targets = (rng.uniform(-1, 1, (frames + 1 + iters, 1, 3))
             .astype(np.float32) * np.array([1, 1, 0.1], np.float32))

  # Warm to steady state: fill the window (compiling each pow2 extent
  # bucket once) and wrap once, so the timed frames reuse ONE program
  # (full-window extent, traced ring slot).
  step = 0
  for _ in range(frames + 1):
    out = model(targets[step], add_preds_to_memory=True)
    step += 1
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  t0 = time.perf_counter()
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  fetch_latency = time.perf_counter() - t0

  t0 = time.perf_counter()
  for _ in range(iters):
    out = model(targets[step], add_preds_to_memory=True)
    step += 1
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  elapsed = max(time.perf_counter() - t0 - fetch_latency, 1e-9)
  panos_per_sec = iters / elapsed
  emit({
      'metric': (f'{w}x{h} streaming panoramas/sec/chip (ring window '
                 f'{frames} frames, steady state)'),
      'value': round(panos_per_sec, 4),
      'unit': 'panoramas/sec',
      'vs_baseline': round(panos_per_sec / GPU_BASELINE_PANOS_PER_SEC, 4),
  })


def bench_trajectory():
  """Fused autoregressive trajectory serving: `predict_trajectory` runs
  splat -> generate -> unproject -> memory-feedback for T frames in ONE
  XLA program (no host round-trips between frames). Production 1024x512
  shapes; reports frames/sec/chip.

  Env: SE3DS_BENCH_SIZE (512), SE3DS_BENCH_FRAMES (memory capacity and
  trajectory length; default 8 -> 1 GT frame + 7 predicted),
  SE3DS_BENCH_ITERS (5), SE3DS_BENCH_GENDIMS (128), SE3DS_BENCH_SPLAT.
  SE3DS_BENCH_FUSED=0 drives the SAME workload per-frame from the host
  (__call__ with add_preds_to_memory=True, the reference's only serving
  mode) for an A/B against the fused program.
  """
  import jax
  import jax.numpy as jnp
  import numpy as np
  from se3ds_tpu.models import inference, model_config

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 512))
  dtype = os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
  frames = int(os.environ.get('SE3DS_BENCH_FRAMES', 8))
  if frames < 2:
    raise SystemExit('trajectory mode needs SE3DS_BENCH_FRAMES >= 2 '
                     '(1 GT frame + at least 1 predicted).')
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 5))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 128))

  config = model_config.SE3DSConfig(
      ckpt_path=None, image_height=size, gen_dims=gen_dims,
      resnet_version='101', memory_frames=frames, compute_dtype=dtype,
      # SE3DS_BENCH_DONATE=0 disables buffer donation for an A/B of the
      # in-place memory writes.
      donate_memory=os.environ.get('SE3DS_BENCH_DONATE', '1') != '0',
      splat_mode=os.environ.get('SE3DS_BENCH_SPLAT', 'fast'))
  model = inference.SE3DSModel(config)

  h, w = size, size * 2
  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (1, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (1, h, w)).astype(np.float32)
  model.add_to_memory(rgb, sem, depth, np.zeros((1, 3), np.float32))
  # get_memory_state() copies, so mem0/prev0 survive the donation of the
  # model's own buffers by each mutating run.
  mem0 = model.get_memory_state()
  prev0 = jnp.copy(model.prev_rgb_frame)

  t_len = frames - 1
  targets = (rng.uniform(-1, 1, (t_len, 1, 3)).astype(np.float32)
             * np.array([1, 1, 0.1], np.float32))

  # Every run DONATES the restored buffers (in-place memory writes), so
  # each timed iteration needs its own snapshot; copy them OUTSIDE the
  # timing loop so restore is a pointer swap, not a device copy.
  def make_snapshots():
    return [(jax.tree.map(jnp.copy, mem0), jnp.copy(prev0))
            for _ in range(iters)]

  # SE3DS_BENCH_SEM_ELIDE=0 defeats the real-semantics elision (the
  # semantic splat then covers the full live extent every frame, as if
  # predicted frames held real semantics) for a back-to-back A/B of the
  # static void-frame slicing.
  sem_elide = os.environ.get('SE3DS_BENCH_SEM_ELIDE', '1') != '0'

  def restore(snap):
    # Bypass set_memory_state: its cursor fetch is a host sync that
    # would serialise the timing loop.
    model._memory, model.prev_rgb_frame = snap
    model._frames_written = model._total_frames = 1
    model._sem_real = ([True] * frames if not sem_elide
                       else [i == 0 for i in range(frames)])

  fused = os.environ.get('SE3DS_BENCH_FUSED', '1') != '0'

  def run():
    if fused:
      return model.predict_trajectory(targets)
    # The reference's only serving mode: one host dispatch per frame.
    for t in range(t_len):
      out = model(targets[t], add_preds_to_memory=True)
    return out

  # Warm up through restore() so the compile covers the same program
  # variant the timed runs use (the SE3DS_BENCH_SEM_ELIDE flip changes
  # the static semantic extent, i.e. the jit cache key).
  restore((jax.tree.map(jnp.copy, mem0), jnp.copy(prev0)))
  out = run()  # compile (per-frame mode compiles each extent bucket)
  hb('trajectory warmup dispatched; fetching (first fetch = remote compile)')
  _ = np.asarray(out.pred_rgb[..., 0, 0, :4])
  hb('compile fetch done')
  t0 = time.perf_counter()
  _ = np.asarray(out.pred_rgb[..., 0, 0, :4])
  fetch_latency = time.perf_counter() - t0

  # Same variance-robust, budget-bounded protocol as inference mode: up
  # to K independent windows within the wall-clock budget, median of
  # however many completed (>=1) reported, spread printed (snapshots are
  # re-copied per window OUTSIDE its timing, since every run donates them).
  deadline = budget_deadline()
  repeats = int(os.environ.get('SE3DS_BENCH_REPEATS', 3))
  tag = 'fused-trajectory' if fused else 'per-frame trajectory'
  unit_tag = 'frames/program' if fused else 'host dispatches/frame'

  def current_result():
    return {
        'metric': (f'{w}x{h} {tag} panoramas/sec/chip '
                   f'(T={t_len} autoregressive {unit_tag})'),
        'value': round(float(np.median(window_rates)), 4),
        'unit': 'panoramas/sec',
        'vs_baseline': round(
            float(np.median(window_rates)) / GPU_BASELINE_PANOS_PER_SEC, 4),
    }

  window_rates = []
  last_window_s = 0.0
  for k in range(repeats):
    # As in inference mode: cheap windows (few seconds) always complete
    # even past the budget — a median-of-3 beats a median-of-1 and the
    # added seconds are negligible vs the driver-kill margin.
    if window_rates and last_window_s > 5.0 and (
        time.perf_counter() + 1.4 * last_window_s > deadline):
      hb(f'budget: stopping after {len(window_rates)} windows')
      break
    snapshots = make_snapshots()
    # Fetch barrier: the snapshot copies are async device work; drain
    # them before the window timer starts (block_until_ready does not
    # synchronise through the relay).
    _ = np.asarray(snapshots[-1][1][..., 0, 0, :1])
    t0 = time.perf_counter()
    for snap in snapshots:
      restore(snap)
      out = run()
    _ = np.asarray(out.pred_rgb[..., 0, 0, :4])
    last_window_s = time.perf_counter() - t0
    elapsed = max(last_window_s - fetch_latency, 1e-9)
    window_rates.append(iters * t_len / elapsed)
    _PARTIAL['result'] = current_result()
    hb(f'window {k + 1}/{repeats}: {window_rates[-1]:.2f} panos/sec '
       f'({last_window_s:.1f}s)')
  frames_per_sec = float(np.median(window_rates))
  if len(window_rates) > 1:
    spread = (max(window_rates) - min(window_rates)) / frames_per_sec
    print(f'# windows {[round(r, 2) for r in window_rates]} '
          f'panos/sec; median {frames_per_sec:.2f}, spread '
          f'{spread * 100:.1f}%', file=sys.stderr)
  emit(current_result())


def main():
  signal.signal(signal.SIGTERM, _sigterm_rescue)
  mode = os.environ.get('SE3DS_BENCH_MODE', 'inference')
  hb(f'start mode={mode} pid={os.getpid()}')
  setup_cache()
  if mode == 'train':
    bench_train()
    return
  if mode == 'eval':
    bench_eval()
    return
  if mode == 'trajectory':
    bench_trajectory()
    return
  if mode == 'stream':
    bench_stream()
    return
  import jax
  import jax.numpy as jnp
  import numpy as np

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 512))
  dtype = os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
  frames = int(os.environ.get('SE3DS_BENCH_FRAMES', 2))
  iters = int(os.environ.get('SE3DS_BENCH_ITERS', 10))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 128))
  # Independent scenes served in lockstep (the reference cannot batch at
  # all: models.py:95-96). Headline stays batch 1; batched-serving
  # throughput is reported separately in PERF.md.
  batch = int(os.environ.get('SE3DS_BENCH_BATCH', 1))

  from se3ds_tpu.models import inference, model_config

  deadline = budget_deadline()
  config = model_config.SE3DSConfig(
      ckpt_path=None, image_height=size, gen_dims=gen_dims,
      resnet_version='101', memory_frames=frames, compute_dtype=dtype,
      batch_size=batch,
      splat_mode=os.environ.get('SE3DS_BENCH_SPLAT', 'fast'))
  model = inference.SE3DSModel(config)
  hb('model built')

  h, w = size, size * 2
  rng = np.random.RandomState(0)
  rgb = rng.randint(0, 256, (batch, h, w, 3)).astype(np.int32)
  sem = rng.randint(0, 42, (batch, h, w, 1)).astype(np.int32)
  depth = rng.uniform(0.05, 0.9, (batch, h, w)).astype(np.float32)
  pos = np.zeros((batch, 3), np.float32)
  model.add_to_memory(rgb, sem, depth, pos)

  target = np.tile(np.array([[0.8, 0.3, 0.0]], np.float32), (batch, 1))

  # Warmup / compile. NOTE: on relay-backed TPU backends,
  # jax.block_until_ready does not synchronise; a host fetch is the only
  # reliable barrier, and the first fetch triggers the remote compile.
  out = model(target)
  hb('warmup dispatched; fetching (first fetch = remote compile, can '
     'take minutes cold / seconds cache-warm)')
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  hb('compile fetch done')

  # Measure the fetch round-trip latency on a materialised array.
  t0 = time.perf_counter()
  _ = np.asarray(out.pred_rgb[0, 0, :4])
  fetch_latency = time.perf_counter() - t0

  # Variance-robust protocol: up to K independent measurement windows
  # within the wall-clock budget; report the MEDIAN of however many
  # completed (>=1) and print the spread. Relay/host load moves single
  # windows ~3% night-to-night (PERF.md); the median + published spread
  # makes the headline comparable across rounds.
  repeats = int(os.environ.get('SE3DS_BENCH_REPEATS', 3))
  window_rates = []
  enqueue_elapsed = 0.0
  last_window_s = 0.0

  def current_result():
    panos_per_sec = float(np.median(window_rates))
    batch_tag = f', batch {batch}' if batch > 1 else ''
    return {
        'metric': f'{w}x{h} panoramas/sec/chip (MP3D inference{batch_tag})',
        'value': round(panos_per_sec, 4),
        'unit': 'panoramas/sec',
        'vs_baseline': round(panos_per_sec / GPU_BASELINE_PANOS_PER_SEC, 4),
    }

  # Untimed spin window: the first post-compile window consistently
  # reads ~5% low (device/relay ramp — e.g. windows [14.79, 15.51,
  # 15.67] cold, [15.57, 15.91, 16.12] warm on 2026-08-21); one
  # throwaway window (~1 s) lets every MEASURED window run steady-state.
  if time.perf_counter() + 5.0 < deadline:
    for _ in range(iters):
      out = model(target)
    _ = np.asarray(out.pred_rgb[0, 0, :4])
    hb('spin window done')

  for k in range(repeats):
    # Budget stop — but only when a window is actually expensive: after
    # a slow remote compile eats the budget, the ~0.7 s windows are
    # negligible risk vs a driver kill and a median-of-3 beats a
    # median-of-1 (measured: compile fetch alone ranged 150-443 s
    # across 2026-08-21 runs with identical code and a warm cache).
    if window_rates and last_window_s > 5.0 and (
        time.perf_counter() + 1.2 * last_window_s > deadline):
      hb(f'budget: stopping after {len(window_rates)} windows')
      break
    t0 = time.perf_counter()
    for _ in range(iters):
      out = model(target)
    enqueue_elapsed = time.perf_counter() - t0  # host dispatch only
    _ = np.asarray(out.pred_rgb[0, 0, :4])
    last_window_s = time.perf_counter() - t0
    elapsed = max(last_window_s - fetch_latency, 1e-9)
    window_rates.append(iters * batch / elapsed)
    _PARTIAL['result'] = current_result()
    hb(f'window {k + 1}/{repeats}: {window_rates[-1]:.2f} panos/sec '
       f'({last_window_s:.1f}s)')
  if os.environ.get('SE3DS_BENCH_ENQUEUE', '0') == '1':
    # Host-side enqueue cost per call (dispatch/serialisation through the
    # relay). If this approaches the total, the loop is host-bound and
    # device-side optimisation cannot move the headline.
    print(f'# enqueue {enqueue_elapsed / iters * 1e3:.2f} ms/call (last '
          'window)', file=sys.stderr)

  if len(window_rates) > 1:
    panos_per_sec = float(np.median(window_rates))
    spread = (max(window_rates) - min(window_rates)) / panos_per_sec
    print(f'# windows {[round(r, 2) for r in window_rates]} '
          f'panos/sec; median {panos_per_sec:.2f}, spread '
          f'{spread * 100:.1f}%', file=sys.stderr)
  emit(current_result())


if __name__ == '__main__':
  main()
