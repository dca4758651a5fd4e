"""Decomposes the GAN train step into measured phases on the real TPU.

PERF.md pins train MFU at ~46% from batch 32 and attributes the missing
54% to "the non-matmul fraction of a spectral-norm GAN step" — this
script turns that one-liner into numbers: each phase is timed as its own
fused program (lax.scan over SE3DS_PROF_NBS iterations inside one jit,
relay-safe fetch-barrier timing), alongside its analytic FLOP count, so
the table shows where the step time goes and which phases run far from
the MXU roofline.

Phases:
  cluster      full train_step (1 D-step + 1 G+D step), the bench unit
  d_step       D-only update (G fwd train-mode + D fwd/bwd + Adam-D)
  gd_step      joint G+D update (everything else of the step)
  g_branch     gen_loss_fn value_and_grad: G fwd+bwd INCLUDING the D
               forward and the backward through D to `generated` — the
               exact G-update gradient of the product step
  d_branch     disc_loss_fn value_and_grad on fixed (generated, depth):
               D fwd + bwd-to-params — the exact D-update gradient
  g_fwd        generator forward, train=True (BN stats + SN u updates)
  g_fwd_bwd    generator forward+backward (grads wrt params, no D)
  d_fwd        discriminator forward on the (2B) fake||real pair
  d_fwd_bwd    discriminator forward+backward
  adam_g/adam_d optax.adam update+apply on fixed grads
  ema          update_ema (assign-then-decay tree mix)

gd_step == g_branch + d_branch + adam_g + adam_d + ema + clip glue, so
those five rows decompose the joint step exactly; the g_fwd/g_fwd_bwd/
d_fwd micro rows attribute g_branch/d_branch internals.

Usage: python scripts/profile_train_phases.py
Env: SE3DS_BENCH_SIZE (128), SE3DS_BENCH_BATCH (32), SE3DS_BENCH_GENDIMS
     (64), SE3DS_PROF_NBS (10), SE3DS_PROF_ITERS (3),
     SE3DS_PROF_PHASES (comma list to run a subset, e.g.
     'g_branch,d_branch'; default all).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

V5E_PEAK_BF16_TFLOPS = 197.0


def main():
  import jax
  if os.environ.get('SE3DS_PROF_PLATFORM'):  # e.g. 'cpu' smoke runs
    jax.config.update('jax_platforms', os.environ['SE3DS_PROF_PLATFORM'])
  import jax.numpy as jnp
  from se3ds_tpu.models import discriminator as disc_lib
  from se3ds_tpu.models import generator as gen_lib
  from se3ds_tpu.train import state as state_lib
  from se3ds_tpu.utils import flops as flops_lib

  size = int(os.environ.get('SE3DS_BENCH_SIZE', 128))
  batch = int(os.environ.get('SE3DS_BENCH_BATCH', 32))
  gen_dims = int(os.environ.get('SE3DS_BENCH_GENDIMS', 64))
  resnet = os.environ.get('SE3DS_BENCH_RESNET', '101')  # 'tiny' for CPU smoke
  nbs = int(os.environ.get('SE3DS_PROF_NBS', 10))
  iters = int(os.environ.get('SE3DS_PROF_ITERS', 3))
  dtype = (jnp.bfloat16 if os.environ.get('SE3DS_BENCH_DTYPE', 'bfloat16')
           == 'bfloat16' else jnp.float32)
  h, w = size, size * 2

  generator = gen_lib.ResNetGenerator(
      image_size=size, gen_dims=gen_dims, resnet_version=resnet, dtype=dtype)
  discriminator = disc_lib.SNMultiScaleDiscriminator(
      dis_dims=gen_dims, n_dis=2, n_layers=6, dtype=dtype)
  g_tx, d_tx = state_lib.make_optimizers(1e-4, 4e-4, 0.5, 0.999)
  hp = state_lib.GANHParams(d_step_per_g_step=2)

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
  chunk = {k: v[:batch] for k, v in batch_data.items()}
  cond = {k: batch_data[k][:1] for k in
          ('proj_image', 'proj_depth', 'proj_mask', 'blurred_mask')}
  disc_in = jnp.concatenate(
      [batch_data['image'][:1], batch_data['depth'][:1]], -1)
  st = state_lib.create_train_state(jax.random.PRNGKey(1), generator,
                                    discriminator, cond, disc_in, g_tx, d_tx)
  pair_in = jnp.concatenate([
      jnp.concatenate([chunk['image'], chunk['depth']], -1),
      jnp.concatenate([chunk['proj_image'], chunk['proj_depth']], -1),
  ], axis=0).astype(dtype)

  def time_phase(name, body, carry0, fetch, flops_one=None):
    """Times nbs fused iterations of `body`; returns ms/iteration.

    The jitted program returns ONLY the (tiny) fetch value — returning
    the full carried state would keep a second multi-GB state copy
    resident alongside `carry0` and OOM the 16 GB chip at the
    production profile shapes (each fn(carry0) call reuses the same
    input; the nbs-step chain lives inside the scan)."""
    def prog(carry):
      out, _ = jax.lax.scan(lambda c, _: (body(c), None), carry,
                            None, length=nbs)
      return fetch(out)
    fn = jax.jit(prog)
    barrier = lambda o: [np.asarray(l) for l in jax.tree_util.tree_leaves(o)]
    out = fn(carry0)
    barrier(out)  # compile + barrier
    t0 = time.perf_counter()
    barrier(out)
    fetch_latency = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
      out = fn(carry0)
    barrier(out)
    elapsed = max(time.perf_counter() - t0 - fetch_latency, 1e-9)
    ms = elapsed / (iters * nbs) * 1e3
    row = {'phase': name, 'ms': round(ms, 3)}
    if flops_one:
      tflops = flops_one / (ms / 1e3) / 1e12
      row['tflops_per_sec'] = round(tflops, 1)
      row['mxu_util'] = round(tflops / V5E_PEAK_BF16_TFLOPS, 3)
    print(json.dumps(row))
    return ms

  # --- phase bodies (each carries the train state so the scan has a
  # real dependency chain; inputs are closed over as constants).
  #
  # Hoisting defeat for the MICRO phases: with constant params and
  # constant inputs, XLA hoists the whole conv pipeline out of the scan
  # (loop-invariant code motion) and a 10-step scan times one forward —
  # observed directly (g_fwd "2.8 ms" vs a ~25 ms standalone forward).
  # Every micro body therefore (a) jitters its input by step * 1e-20
  # (adds one cheap elementwise op; makes the input iteration-variant),
  # (b) feeds results back with a * (1 + g * 1e-30)-style updates that
  # XLA cannot fold away, and (c) advances s.step. The cluster/d/gd
  # phases use the real train-step functions, which chain naturally.
  def _jitter(s, tree):
    eps = jnp.float32(s.step).astype(jnp.float32) * 1e-20
    return jax.tree_util.tree_map(lambda v: v + eps.astype(v.dtype), tree)

  def body_cluster(s):
    s, _ = state_lib.train_step(
        s, batch_data, generator=generator, discriminator=discriminator,
        g_tx=g_tx, d_tx=d_tx, hp=hp)
    return s

  def body_d(s):
    return state_lib.train_d_step(
        s, chunk, generator=generator, discriminator=discriminator,
        d_tx=d_tx, hp=hp)

  def body_gd(s):
    s, _ = state_lib.train_g_d_step(
        s, chunk, generator=generator, discriminator=discriminator,
        g_tx=g_tx, d_tx=d_tx, hp=hp)
    return s

  def body_g_branch(s):
    """The exact G-update gradient of train_g_d_step (state.py:213-256):
    G fwd (train) + wc/depth/kld losses + D fwd + backward through D to
    `generated` and on through G to g_params."""
    jchunk = _jitter(s, chunk)

    def loss(p):
      g_out, new_g_state = state_lib._generator_forward(
          generator, p, s.g_state, jchunk, train=True)
      _, _, kld, depth_out, _, _, generated = g_out
      import se3ds_tpu.train.losses as losses_lib
      mask = (jchunk['depth'] > 0) & (jchunk['depth'] < 1)
      depth_loss = jnp.mean(jnp.abs(depth_out - jchunk['depth'])
                            * mask.astype(depth_out.dtype)) * hp.lambda_depth
      wc = jnp.mean(losses_lib.wc_loss(
          generated, jchunk['proj_image'], jchunk['proj_mask'])) * hp.lambda_wc
      all_input = state_lib._disc_pair_input(generated, depth_out, jchunk, hp)
      logit_outputs, _ = state_lib._disc_forward(
          discriminator, s.d_params, s.d_state, all_input, train=False,
          mutate=False)
      fake_list, real_list = losses_lib.split_disc_outputs(logit_outputs)
      gen_gan_loss, _ = losses_lib.multiscale_gan_losses(fake_list, real_list)
      total = gen_gan_loss * hp.lambda_gan + depth_loss + wc + jnp.mean(kld)
      return total, dict(new_g_state)
    (_, new_state), grads = jax.value_and_grad(loss, has_aux=True)(s.g_params)
    new_p = jax.tree_util.tree_map(lambda a, g: a * (1 + 1e-30) + g * 1e-30,
                                   s.g_params, grads)
    return s.replace(g_params=new_p, g_state=new_state, step=s.step + 1)

  def body_d_branch(s):
    """The exact D-update gradient of train_g_d_step (state.py:267-278):
    D fwd (train, spectral u mutate) + bwd to d_params on a fixed
    fake||real pair."""
    jpair = _jitter(s, pair_in)

    def loss(p):
      import se3ds_tpu.train.losses as losses_lib
      logit_outputs, new_d_state = state_lib._disc_forward(
          discriminator, p, s.d_state, jpair, train=True, mutate=True)
      fake_list, real_list = losses_lib.split_disc_outputs(logit_outputs)
      _, disc_loss = losses_lib.multiscale_gan_losses(fake_list, real_list)
      return disc_loss * hp.lambda_gan, new_d_state
    (_, new_state), grads = jax.value_and_grad(loss, has_aux=True)(s.d_params)
    new_p = jax.tree_util.tree_map(lambda a, g: a * (1 + 1e-30) + g * 1e-30,
                                   s.d_params, grads)
    return s.replace(d_params=new_p, d_state=new_state, step=s.step + 1)

  def body_g_fwd(s):
    (outs, new_state) = generator.apply(
        {'params': s.g_params, **s.g_state}, _jitter(s, chunk), train=True,
        mutable=['batch_stats', 'spectral'])
    # Output feeds the carried step so the forward is not dead code.
    bump = (jnp.mean(outs[6].astype(jnp.float32)) * 1e-30).astype(jnp.int32)
    return s.replace(g_state=dict(new_state), step=s.step + 1 + bump)

  def body_g_fwd_bwd(s):
    def loss(p):
      outs, new_state = generator.apply(
          {'params': p, **s.g_state}, _jitter(s, chunk), train=True,
          mutable=['batch_stats', 'spectral'])
      return jnp.mean(outs[6].astype(jnp.float32)), dict(new_state)
    (_, new_state), grads = jax.value_and_grad(loss, has_aux=True)(
        s.g_params)
    # Feed the grads back (non-foldably) so the scan iterations chain.
    new_p = jax.tree_util.tree_map(lambda a, g: a * (1 + 1e-30) + g * 1e-30,
                                   s.g_params, grads)
    return s.replace(g_params=new_p, g_state=new_state, step=s.step + 1)

  def body_d_fwd(s):
    outs, new_state = discriminator.apply(
        {'params': s.d_params, **s.d_state}, _jitter(s, pair_in), train=True,
        mutable=['spectral'])
    bump = (jnp.mean(outs[0][-1].astype(jnp.float32)) * 1e-30).astype(
        jnp.int32)
    return s.replace(d_state={**s.d_state, **dict(new_state)},
                     step=s.step + 1 + bump)

  def body_d_fwd_bwd(s):
    def loss(p):
      outs, new_state = discriminator.apply(
          {'params': p, **s.d_state}, _jitter(s, pair_in), train=True,
          mutable=['spectral'])
      total = sum(jnp.mean(o[-1].astype(jnp.float32)) for o in outs)
      return total, {**s.d_state, **dict(new_state)}
    (_, new_state), grads = jax.value_and_grad(loss, has_aux=True)(
        s.d_params)
    new_p = jax.tree_util.tree_map(lambda a, g: a * (1 + 1e-30) + g * 1e-30,
                                   s.d_params, grads)
    return s.replace(d_params=new_p, d_state=new_state, step=s.step + 1)

  # Grads are materialised INSIDE the traced bodies (ones_like of the
  # params): eager full-size grads trees would stay resident for the
  # whole profile run and crowd the 16 GB HBM.
  def body_adam_g(s):
    grads = jax.tree_util.tree_map(jnp.ones_like, s.g_params)
    upd, new_opt = g_tx.update(grads, s.g_opt_state, s.g_params)
    import optax
    return s.replace(g_params=optax.apply_updates(s.g_params, upd),
                     g_opt_state=new_opt)

  def body_adam_d(s):
    grads = jax.tree_util.tree_map(jnp.ones_like, s.d_params)
    upd, new_opt = d_tx.update(grads, s.d_opt_state, s.d_params)
    import optax
    return s.replace(d_params=optax.apply_updates(s.d_params, upd),
                     d_opt_state=new_opt)

  def body_ema(s):
    new_ema, new_ema_state = state_lib.update_ema(
        s.step + nbs + 1, s.ema_params, s.ema_state, s.g_params,
        s.g_state, hp)
    return s.replace(ema_params=new_ema, ema_state=new_ema_state)

  # Each phase's fetch MUST read state the body actually writes: the
  # jitted program returns only the fetch value, so an unread chain is
  # dead code and XLA deletes the whole scan.
  fetch_g = lambda s: s.g_params['rgb_conv']['conv0']['kernel'][0, 0, 0, :2]
  fetch_d = lambda s: jax.tree_util.tree_leaves(s.d_params)[0].ravel()[:2]
  fetch_e = lambda s: jax.tree_util.tree_leaves(s.ema_params)[0].ravel()[:2]
  # Forward-only bodies write (step, g_state/d_state): read both.
  fetch_gf = lambda s: (s.step,
                        jax.tree_util.tree_leaves(s.g_state)[0].ravel()[:2])
  fetch_df = lambda s: (s.step,
                        jax.tree_util.tree_leaves(s.d_state)[0].ravel()[:2])

  def count(fn, *args):
    try:
      return flops_lib.count_flops(fn, *args)
    except Exception:
      return None

  print(f'# shapes: {w}x{h}, batch {batch} (pair input {2 * batch}), '
        f'gen_dims {gen_dims}, d:g=2:1, {nbs}-step scans x {iters}')

  phases = {
      # name: (label, body, fetch)
      'cluster': ('cluster (1 D + 1 G+D step)', body_cluster, fetch_g),
      'd_step': ('d_step', body_d, fetch_d),
      'gd_step': ('gd_step', body_gd, fetch_g),
      'g_branch': ('g_branch (G fwd+bwd incl. D fwd + bwd-to-generated)',
                   body_g_branch, fetch_g),
      'd_branch': ('d_branch (D fwd+bwd-to-params, train mode)',
                   body_d_branch, fetch_d),
      'g_fwd': ('g_fwd (train mode)', body_g_fwd, fetch_gf),
      'g_fwd_bwd': ('g_fwd_bwd', body_g_fwd_bwd, fetch_g),
      'd_fwd': ('d_fwd (pair)', body_d_fwd, fetch_df),
      'd_fwd_bwd': ('d_fwd_bwd (pair)', body_d_fwd_bwd, fetch_d),
      'adam_g': ('adam_g', body_adam_g, fetch_g),
      'adam_d': ('adam_d', body_adam_d, fetch_d),
      'ema': ('ema', body_ema, fetch_e),
  }
  flop_counted = {'cluster', 'd_step', 'gd_step', 'g_branch', 'd_branch',
                  'g_fwd', 'g_fwd_bwd', 'd_fwd', 'd_fwd_bwd'}
  selected = os.environ.get('SE3DS_PROF_PHASES', '')
  names = ([n.strip() for n in selected.split(',') if n.strip()]
           if selected else list(phases))
  ms = {}
  for name in names:
    label, body, fetch = phases[name]
    # count_flops counts ONE body execution and time_phase reports
    # ms/body-iteration — pass the count through unscaled.
    fl = count(body, st) if name in flop_counted else None
    ms[name] = time_phase(label, body, st, fetch, fl)

  if {'cluster', 'd_step', 'gd_step'} <= ms.keys():
    print(f'# additivity: d_step + gd_step = '
          f'{ms["d_step"] + ms["gd_step"]:.1f} ms vs '
          f'cluster {ms["cluster"]:.1f} ms')
  if {'gd_step', 'g_branch', 'd_branch', 'adam_g', 'adam_d',
      'ema'} <= ms.keys():
    acc = (ms['g_branch'] + ms['d_branch'] + ms['adam_g'] + ms['adam_d']
           + ms['ema'])
    print(f'# gd_step = g_branch {ms["g_branch"]:.1f} + d_branch '
          f'{ms["d_branch"]:.1f} + adam_g {ms["adam_g"]:.1f} + adam_d '
          f'{ms["adam_d"]:.1f} + ema {ms["ema"]:.1f} = {acc:.1f} ms vs '
          f'measured {ms["gd_step"]:.1f} ms (gap = clip glue + CSE '
          f'across branches)')


if __name__ == '__main__':
  main()
