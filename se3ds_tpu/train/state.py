"""Train state and step functions for SE3DS GAN training.

Functional re-expression of the reference trainer (`/root/reference/
trainers/se3ds_trainer.py`, `trainers/gan_manager.py`) for GSPMD:

* One `TrainState` pytree bundles generator/discriminator params, their
  mutable collections (batch stats + spectral-norm `u` vectors), both Adam
  optimizer states, EMA generator params/state, and the global step —
  the same 6-way bundle the reference checkpoints (gan_manager.py:340-346).
* `train_step` performs one cluster element: (d_step_per_g_step - 1)
  discriminator-only updates followed by one joint G+D update, on a batch
  that is split along axis 0 (gan_manager.py:376-385).
* All means are over the *global* batch; under jit with the batch sharded
  on the `data` mesh axis, XLA inserts the cross-device reductions that
  the reference got from loss scaling + all-reduce
  (se3ds_trainer.py:230-234) and SyncBatchNorm.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from se3ds_tpu.train import losses as losses_lib


class GANHParams(NamedTuple):
  """Loss weights / schedule knobs (reference gin surface)."""
  lambda_gan: float = 1.0
  lambda_kld: float = 10.0
  lambda_wc: float = 10.0
  lambda_depth: float = 100.0
  predict_depth: bool = True
  dis_use_pred_depth: bool = True
  mask_blurred: bool = True
  d_step_per_g_step: int = 2
  ema_decay: float = 0.999
  ema_init_step: int = 0
  num_batched_steps: int = 100
  grad_clip_norm: float = 5.0
  # Rematerialise G/D forwards in the backward pass (jax.checkpoint):
  # trades ~1 extra forward of FLOPs for dropping all intermediate
  # activations from HBM — enables larger per-chip batches / widths.
  remat: bool = False


@struct.dataclass
class TrainState:
  step: jnp.ndarray
  g_params: Any
  g_state: Any  # {'batch_stats':…, 'spectral':…}
  d_params: Any
  d_state: Any
  ema_params: Any
  ema_state: Any
  g_opt_state: Any
  d_opt_state: Any


def make_optimizers(g_lr: float, d_lr: float, beta1: float, beta2: float):
  """Two Adam chains with Keras defaults (epsilon 1e-7),
  reference gan_manager.py:175-183."""
  g_tx = optax.adam(g_lr, b1=beta1, b2=beta2, eps=1e-7)
  d_tx = optax.adam(d_lr, b1=beta1, b2=beta2, eps=1e-7)
  return g_tx, d_tx


def create_train_state(rng, generator, discriminator, sample_cond,
                       sample_disc_input, g_tx, d_tx) -> TrainState:
  """Initializes models and optimizers."""
  g_rng, d_rng = jax.random.split(rng)
  g_vars = generator.init(g_rng, sample_cond, train=False)
  d_vars = discriminator.init(d_rng, sample_disc_input, train=False)
  g_params = g_vars['params']
  g_state = {k: v for k, v in g_vars.items() if k != 'params'}
  d_params = d_vars['params']
  d_state = {k: v for k, v in d_vars.items() if k != 'params'}
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      g_params=g_params,
      g_state=g_state,
      d_params=d_params,
      d_state=d_state,
      ema_params=jax.tree_util.tree_map(jnp.copy, g_params),
      ema_state=jax.tree_util.tree_map(jnp.copy, g_state),
      g_opt_state=g_tx.init(g_params),
      d_opt_state=d_tx.init(d_params),
  )


def _generator_forward(generator, params, state, inputs, train,
                       remat=False):
  variables = {'params': params, **state}
  if train:
    def fwd(variables, inputs):
      outputs, new_state = generator.apply(
          variables, inputs, train=True, mutable=['batch_stats', 'spectral'])
      return outputs, dict(new_state)
    if remat:
      fwd = jax.checkpoint(fwd)
    return fwd(variables, inputs)
  return generator.apply(variables, inputs, train=False), state


def _disc_forward(discriminator, params, state, x, train, mutate,
                  remat=False):
  variables = {'params': params, **state}
  if mutate:
    def fwd(variables, x):
      out, new_state = discriminator.apply(
          variables, x, train=train, mutable=['spectral'])
      return out, {**state, **dict(new_state)}
    if remat:
      fwd = jax.checkpoint(fwd)
    return fwd(variables, x)
  def fwd_pure(variables, x):
    return discriminator.apply(variables, x, train=train)
  if remat:
    fwd_pure = jax.checkpoint(fwd_pure)
  return fwd_pure(variables, x), state


def _replicate_tree(tree, mesh):
  """Pins a parameter/gradient pytree to replicated sharding.

  Under a (data x spatial) mesh the backward pass of spatially-partitioned
  convs otherwise leaves kernel gradients with activation-derived
  shardings, and the SPMD partitioner falls back to "involuntary full
  rematerialization" when resharding them into the (ZeRO-1) optimizer
  shardings. Gradients are logically replicated after the implicit
  data-axis psum, so the constraint is semantically free and turns the
  awkward transition into a plain all-gather at the point of production.
  No-op when mesh is None (single-device tests).
  """
  if mesh is None:
    return tree
  from jax.sharding import NamedSharding, PartitionSpec
  rep = NamedSharding(mesh, PartitionSpec())
  return jax.tree_util.tree_map(
      lambda g: jax.lax.with_sharding_constraint(g, rep), tree)


def _prepare_inputs(inputs: Dict[str, jnp.ndarray], hp: GANHParams):
  inputs = dict(inputs)
  if not hp.mask_blurred:
    inputs['blurred_mask'] = jnp.zeros_like(inputs['blurred_mask'])
  return inputs


def _disc_pair_input(generated, depth_out, inputs, hp: GANHParams):
  """Builds concat([fake, real]) discriminator input
  (reference se3ds_trainer.py:181-186)."""
  combined_input = inputs['depth']
  if hp.dis_use_pred_depth:
    fake_input = jnp.concatenate([generated, depth_out], axis=-1)
  else:
    fake_input = jnp.concatenate([generated, combined_input], axis=-1)
  real_input = jnp.concatenate([inputs['image'], combined_input], axis=-1)
  return jnp.concatenate([fake_input, real_input], axis=0)


def train_d_step(state: TrainState, inputs, *, generator, discriminator,
                 d_tx, hp: GANHParams, mesh=None) -> TrainState:
  """D-only update; G runs forward in train mode (stats update, no grads),
  reference se3ds_trainer.py:275-338."""
  inputs = _prepare_inputs(inputs, hp)
  g_out, new_g_state = _generator_forward(
      generator, state.g_params, state.g_state, inputs, train=True)
  _, _, _, depth_out, _, _, generated = g_out
  generated = jax.lax.stop_gradient(generated)
  depth_out = jax.lax.stop_gradient(depth_out)

  def disc_loss_fn(d_params):
    d_params = _replicate_tree(d_params, mesh)
    all_input = _disc_pair_input(generated, depth_out, inputs, hp)
    logit_outputs, new_d_state = _disc_forward(
        discriminator, d_params, state.d_state, all_input, train=True,
        mutate=True, remat=hp.remat)
    fake_list, real_list = losses_lib.split_disc_outputs(logit_outputs)
    _, disc_loss = losses_lib.multiscale_gan_losses(fake_list, real_list)
    disc_loss = hp.lambda_gan * disc_loss
    return disc_loss, new_d_state

  (disc_loss, new_d_state), d_grads = jax.value_and_grad(
      disc_loss_fn, has_aux=True)(state.d_params)
  d_grads = _replicate_tree(d_grads, mesh)
  d_grads = losses_lib.clip_grad_per_leaf(d_grads, hp.grad_clip_norm)
  d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state,
                                     state.d_params)
  new_d_params = optax.apply_updates(state.d_params, d_updates)
  return state.replace(
      g_state=new_g_state, d_params=new_d_params, d_state=new_d_state,
      d_opt_state=new_d_opt)


def train_g_d_step(state: TrainState, inputs, *, generator, discriminator,
                   g_tx, d_tx, hp: GANHParams, mesh=None
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
  """Joint G+D update (reference se3ds_trainer.py:129-273)."""
  inputs = _prepare_inputs(inputs, hp)
  blurred_mask = inputs['blurred_mask']
  target_spatial_mask = (
      (inputs['depth'] > 0) & (inputs['depth'] < 1)).astype(jnp.float32)
  num_spatial_pixels = jnp.maximum(
      jnp.sum(target_spatial_mask, axis=(1, 2, 3)), 1.0)

  def gen_loss_fn(g_params):
    g_params = _replicate_tree(g_params, mesh)
    g_out, new_g_state = _generator_forward(
        generator, g_params, state.g_state, inputs, train=True,
        remat=hp.remat)
    mu, logvar, kld, depth_out, _, _, generated = g_out

    depth_loss = 0.0
    if hp.predict_depth:
      depth_loss = jnp.abs(depth_out - inputs['depth']) * target_spatial_mask
      depth_loss = jnp.sum(depth_loss, axis=(1, 2, 3)) / num_spatial_pixels
      depth_loss = hp.lambda_depth * jnp.mean(depth_loss)

    kld_nan = jnp.sum(jnp.isnan(kld).astype(jnp.float32))
    kld = jnp.where(jnp.isnan(kld), 0.0, kld)
    kld_term = hp.lambda_kld * jnp.mean(kld)
    wc = hp.lambda_wc * losses_lib.wc_loss(
        generated, inputs['proj_image'],
        inputs['proj_mask'] * (1 - blurred_mask))
    wc = jnp.mean(wc)

    # Discriminator forward for the GAN term. train=False here so the
    # spectral `u` update happens exactly once per step, in the D branch
    # (the reference runs D once with training=True; both branches see
    # the same pre-update u, so logits match).
    all_input = _disc_pair_input(generated, depth_out, inputs, hp)
    logit_outputs, _ = _disc_forward(
        discriminator, state.d_params, state.d_state, all_input, train=False,
        mutate=False, remat=hp.remat)
    fake_list, real_list = losses_lib.split_disc_outputs(logit_outputs)
    gen_gan_loss, disc_loss = losses_lib.multiscale_gan_losses(
        fake_list, real_list)
    gen_gan_loss = hp.lambda_gan * gen_gan_loss
    disc_loss = hp.lambda_gan * disc_loss

    combined = gen_gan_loss + kld_term + wc + depth_loss
    aux = dict(new_g_state=new_g_state, generated=generated,
               depth_out=depth_out, gen_gan_loss=gen_gan_loss,
               disc_loss_probe=disc_loss, kld_loss=kld_term, kld_nan=kld_nan,
               wc_loss=wc, depth_loss=depth_loss)
    return combined, aux

  (gen_loss, aux), g_grads = jax.value_and_grad(
      gen_loss_fn, has_aux=True)(state.g_params)
  g_grads = _replicate_tree(g_grads, mesh)
  g_grads = losses_lib.clip_grad_per_leaf(g_grads, hp.grad_clip_norm)
  gen_grad_norm = losses_lib.mean_leaf_norm(g_grads)
  g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt_state,
                                     state.g_params)
  new_g_params = optax.apply_updates(state.g_params, g_updates)

  generated = jax.lax.stop_gradient(aux['generated'])
  depth_out = jax.lax.stop_gradient(aux['depth_out'])

  def disc_loss_fn(d_params):
    d_params = _replicate_tree(d_params, mesh)
    all_input = _disc_pair_input(generated, depth_out, inputs, hp)
    logit_outputs, new_d_state = _disc_forward(
        discriminator, d_params, state.d_state, all_input, train=True,
        mutate=True, remat=hp.remat)
    fake_list, real_list = losses_lib.split_disc_outputs(logit_outputs)
    _, disc_loss = losses_lib.multiscale_gan_losses(fake_list, real_list)
    return hp.lambda_gan * disc_loss, new_d_state

  (disc_loss, new_d_state), d_grads = jax.value_and_grad(
      disc_loss_fn, has_aux=True)(state.d_params)
  d_grads = _replicate_tree(d_grads, mesh)
  d_grads = losses_lib.clip_grad_per_leaf(d_grads, hp.grad_clip_norm)
  dis_grad_norm = losses_lib.mean_leaf_norm(d_grads)
  d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state,
                                     state.d_params)
  new_d_params = optax.apply_updates(state.d_params, d_updates)

  # EMA (reference gan_manager.py:642-655): first window assigns, then
  # decays. `step` is the cluster-level global step.
  new_ema_params, new_ema_state = update_ema(
      state.step, state.ema_params, state.ema_state, new_g_params,
      aux['new_g_state'], hp)

  metrics = {
      'dis/disc_loss': disc_loss,
      'dis/grad_norm': dis_grad_norm,
      'gen/gen_gan_loss': aux['gen_gan_loss'],
      'gen/gen_loss': gen_loss,
      'gen/depth_loss': jnp.asarray(aux['depth_loss'], jnp.float32),
      'gen/seg_loss': jnp.zeros(()),
      'gen/depth_seg_loss': jnp.zeros(()),
      'gen/depth_seg_consistency': jnp.zeros(()),
      'gen/kld_loss': aux['kld_loss'],
      'gen/kld_nan': aux['kld_nan'],
      'gen/wc_loss': aux['wc_loss'],
      'gen/grad_norm': gen_grad_norm,
  }
  new_state = state.replace(
      g_params=new_g_params, g_state=aux['new_g_state'],
      d_params=new_d_params, d_state=new_d_state,
      ema_params=new_ema_params, ema_state=new_ema_state,
      g_opt_state=new_g_opt, d_opt_state=new_d_opt)
  return new_state, metrics


def update_ema(step, ema_params, ema_state, g_params, g_state,
               hp: GANHParams):
  """EMA with the reference's assign-then-decay schedule
  (gan_manager.py:642-655)."""
  decay_phase = step >= hp.ema_init_step + hp.num_batched_steps
  active = step >= hp.ema_init_step

  def mix(ema, new):
    decayed = ema - (ema - new) * (1.0 - hp.ema_decay)
    assigned = new
    out = jnp.where(decay_phase, decayed, assigned)
    return jnp.where(active, out, ema)

  new_ema_params = jax.tree_util.tree_map(mix, ema_params, g_params)
  new_ema_state = jax.tree_util.tree_map(mix, ema_state, g_state)
  return new_ema_params, new_ema_state


def train_cluster(state: TrainState, batches, *, generator, discriminator,
                  g_tx, d_tx, hp: GANHParams, mesh=None
                  ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
  """Fuses several train steps into one program with `lax.scan`.

  TPU-native equivalent of the reference's `tf.range` step cluster
  (gan_manager.py:376-385, num_batched_steps=100): amortises dispatch and
  keeps the chip busy across steps. `batches` is a batch dict with a
  leading steps axis: {k: (K, B, ...)}. Returns metrics averaged over the
  cluster.
  """

  def body(carry, batch):
    new_state, metrics = train_step(
        carry, batch, generator=generator, discriminator=discriminator,
        g_tx=g_tx, d_tx=d_tx, hp=hp, mesh=mesh)
    return new_state, metrics

  state, metrics = jax.lax.scan(body, state, batches)
  return state, {k: jnp.mean(v) for k, v in metrics.items()}


def train_step(state: TrainState, batch, *, generator, discriminator,
               g_tx, d_tx, hp: GANHParams, mesh=None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
  """One fused cluster element: split batch, (k-1) D steps + 1 G+D step
  (reference gan_manager.py:376-385)."""
  k = hp.d_step_per_g_step
  splits = {key: jnp.split(v, k, axis=0) if v.ndim >= 1 else [v] * k
            for key, v in batch.items()}
  chunks = [{key: splits[key][i] for key in batch} for i in range(k)]
  for i in range(k - 1):
    state = train_d_step(state, chunks[i], generator=generator,
                         discriminator=discriminator, d_tx=d_tx, hp=hp,
                         mesh=mesh)
  state, metrics = train_g_d_step(state, chunks[-1], generator=generator,
                                  discriminator=discriminator, g_tx=g_tx,
                                  d_tx=d_tx, hp=hp, mesh=mesh)
  state = state.replace(step=state.step + 1)
  return state, metrics
