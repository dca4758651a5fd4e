"""GAN losses for SE3DS training (reference trainers/se3ds_trainer.py)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
  """VAE KLD (reference se3ds_trainer.py:35-36); zeros in this release."""
  return -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))


def wc_loss(generated_images: jnp.ndarray, real_images: jnp.ndarray,
            mask: jnp.ndarray) -> jnp.ndarray:
  """World-consistency masked L1 (reference se3ds_trainer.py:39-55).

  Returns a per-example (N,) loss.
  """
  loss = jnp.abs(generated_images - real_images)
  loss = jnp.sum(loss * mask, axis=(1, 2, 3)) / generated_images.shape[-1]
  loss = loss / jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0)
  return loss


def discriminator_hinge_loss(real_logit: jnp.ndarray,
                             fake_logit: jnp.ndarray) -> jnp.ndarray:
  """Hinge loss for D (reference se3ds_trainer.py:58-64)."""
  return jax.nn.relu(1.0 - real_logit) + jax.nn.relu(1.0 + fake_logit)


def generator_hinge_loss(fake_logit: jnp.ndarray) -> jnp.ndarray:
  """Hinge loss for G (reference se3ds_trainer.py:67-71)."""
  return -fake_logit


def split_disc_outputs(logit_outputs: List[List[jnp.ndarray]]):
  """Splits concatenated fake/real discriminator outputs.

  The discriminator is run once on concat([fake, real], axis=0)
  (reference se3ds_trainer.py:186-206); every intermediate map is split
  back into (fake, real) halves.
  """
  fake_list, real_list = [], []
  for sub in logit_outputs:
    sub_fake, sub_real = [], []
    for out in sub:
      fake, real = jnp.split(out, 2, axis=0)
      sub_fake.append(fake)
      sub_real.append(real)
    fake_list.append(sub_fake)
    real_list.append(sub_real)
  return fake_list, real_list


def multiscale_gan_losses(fake_logit_list, real_logit_list):
  """Final-logit hinge losses averaged over sub-discriminators
  (reference se3ds_trainer.py:208-228)."""
  gen_loss = 0.0
  disc_loss = 0.0
  for sub_fake, sub_real in zip(fake_logit_list, real_logit_list):
    gen_loss += jnp.mean(generator_hinge_loss(sub_fake[-1]))
    disc_loss += jnp.mean(discriminator_hinge_loss(sub_real[-1],
                                                   sub_fake[-1]))
  n = len(fake_logit_list)
  return gen_loss / n, disc_loss / n


def clip_grad_per_leaf(grads, clip_norm: float = 5.0):
  """Per-tensor clip_by_norm, matching tf.clip_by_norm semantics
  (reference se3ds_trainer.py:27-32)."""
  def clip_one(g):
    norm = jnp.sqrt(jnp.sum(g.astype(jnp.float32)**2))
    factor = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-20))
    return g * factor.astype(g.dtype)
  return jax.tree_util.tree_map(clip_one, grads)


def mean_leaf_norm(grads) -> jnp.ndarray:
  """Mean of per-tensor L2 norms, NaNs replaced with 0 (metric only,
  reference se3ds_trainer.py:239-251)."""
  norms = [jnp.linalg.norm(g.reshape(-1))
           for g in jax.tree_util.tree_leaves(grads)]
  m = jnp.mean(jnp.stack(norms))
  return jnp.where(jnp.isnan(m), 0.0, m)
