"""GAN losses (reference ``networks/criterion.py:4-18``).

The Wasserstein pair drives training; the vanilla log-loss pair is kept for
API parity (defined but unused by the reference workflows too).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "wasserstein_discriminator_loss",
    "wasserstein_generator_loss",
    "discriminator_loss",
    "generator_loss",
]


def wasserstein_discriminator_loss(y_real: jnp.ndarray, y_fake: jnp.ndarray):
    return -(jnp.mean(y_real) - jnp.mean(y_fake))


def wasserstein_generator_loss(y_fake: jnp.ndarray):
    return -jnp.mean(y_fake)


def discriminator_loss(y_real: jnp.ndarray, y_fake: jnp.ndarray):
    return -jnp.mean(jnp.log2(y_real) + jnp.log2(1.0 - y_fake))


def generator_loss(y_fake: jnp.ndarray):
    return -jnp.mean(jnp.log2(y_fake))
