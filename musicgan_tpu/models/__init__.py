"""Network components: functional ProGAN generator / critic and losses.

Mirrors the reference's ``music_gan/networks`` surface
(reference ``networks/__init__.py:1-10``) as pure functions over parameter
pytrees.
"""

from ..config import ModelConfig
from .discriminator import (
    discriminator_forward,
    discriminator_param_count,
    init_discriminator,
)
from .generator import (
    generator_forward,
    generator_param_count,
    init_generator,
)
from .losses import (
    discriminator_loss,
    generator_loss,
    wasserstein_discriminator_loss,
    wasserstein_generator_loss,
)

__all__ = [
    "ModelConfig",
    "discriminator_forward",
    "discriminator_loss",
    "discriminator_param_count",
    "generator_forward",
    "generator_loss",
    "generator_param_count",
    "init_discriminator",
    "init_generator",
    "wasserstein_discriminator_loss",
    "wasserstein_generator_loss",
]
