"""Batch transforms that run inside the jitted train step.

The reference applies these on the host per batch
(``audio/transforms.py:8-40`` + ``torchvision.transforms.Resize`` in
``utils.py:70-86``); here they are pure ``jnp`` ops fused into the compiled
step, so the raw full-resolution batch is shipped to the device once and all
per-stage scaling happens on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["channel_min_max_norm", "change_range", "resize_batch", "grower_transform"]


def channel_min_max_norm(x: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Per-sample, per-channel min-max to [0, 1] on ``(B, C, H, W)``
    (reference ``audio/transforms.py:8-31``)."""
    assert x.ndim == 4
    x_min = x.min(axis=(2, 3), keepdims=True)
    x_max = x.max(axis=(2, 3), keepdims=True)
    return (x - x_min) / (x_max - x_min + epsilon)


def change_range(x: jnp.ndarray, lower: float, upper: float) -> jnp.ndarray:
    """Affine remap of a [0, 1] tensor into [lower, upper]
    (reference ``audio/transforms.py:34-40``)."""
    return x * (upper - lower) + lower


def resize_batch(
    x: jnp.ndarray, size: int, method: str = "bilinear",
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize ``(B, C, H, W)`` images to ``(B, C, size, size)``.

    ``bilinear`` with half-pixel centers and ``antialias=False`` matches
    the reference era's ``torchvision.transforms.Resize`` on tensors
    (align_corners=False, no antialias).
    """
    b, c = x.shape[:2]
    return jax.image.resize(
        x, (b, c, size, size), method=method, antialias=antialias
    )


def grower_transform(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """The per-stage input pipeline (reference ``utils.py:70-86``):
    per-channel min-max -> [-1, 1] -> resize to the current stage size."""
    x = channel_min_max_norm(x)
    x = change_range(x, -1.0, 1.0)
    if size != x.shape[-1]:
        x = resize_batch(x, size)
    return x
