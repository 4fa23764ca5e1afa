"""Primitive layers shared by the generator and discriminator.

Functional, NHWC (TPU-preferred layout), pure ``jnp``/``lax`` — XLA fuses the
elementwise chains (LeakyReLU, PixelNorm, lerp) into the surrounding convs.
Initialization matches PyTorch's ``nn.Conv2d``/``nn.Linear`` default
(kaiming-uniform with a=sqrt(5) => U(+-1/sqrt(fan_in)) for both weight and
bias), since the reference relies on it (reference ``generator.py:16-39``,
``discriminator.py:14-33``) and GAN dynamics are init-sensitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "init_conv",
    "init_linear",
    "conv2d",
    "linear",
    "leaky_relu",
    "pixel_norm",
    "upsample_nearest_2x",
    "avg_pool_2x",
]

_DIMS = ("NHWC", "HWIO", "NHWC")


def init_conv(key, kh: int, kw: int, cin: int, cout: int) -> dict:
    """PyTorch-default conv init: W, b ~ U(+-1/sqrt(cin*kh*kw)), HWIO."""
    wk, bk = jax.random.split(key)
    bound = 1.0 / (cin * kh * kw) ** 0.5
    return {
        "w": jax.random.uniform(
            wk, (kh, kw, cin, cout), jnp.float32, -bound, bound
        ),
        "b": jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound),
    }


def init_linear(key, cin: int, cout: int) -> dict:
    wk, bk = jax.random.split(key)
    bound = 1.0 / cin**0.5
    return {
        "w": jax.random.uniform(wk, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound),
    }


def conv2d(
    x: jnp.ndarray,
    p: dict,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """3x3/1x1 'same' convolution in NHWC on the MXU.

    Operands are cast to ``compute_dtype`` (bfloat16 for mixed precision)
    with float32 accumulation via ``preferred_element_type``.
    """
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.float32,
    )
    return out + p["b"]


def linear(x: jnp.ndarray, p: dict, compute_dtype=jnp.float32) -> jnp.ndarray:
    out = jnp.matmul(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out + p["b"]


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """ProGAN pixelwise feature norm over channels (last axis in NHWC;
    reference ``layers.py:5-23``)."""
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(mean_sq + eps)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (reference ``generator.py:25-28``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool, NHWC (reference ``discriminator.py:24``)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
