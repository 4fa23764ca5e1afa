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
    "init_flat",
    "conv_init_spec",
    "linear_init_spec",
    "conv2d",
    "linear",
    "leaky_relu",
    "pixel_norm",
    "upsample_nearest_2x",
    "upsample_nearest_2x_nchw",
    "avg_pool_2x",
    "avg_pool_2x_nchw",
    "conv3x3_on_nearest_up2x",
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


def conv_init_spec(kh: int, kw: int, cin: int, cout: int) -> list:
    """(shape, bound) pairs for one conv's W and b under the PyTorch
    default init (see init_conv)."""
    bound = 1.0 / (cin * kh * kw) ** 0.5
    return [((kh, kw, cin, cout), bound), ((cout,), bound)]


def linear_init_spec(cin: int, cout: int) -> list:
    bound = 1.0 / cin**0.5
    return [((cin, cout), bound), ((cout,), bound)]


def init_flat(key, specs: list) -> list:
    """Draw every leaf in ``specs`` (a list of ``(shape, bound)``) from ONE
    uniform: ``U(+-bound)`` per leaf, exactly like per-leaf ``init_conv``
    draws but compiled as a single RNG kernel.  Per-leaf threefry ops cost
    ~0.5 s of XLA compile EACH (measured: a ~90-leaf model init took 80 s
    cold; this form takes <1 s) — that tax hits every cold start.
    """
    import numpy as np

    sizes = [int(np.prod(s)) for s, _ in specs]
    u = jax.random.uniform(key, (sum(sizes),), jnp.float32, -1.0, 1.0)
    out, off = [], 0
    for (shape, bound), n in zip(specs, sizes):
        out.append(u[off : off + n].reshape(shape) * bound)
        off += n
    return out


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

    Operands are cast to ``compute_dtype`` (bfloat16 for mixed precision).
    float32: f32 accumulation via ``preferred_element_type``.  bfloat16:
    the conv computes IN bf16 (the MXU still accumulates partial products
    in f32 internally) and the result is upcast afterwards — mixing
    ``preferred_element_type=f32`` with bf16 operands breaks the conv
    TRANSPOSE rule under ``jax.grad`` (f32 cotangents meet bf16 weights:
    "requires arguments to have the same dtypes"), which the WGAN-GP
    input-gradient exercises every step.
    """
    if compute_dtype == jnp.float32:
        out = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=_DIMS,
            preferred_element_type=jnp.float32,
        )
    else:
        out = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=_DIMS,
        ).astype(jnp.float32)
    return out + p["b"]


def linear(x: jnp.ndarray, p: dict, compute_dtype=jnp.float32) -> jnp.ndarray:
    if compute_dtype == jnp.float32:
        out = jnp.matmul(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:  # see conv2d: keep grad-transpose dtypes consistent
        out = jnp.matmul(
            x.astype(compute_dtype), p["w"].astype(compute_dtype)
        ).astype(jnp.float32)
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


def upsample_nearest_2x_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NCHW (the Pallas fast path's layout)."""
    b, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (b, c, h, 2, w, 2))
    return x.reshape(b, c, h * 2, w * 2)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool, NHWC (reference ``discriminator.py:24``)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def avg_pool_2x_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool, NCHW (the Pallas fast path's layout)."""
    b, c, h, w = x.shape
    return x.reshape(b, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))


def conv3x3_on_nearest_up2x(
    x: jnp.ndarray, p: dict, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """``conv3x3(upsample_nearest_2x(x))`` without materializing the
    upsampled tensor (sub-pixel decomposition).

    On a nearest-2x grid, the 3x3 window over output pixel ``(2i+a, 2j+b)``
    touches at most 2x2 *distinct* source pixels, so the op factors into
    four phase convolutions with 2x2 kernels built by summing the original
    taps that alias to the same source pixel — exactly equal to the naive
    path, with 2.25x fewer MACs and no 4x-sized intermediate in HBM.
    """
    w = p["w"].astype(compute_dtype)  # (3, 3, cin, cout)
    xc = x.astype(compute_dtype)
    b, h, wd, c = xc.shape

    # Row (dy) combination: phase a=0 sources rows (i-1, i) with taps
    # (w0 | w1+w2); phase a=1 sources rows (i, i+1) with taps (w0+w1 | w2).
    rows = [
        jnp.stack([w[0], w[1] + w[2]], axis=0),  # a = 0: (2, 3, cin, cout)
        jnp.stack([w[0] + w[1], w[2]], axis=0),  # a = 1
    ]

    def col_comb(wa, bb):
        if bb == 0:
            return jnp.stack([wa[:, 0], wa[:, 1] + wa[:, 2]], axis=1)
        return jnp.stack([wa[:, 0] + wa[:, 1], wa[:, 2]], axis=1)

    # Per-phase padding selects which source pair the 2x2 kernel spans.
    pad = {0: (1, 0), 1: (0, 1)}
    phases = []
    for a in (0, 1):
        row_phase = []
        for bb in (0, 1):
            k_ab = col_comb(rows[a], bb)  # (2, 2, cin, cout)
            y = jax.lax.conv_general_dilated(
                xc,
                k_ab,
                window_strides=(1, 1),
                padding=(pad[a], pad[bb]),
                dimension_numbers=_DIMS,
                # bf16 operands keep bf16 output (see conv2d: mixed-dtype
                # conv transpose breaks under jax.grad), upcast after
                preferred_element_type=(
                    jnp.float32 if compute_dtype == jnp.float32 else None
                ),
            )
            row_phase.append(y.astype(jnp.float32))
        phases.append(jnp.stack(row_phase, axis=3))  # (B, H, W, 2, cout)
    t = jnp.stack(phases, axis=2)  # (B, H, 2, W, 2, cout)
    out = t.reshape(b, 2 * h, 2 * wd, -1)
    return out + p["b"]
