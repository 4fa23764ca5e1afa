"""Progressive-growing generator, functional JAX re-design.

Re-implements the capability of reference ``networks/generator.py:9-172``
TPU-first:

* **Static stage index** — ``stage`` is a Python int, so each growth stage
  is its own XLA graph (8 total, cheap) with fully static shapes; no
  data-dependent control flow inside jit.
* **All heads pre-allocated** — the reference allocates ``ToMagnPhaseLayer``
  heads lazily on growth (``generator.py:128-152``), which changes the
  parameter set mid-training.  Here every per-stage 1x1 head exists from
  step 0, so the parameter pytree (and hence the optimizer state) is
  shape-stable across the whole run; inactive heads receive zero gradient
  and the per-leaf Adam (train/optim.py) starts their bias correction at
  first activation — exactly the reference's fresh-param-group behavior.
* **NHWC layout** throughout (TPU-native); the public API converts at the
  edges where reference parity (NCHW) matters.

Fade-in (reference ``generator.py:106-126``): at stage s > 0 the output is
``alpha * head_s(block_s(x)) + (1 - alpha) * up2x(head_{s-1}(x))``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .layers import (
    conv2d,
    conv3x3_on_nearest_up2x,
    init_conv,
    leaky_relu,
    pixel_norm,
    upsample_nearest_2x,
)

_DEFAULT = ModelConfig()

__all__ = [
    "init_generator",
    "generator_forward",
    "generator_param_count",
]


def _init_block(key, cin: int, cout: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv(k1, 3, 3, cin, cin),
        "conv2": init_conv(k2, 3, 3, cin, cout),
    }


@functools.partial(jax.jit, static_argnums=(1,))
def init_generator(key, cfg: ModelConfig = _DEFAULT) -> dict:
    """Parameter pytree: 8 up-blocks + 8 ToMagnPhase heads (all stages).

    Jitted as ONE graph: eager per-layer init would dispatch ~50 separate
    ops (each a compile on a cold backend)."""
    n = cfg.n_stages
    keys = jax.random.split(key, 2 * n)
    blocks = [
        _init_block(keys[i], cin, cout)
        for i, (cin, cout) in enumerate(cfg.gen_channels)
    ]
    heads = [
        init_conv(keys[n + i], 1, 1, cout, 2)
        for i, (_, cout) in enumerate(cfg.gen_channels)
    ]
    return {"blocks": blocks, "heads": heads}


def _block_apply(p: dict, x: jnp.ndarray, cfg: ModelConfig, dtype) -> jnp.ndarray:
    """Conv3x3 -> LeakyReLU -> PixelNorm -> Up2x -> Conv3x3 -> LeakyReLU ->
    PixelNorm (reference ``generator.py:16-39``).

    Note: the exact sub-pixel decomposition of Up2x+Conv3x3
    (:func:`~musicgan_tpu.models.layers.conv3x3_on_nearest_up2x`, 2.25x
    fewer MACs) measured ~9% SLOWER end-to-end on the round-1 chip — the
    4-phase interleave relayout outweighs the FLOP savings when the conv
    is not FLOP-bound (PERF.md).  Kept as an op for re-evaluation on
    full-bandwidth hardware.
    """
    x = pixel_norm(leaky_relu(conv2d(x, p["conv1"], dtype), cfg.leaky_slope),
                   cfg.pixel_norm_eps)
    x = upsample_nearest_2x(x)
    x = pixel_norm(leaky_relu(conv2d(x, p["conv2"], dtype), cfg.leaky_slope),
                   cfg.pixel_norm_eps)
    return x


def _head_apply(p: dict, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Conv1x1(C -> 2) -> Tanh (reference ``generator.py:43-52``)."""
    return jnp.tanh(conv2d(x, p, dtype))


def generator_forward(
    params: dict,
    z: jnp.ndarray,
    stage: int,
    alpha,
    cfg: ModelConfig = _DEFAULT,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """``z``: (B, h, w, rand_channels) NHWC -> (B, h * 2^(stage+1),
    w * 2^(stage+1), 2) magn/phase image in [-1, 1].

    ``stage`` must be a Python int (static under jit); ``alpha`` may be a
    traced scalar.
    """
    out = z
    for i in range(stage):
        out = _block_apply(params["blocks"][i], out, cfg, compute_dtype)

    out_block = _block_apply(params["blocks"][stage], out, cfg, compute_dtype)
    out_mp = _head_apply(params["heads"][stage], out_block, compute_dtype)

    if stage > 0:
        old = _head_apply(params["heads"][stage - 1], out, compute_dtype)
        old = upsample_nearest_2x(old)
        return alpha * out_mp + (1.0 - alpha) * old
    return out_mp


def generator_param_count(cfg: ModelConfig = _DEFAULT, stage: int | None = None) -> int:
    """Number of parameters *active* at ``stage`` (None = all allocated).

    At stage 7 with fade head included this equals the reference's
    fully-grown count of 902,132 (SURVEY.md §0).
    """

    def conv_n(kh, kw, cin, cout):
        return kh * kw * cin * cout + cout

    total = sum(
        conv_n(3, 3, cin, cin) + conv_n(3, 3, cin, cout)
        for cin, cout in cfg.gen_channels
    )
    if stage is None:
        total += sum(conv_n(1, 1, cout, 2) for _, cout in cfg.gen_channels)
    else:
        total += conv_n(1, 1, cfg.gen_channels[stage][1], 2)
        if stage > 0:
            total += conv_n(1, 1, cfg.gen_channels[stage - 1][1], 2)
    return total
