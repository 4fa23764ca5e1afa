"""Differentiable fused conv: the Pallas forward kernel with a custom VJP.

Round 2 left the 3.3x-faster Pallas conv kernels inference-only — every
training step (the single most expensive workload: the WGAN-GP
triple-forward/double-backward through the 512x512 critic, reference
``train.py:131-214`` over ``networks/generator.py:16-39`` /
``discriminator.py:14-33``) ran XLA's conv lowering, which this model's
small channel counts leave lane-starved (PERF.md).  This module closes
that gap: ``conv3x3_act`` = conv3x3 + bias + LeakyReLU + optional
PixelNorm with

* **forward** — the fused Pallas kernel (``ops/conv.py``), emitting the
  pre-norm ``mean(u^2)`` map as a residual when PixelNorm is on;
* **backward** —
  - epilogue gradient (PixelNorm + LeakyReLU) as XLA elementwise math
    reconstructed from the OUTPUT (no saved activations: ``u = y / r``
    and ``sign(preact) = sign(y)`` because both LeakyReLU and the
    positive norm scale preserve sign);
  - **input gradient on the Pallas kernel** — the transpose of a 'SAME'
    3x3 conv is a 'SAME' 3x3 conv of the cotangent with the
    180-degree-rotated, io-transposed weights, i.e. exactly the
    forward-shaped op XLA lowers poorly and the kernel was built for;
  - weight gradient via XLA's native conv-backward-weights (a
    reduction: K = B*H*W contracted into a 3x3*cin*cout output — the
    shape XLA already maps well to the MXU, unlike the lane-starved
    forward).

Epilogue-gradient derivation (per spatial position, channels c):
``u_c`` = post-LeakyReLU activations, ``m = mean_c(u_c^2)``,
``r = (m + eps)^-1/2``, ``y_c = u_c * r``.  Then

    dL/du_c = r * (g_c - y_c * mean_k(g_k * y_k))

using ``u_c = y_c / r`` to eliminate ``u``; only ``y`` and ``m`` (the
kernel's residual output) are needed.  LeakyReLU: ``dpre = du *
where(y >= 0, 1, slope)`` — matching XLA's subgradient convention at 0.

Second-order note: ``jax.custom_vjp`` supports ONE differentiation, so
the WGAN-GP branch (grad-of-grad through the critic) keeps the plain XLA
lowering; the train step routes only first-order contexts here
(``train/step.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .conv import fused_conv3x3, fused_conv3x3_msq

__all__ = ["conv3x3_act"]

_DN = ("NCHW", "HWIO", "NCHW")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_act(x, w, b, slope=0.2, pixel_norm=False, eps=1e-8):
    """3x3 'SAME' conv + bias (+ LeakyReLU) (+ PixelNorm) on NCHW f32,
    differentiable in (x, w, b).  ``slope``/``pixel_norm``/``eps`` are
    static.  Positional arguments only (custom_vjp)."""
    y, _ = _fwd(x, w, b, slope, pixel_norm, eps)
    return y


def _fwd(x, w, b, slope, pixel_norm, eps):
    interp = _interpret()
    if pixel_norm:
        y, m = fused_conv3x3_msq(
            x, w, b, slope=slope, eps=eps, interpret=interp
        )
    else:
        y = fused_conv3x3(
            x, w, b, slope=slope, pixel_norm=False,
            out_dtype=jnp.float32, interpret=interp,
        )
        m = None
    return y, (x, w, y, m)


def _bwd(slope, pixel_norm, eps, res, g):
    x, w, y, m = res
    g = g.astype(jnp.float32)
    if pixel_norm:
        r = jax.lax.rsqrt(m + eps)  # (B, 1, H, W)
        du = r * (g - y * jnp.mean(g * y, axis=1, keepdims=True))
    else:
        du = g
    if slope is not None:
        dpre = du * jnp.where(y >= 0, 1.0, slope)
    else:
        dpre = du

    # Input grad: forward-shaped conv on the Pallas kernel.
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # rot180, io-swap
    dx = fused_conv3x3(
        dpre, w_t, jnp.zeros((x.shape[1],), jnp.float32),
        slope=None, pixel_norm=False, out_dtype=jnp.float32,
        interpret=_interpret(),
    )

    # Weight grad: XLA's conv-backward-weights lowering.
    _, wvjp = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x, w_, (1, 1), "SAME", dimension_numbers=_DN,
            preferred_element_type=jnp.float32,
        ),
        w,
    )
    (dw,) = wvjp(dpre)
    db = jnp.sum(dpre, axis=(0, 2, 3))
    return dx, dw, db


conv3x3_act.defvjp(_fwd, _bwd)
