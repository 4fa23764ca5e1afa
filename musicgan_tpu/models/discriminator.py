"""Progressive-growing critic (WGAN discriminator), functional JAX re-design.

Re-implements the capability of reference ``networks/discriminator.py:8-191``
with the same TPU-first choices as the generator: static stage index, all
per-stage input heads pre-allocated (shape-stable pytree), NHWC layout.

The stage convention mirrors the reference: ``stage`` counts DOWN from 7
(4x4 input) to 0 (512x512 input) as the model grows
(reference ``discriminator.py:107-124``).  Mirrored fade-in:
``alpha * block_s(head_s(x)) + (1 - alpha) * head_{s+1}(avgpool(x))``.

The WGAN-GP gradient penalty (reference ``discriminator.py:157-184``) lives
in ``musicgan_tpu.train.step`` as a ``jax.grad`` composition inside the
jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .layers import avg_pool_2x, avg_pool_2x_nchw, conv2d, leaky_relu, linear

_DEFAULT = ModelConfig()

__all__ = [
    "init_discriminator",
    "discriminator_forward",
    "critic_input_grad_nchw_train",
    "discriminator_param_count",
]


@functools.partial(jax.jit, static_argnums=(1,))
def init_discriminator(key, cfg: ModelConfig = _DEFAULT) -> dict:
    """Pytree: 9 down-blocks, 9 MagPhase input heads, final linear
    (reference ``discriminator.py:60-105``).  Jitted as one graph with all
    leaves from ONE uniform (see init_generator)."""
    from .layers import conv_init_spec, init_flat, linear_init_spec

    specs = []
    for cin, cout in cfg.disc_channels:
        specs += conv_init_spec(3, 3, cin, cout)   # conv1
        specs += conv_init_spec(3, 3, cout, cout)  # conv2
    for cin, _ in cfg.disc_channels:
        specs += conv_init_spec(1, 1, 2, cin)      # input head
    specs += linear_init_spec(cfg.disc_channels[-1][1], 1)
    leaves = iter(init_flat(key, specs))

    def p():
        return {"w": next(leaves), "b": next(leaves)}

    blocks = [
        {"conv1": p(), "conv2": p()} for _ in cfg.disc_channels
    ]
    heads = [p() for _ in cfg.disc_channels]
    return {"blocks": blocks, "heads": heads, "clf": p()}


def _block_apply(p: dict, x: jnp.ndarray, cfg: ModelConfig, dtype) -> jnp.ndarray:
    """Conv3x3 -> LeakyReLU -> AvgPool2x -> Conv3x3 -> LeakyReLU
    (reference ``discriminator.py:14-33``)."""
    x = leaky_relu(conv2d(x, p["conv1"], dtype), cfg.leaky_slope)
    x = avg_pool_2x(x)
    x = leaky_relu(conv2d(x, p["conv2"], dtype), cfg.leaky_slope)
    return x


def _head_apply(p: dict, x: jnp.ndarray, cfg: ModelConfig, dtype) -> jnp.ndarray:
    """Conv1x1(2 -> C) -> LeakyReLU (reference ``discriminator.py:37-50``)."""
    return leaky_relu(conv2d(x, p, dtype), cfg.leaky_slope)


def discriminator_forward(
    params: dict,
    x: jnp.ndarray,
    stage: int,
    alpha,
    cfg: ModelConfig = _DEFAULT,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """``x``: (B, H, W, 2) NHWC at the stage's resolution -> (B, 1) critic
    score.  ``stage`` is static; 7 = 4x4 input, 0 = 512x512 input."""
    if cfg.conv_impl in ("pallas_train", "pallas_gp"):
        return _discriminator_forward_nchw_train(params, x, stage, alpha, cfg)
    n = len(cfg.disc_channels)

    out_new = _head_apply(params["heads"][stage], x, cfg, compute_dtype)
    out_new = _block_apply(params["blocks"][stage], out_new, cfg, compute_dtype)

    if stage < n - 2:
        # Mirrored fade-in against the previous (coarser) input head.
        out_old = _head_apply(
            params["heads"][stage + 1], avg_pool_2x(x), cfg, compute_dtype
        )
        out = alpha * out_new + (1.0 - alpha) * out_old
    else:
        out = out_new

    for i in range(stage + 1, n):
        out = _block_apply(params["blocks"][i], out, cfg, compute_dtype)

    out = out.reshape(out.shape[0], -1)
    return linear(out, params["clf"], compute_dtype)


def _discriminator_forward_nchw_train(
    params: dict, x: jnp.ndarray, stage: int, alpha, cfg: ModelConfig
) -> jnp.ndarray:
    """Trainable Pallas path (impl ``"pallas_train"``, float32): conv3x3 +
    LeakyReLU on the fused NCHW kernel via :func:`ops.conv_vjp.conv3x3_act`
    (differentiable ONCE — the WGAN-GP grad-of-grad branch keeps the XLA
    lowering, see train/step.py).  Same math as the NHWC path above."""
    from ..ops.conv_vjp import conv3x3_act

    n = len(cfg.disc_channels)
    slope = cfg.leaky_slope

    def head(p, t):
        w = p["w"][0, 0]  # (2, C)
        y = jnp.einsum("bchw,ck->bkhw", t, w) + p["b"][None, :, None, None]
        return leaky_relu(y, slope)

    def block(p, t):
        t = conv3x3_act(t, p["conv1"]["w"], p["conv1"]["b"], slope, False,
                        0.0)
        t = avg_pool_2x_nchw(t)
        return conv3x3_act(t, p["conv2"]["w"], p["conv2"]["b"], slope, False,
                           0.0)

    xn = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)
    out_new = head(params["heads"][stage], xn)
    out_new = block(params["blocks"][stage], out_new)

    if stage < n - 2:
        out_old = head(params["heads"][stage + 1], avg_pool_2x_nchw(xn))
        out = alpha * out_new + (1.0 - alpha) * out_old
    else:
        out = out_new

    for i in range(stage + 1, n):
        out = block(params["blocks"][i], out)

    out = out.reshape(out.shape[0], -1)  # final spatial is 1x1: same
    # flatten result as the NHWC path.
    return linear(out, params["clf"], jnp.float32)


def critic_input_grad_nchw_train(
    params: dict, x: jnp.ndarray, stage: int, alpha, cfg: ModelConfig
) -> jnp.ndarray:
    """``∇_x Σ_b D(x)`` with the critic's backward pass UNROLLED by hand
    from first-order Pallas convs (impl ``"pallas_gp"``).

    Why: the WGAN-GP needs this input gradient *inside* the loss, so the
    usual ``jax.grad`` formulation makes the train step differentiate the
    critic twice — beyond ``jax.custom_vjp``'s one differentiation, which
    locked the GP branch onto the slow XLA conv lowering (train/step.py,
    round-3 PERF.md).  Here the inner backward is explicit: the transpose
    of each 'SAME' conv3x3 is a 'SAME' conv3x3 with rot180/io-swapped
    weights (the Pallas kernel), avg-pool's transpose is a nearest-2x
    broadcast x 0.25, LeakyReLU's is a sign-mask multiply, and the 1x1
    heads/final Linear transpose to einsums.  Every op is then
    differentiated ONCE by the outer ``jax.value_and_grad``.

    Exactness: the only theta-dependence dropped is through the LeakyReLU
    sign masks, whose derivative is zero almost everywhere — the same
    convention XLA's own grad-of-grad applies to ``where`` (its condition
    operand gets a zero cotangent), so this matches ``jax.grad(critic_sum)``
    on the XLA path to float tolerance, including the outer gradient
    (tested in tests/test_ops_vjp.py).

    Matches the reference's ``gradient_penalty`` input-gradient semantics
    (reference ``discriminator.py:157-184``).
    """
    from ..ops.conv_vjp import conv3x3_act
    from .layers import upsample_nearest_2x_nchw

    n = len(cfg.disc_channels)
    slope = cfg.leaky_slope

    def mask(t):
        # sign(post-activation) == sign(preactivation): slope > 0.
        return jnp.where(t >= 0, 1.0, slope)

    def conv_t(ct, w):
        w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
        return conv3x3_act(
            ct, w_t, jnp.zeros((w.shape[2],), jnp.float32), None, False, 0.0
        )

    # ---- forward, recording post-activations -----------------------------
    xn = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)

    def head_fwd(p, t):
        w = p["w"][0, 0]
        y = jnp.einsum("bchw,ck->bkhw", t, w) + p["b"][None, :, None, None]
        return jnp.where(y >= 0, y, slope * y)

    def block_fwd(p, t):
        c1 = conv3x3_act(t, p["conv1"]["w"], p["conv1"]["b"], slope, False,
                         0.0)
        pl = avg_pool_2x_nchw(c1)
        c2 = conv3x3_act(pl, p["conv2"]["w"], p["conv2"]["b"], slope, False,
                         0.0)
        return c1, c2

    h_new = head_fwd(params["heads"][stage], xn)
    acts = []  # (c1, c2) per block, in forward order
    c1, out = block_fwd(params["blocks"][stage], h_new)
    acts.append((c1, out))

    fade = stage < n - 2
    if fade:
        pooled_x = avg_pool_2x_nchw(xn)
        h_old = head_fwd(params["heads"][stage + 1], pooled_x)
        out = alpha * out + (1.0 - alpha) * h_old
    for i in range(stage + 1, n):
        c1, out = block_fwd(params["blocks"][i], out)
        acts.append((c1, out))

    # ---- explicit backward of sum(score) w.r.t. xn ------------------------
    bsz = x.shape[0]
    w_clf = params["clf"]["w"][:, 0]  # (C,)
    d_out = jnp.broadcast_to(
        w_clf[None, :, None, None], (bsz, w_clf.shape[0], 1, 1)
    )

    def block_bwd(p, c1, c2, d_c2):
        d_pl = conv_t(d_c2 * mask(c2), p["conv2"]["w"])
        d_c1 = upsample_nearest_2x_nchw(d_pl) * 0.25
        return conv_t(d_c1 * mask(c1), p["conv1"]["w"])

    def head_bwd(p, h, d_h):
        w = p["w"][0, 0]
        return jnp.einsum("bkhw,ck->bchw", d_h * mask(h), w)

    for i in range(n - 1, stage, -1):
        c1, c2 = acts[i - stage]
        d_out = block_bwd(params["blocks"][i], c1, c2, d_out)

    if fade:
        d_new = alpha * d_out
        d_old = (1.0 - alpha) * d_out
        d_pooled = head_bwd(params["heads"][stage + 1], h_old, d_old)
        d_xn_old = upsample_nearest_2x_nchw(d_pooled) * 0.25
    else:
        d_new = d_out
        d_xn_old = 0.0

    c1, c2 = acts[0]
    d_h_new = block_bwd(params["blocks"][stage], c1, c2, d_new)
    d_xn = head_bwd(params["heads"][stage], h_new, d_h_new) + d_xn_old
    return jnp.transpose(d_xn, (0, 2, 3, 1))


def discriminator_param_count(
    cfg: ModelConfig = _DEFAULT, stage: int | None = None
) -> int:
    """Active parameter count at ``stage`` (None = all allocated).

    At stage 0 with the fade head included this equals the reference's
    fully-grown count of 1,647,089 (SURVEY.md §0).
    """

    def conv_n(kh, kw, cin, cout):
        return kh * kw * cin * cout + cout

    total = sum(
        conv_n(3, 3, cin, cout) + conv_n(3, 3, cout, cout)
        for cin, cout in cfg.disc_channels
    )
    total += cfg.disc_channels[-1][1] + 1  # final linear
    if stage is None:
        total += sum(conv_n(1, 1, 2, cin) for cin, _ in cfg.disc_channels)
    else:
        total += conv_n(1, 1, 2, cfg.disc_channels[stage][0])
        if stage < len(cfg.disc_channels) - 2:
            total += conv_n(1, 1, 2, cfg.disc_channels[stage + 1][0])
    return total
