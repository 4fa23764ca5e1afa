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
    leaky_relu,
    pixel_norm,
    upsample_nearest_2x,
    upsample_nearest_2x_nchw,
)

_DEFAULT = ModelConfig()

__all__ = [
    "init_generator",
    "generator_forward",
    "generator_param_count",
]


@functools.partial(jax.jit, static_argnums=(1,))
def init_generator(key, cfg: ModelConfig = _DEFAULT) -> dict:
    """Parameter pytree: 8 up-blocks + 8 ToMagnPhase heads (all stages).

    Jitted as ONE graph, with all leaves drawn from ONE uniform
    (:func:`~musicgan_tpu.models.layers.init_flat`): per-leaf RNG ops cost
    ~0.5 s of XLA compile each, ~40 s for this model's ~50 leaves."""
    from .layers import conv_init_spec, init_flat

    specs = []
    for cin, cout in cfg.gen_channels:
        specs += conv_init_spec(3, 3, cin, cin)   # conv1
        specs += conv_init_spec(3, 3, cin, cout)  # conv2
    for _, cout in cfg.gen_channels:
        specs += conv_init_spec(1, 1, cout, 2)    # head
    leaves = iter(init_flat(key, specs))

    def conv_p():
        return {"w": next(leaves), "b": next(leaves)}

    blocks = [
        {"conv1": conv_p(), "conv2": conv_p()} for _ in cfg.gen_channels
    ]
    heads = [conv_p() for _ in cfg.gen_channels]
    return {"blocks": blocks, "heads": heads}


def _block_apply(
    p: dict, x: jnp.ndarray, cfg: ModelConfig, dtype, impl: str = "xla"
) -> jnp.ndarray:
    """Conv3x3 -> LeakyReLU -> PixelNorm -> Up2x -> Conv3x3 -> LeakyReLU ->
    PixelNorm (reference ``generator.py:16-39``).

    ``impl`` selects the Up2x+Conv3x3 lowering: ``"xla"`` materializes the
    upsampled tensor; ``"subpixel"`` uses the exact 4-phase decomposition
    (:func:`~musicgan_tpu.models.layers.conv3x3_on_nearest_up2x`, 2.25x
    fewer MACs, no 4x-sized intermediate in HBM) — equal results, different
    speed depending on whether the conv is FLOP- or bandwidth-bound
    (PERF.md).  ``ModelConfig.conv_impl="auto"`` measures and picks.
    """
    x = pixel_norm(leaky_relu(conv2d(x, p["conv1"], dtype), cfg.leaky_slope),
                   cfg.pixel_norm_eps)
    if impl == "subpixel":
        x = conv3x3_on_nearest_up2x(x, p["conv2"], dtype)
    else:
        x = upsample_nearest_2x(x)
        x = conv2d(x, p["conv2"], dtype)
    x = pixel_norm(leaky_relu(x, cfg.leaky_slope), cfg.pixel_norm_eps)
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

    ``cfg.conv_impl`` selects the conv-stack lowering.  ``"auto"`` here
    falls back to ``"xla"``: resolution to a measured winner happens
    *before* tracing, in the entry points (generate / train / bench) via
    :func:`musicgan_tpu.ops.autotune.resolve_conv_impl`.
    """
    impl = cfg.conv_impl
    if impl in ("pallas_train", "pallas_gp"):
        # Differentiable Pallas path (ops/conv_vjp.py): fused kernel
        # forward + custom VJP whose input-grad conv is also the kernel.
        return _generator_forward_nchw_train(params, z, stage, alpha, cfg)
    if impl in ("pallas", "pallas_up", "pallas_block", "pallas_bf16",
                "pallas_up_bf16", "pallas_block_bf16"):
        return _generator_forward_nchw(
            params, z, stage, alpha, cfg,
            compute_dtype=(
                jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
            ),
            use_upconv=impl.startswith("pallas_up"),
            use_block=impl.startswith("pallas_block"),
        )
    if impl == "auto":
        impl = "xla"

    out = z
    for i in range(stage):
        out = _block_apply(params["blocks"][i], out, cfg, compute_dtype, impl)

    out_block = _block_apply(
        params["blocks"][stage], out, cfg, compute_dtype, impl
    )
    out_mp = _head_apply(params["heads"][stage], out_block, compute_dtype)

    if stage > 0:
        old = _head_apply(params["heads"][stage - 1], out, compute_dtype)
        old = upsample_nearest_2x(old)
        return alpha * out_mp + (1.0 - alpha) * old
    return out_mp


def _generator_forward_nchw(
    params: dict, z: jnp.ndarray, stage: int, alpha, cfg: ModelConfig,
    compute_dtype=jnp.float32, use_upconv: bool = False,
    use_block: bool = False,
) -> jnp.ndarray:
    """Pallas fast path: the whole conv stack runs in NCHW via the fused
    3x3 kernel (``ops/conv.py`` — conv + bias + LeakyReLU + PixelNorm in
    one VMEM-resident matmul per tile; W on the 128-lane dim where this
    model is wide).  NHWC in/out at the edges for API parity; the two
    transposes act on the tiny latent and 2-channel image only.

    ``compute_dtype=bfloat16`` (impl ``"pallas_bf16"``) halves every HBM
    transfer — activations stream through the stack in bf16 while the MXU
    still accumulates in float32 and the bias/LeakyReLU/PixelNorm epilogue
    runs in float32.  The kernel is DMA-bound (PERF.md), so bytes, not
    FLOPs, set its speed.  Heads and fade-in stay float32.

    ``use_upconv`` (impls ``"pallas_up"``/``"pallas_up_bf16"``) replaces
    each block's up2x + conv3x3 with the fused sub-pixel kernel
    (``ops/conv.py::fused_upconv3x3``): the 4x upsampled intermediate
    never leaves VMEM, halving the HBM traffic of the up+conv pair on
    this DMA-bound stack.

    Inference-only (``pallas_call`` here defines no VJP); ``build_step``
    rejects it for training.
    """
    from ..ops.conv import fused_block, fused_conv3x3, fused_upconv3x3

    interpret = jax.default_backend() == "cpu"
    slope = cfg.leaky_slope
    eps = cfg.pixel_norm_eps

    def block_nchw(p, x):
        if use_block:
            from ..ops.conv import fused_block_fits

            cin = p["conv1"]["w"].shape[2]
            cmid = p["conv1"]["w"].shape[3]
            cout = p["conv2"]["w"].shape[3]
            if fused_block_fits(cin, cmid, cout, x.dtype.itemsize):
                # whole block in ONE kernel: neither conv1's output nor
                # the 4x upsampled intermediate touches HBM.  Big-channel
                # blocks (spatially tiny) exceed scoped VMEM and take the
                # two-kernel path below instead.
                return fused_block(
                    x, p["conv1"]["w"], p["conv1"]["b"],
                    p["conv2"]["w"], p["conv2"]["b"],
                    slope=slope, eps=eps, out_dtype=compute_dtype,
                    interpret=interpret,
                )
            x = fused_conv3x3(
                x, p["conv1"]["w"], p["conv1"]["b"], slope=slope,
                pixel_norm=True, eps=eps, out_dtype=compute_dtype,
                interpret=interpret,
            )
            return fused_upconv3x3(
                x, p["conv2"]["w"], p["conv2"]["b"], slope=slope,
                pixel_norm=True, eps=eps, out_dtype=compute_dtype,
                interpret=interpret,
            )
        x = fused_conv3x3(
            x, p["conv1"]["w"], p["conv1"]["b"], slope=slope,
            pixel_norm=True, eps=eps, out_dtype=compute_dtype,
            interpret=interpret,
        )
        if use_upconv:
            return fused_upconv3x3(
                x, p["conv2"]["w"], p["conv2"]["b"], slope=slope,
                pixel_norm=True, eps=eps, out_dtype=compute_dtype,
                interpret=interpret,
            )
        x = upsample_nearest_2x_nchw(x)
        return fused_conv3x3(
            x, p["conv2"]["w"], p["conv2"]["b"], slope=slope,
            pixel_norm=True, eps=eps, out_dtype=compute_dtype,
            interpret=interpret,
        )

    out = jnp.transpose(z, (0, 3, 1, 2)).astype(compute_dtype)
    for i in range(stage):
        out = block_nchw(params["blocks"][i], out)

    out_block = block_nchw(params["blocks"][stage], out)
    out_mp = _head_nchw(params["heads"][stage], out_block)

    if stage > 0:
        old = _head_nchw(params["heads"][stage - 1], out)
        old = upsample_nearest_2x_nchw(old)
        out_mp = alpha * out_mp + (1.0 - alpha) * old
    return jnp.transpose(out_mp, (0, 2, 3, 1))


def _head_nchw(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """ToMagnPhase head in NCHW: 1x1 conv as a channel matmul + tanh."""
    w = p["w"][0, 0]  # (C, 2)
    y = jnp.einsum(
        "bchw,ck->bkhw", x.astype(jnp.float32), w
    ) + p["b"][None, :, None, None]
    return jnp.tanh(y)


def _generator_forward_nchw_train(
    params: dict, z: jnp.ndarray, stage: int, alpha, cfg: ModelConfig
) -> jnp.ndarray:
    """Trainable Pallas path (impl ``"pallas_train"``, float32): the conv
    stack runs the fused NCHW kernel through :func:`ops.conv_vjp.
    conv3x3_act` — differentiable ONCE (first-order contexts only; the
    WGAN-GP grad-of-grad branch keeps the XLA lowering, train/step.py).
    The up2x between a block's convs is XLA (its transpose is a 2x2
    sum-pool, which XLA fuses)."""
    from ..ops.conv_vjp import conv3x3_act

    slope = cfg.leaky_slope
    eps = cfg.pixel_norm_eps

    def block(p, t):
        t = conv3x3_act(t, p["conv1"]["w"], p["conv1"]["b"], slope, True, eps)
        t = upsample_nearest_2x_nchw(t)
        return conv3x3_act(
            t, p["conv2"]["w"], p["conv2"]["b"], slope, True, eps
        )

    out = jnp.transpose(z, (0, 3, 1, 2)).astype(jnp.float32)
    for i in range(stage):
        out = block(params["blocks"][i], out)

    out_block = block(params["blocks"][stage], out)
    out_mp = _head_nchw(params["heads"][stage], out_block)

    if stage > 0:
        old = _head_nchw(params["heads"][stage - 1], out)
        old = upsample_nearest_2x_nchw(old)
        out_mp = alpha * out_mp + (1.0 - alpha) * old
    return jnp.transpose(out_mp, (0, 2, 3, 1))


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
