"""Generation workflow: latent -> spectrogram image -> waveform, ONE graph.

The reference runs the generator on CPU, then inverts magnitude/phase with a
serial Python loop and torchaudio iSTFT (reference ``generate.py:12-65``,
``audio/functions.py:97-139``).  Here generator forward + bark unscale +
phase prefix-sum + MXU iSTFT compile into a single jitted graph (the
BASELINE.json north-star requirement), vmapped over the batch of musics.

Width-extended latents give long clips: ``z`` of width ``2 * nb_vec``
produces ``512 * nb_vec`` STFT frames ~ ``2.97 * nb_vec`` seconds.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np

from .audio import magn_phase_to_signal, save_wav
from .config import AudioConfig, GenerateConfig, ModelConfig
from .models import generator_forward

__all__ = ["synthesize_fn", "load_generator_params", "generate"]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _synthesize(
    params, z, stage: int, model_cfg: ModelConfig, istft_impl: str = "xla"
):
    """(M, h, 2*nb_vec, C) latent -> (M, T) waveforms, one compiled graph.

    For a partially-grown ``stage`` the image is nearest-upsampled to the
    full 512-bin resolution before vocoding, so audio can be auditioned
    from any growth checkpoint (the reference can only generate at
    end_layer=7, ``generate.py:29-32``).

    ``istft_impl``: the vocoder's iSTFT lowering — ``"xla"`` (matmul-DFT,
    audio/stft.py) or ``"pallas"`` (the fused kernel, ops/istft_pallas.py;
    batch rides the kernel grid, so no vmap wraps the pallas_call)."""
    import jax.numpy as jnp

    from .audio import mp_to_real_imag

    img = generator_forward(params, z, stage, 1.0, model_cfg)  # (M, H, W, 2)
    n_stages = model_cfg.n_stages
    if stage < n_stages - 1:
        factor = 2 ** (n_stages - 1 - stage)
        m, h, w, c = img.shape
        img = jax.image.resize(
            img, (m, h * factor, w * factor, c), method="nearest"
        )
    mp = img.transpose(0, 3, 1, 2)[:, None]  # (M, 1, 2, H, W): 1 wide chunk
    if istft_impl == "pallas":
        from .config import AudioConfig
        from .ops.istft_pallas import istft_fused

        acfg = AudioConfig()
        real, imag = jax.vmap(mp_to_real_imag)(mp)  # (M, n_bins+1?, T)
        return istft_fused(
            real, imag, n_fft=acfg.n_fft, hop=acfg.stft_stride
        )
    return jax.vmap(magn_phase_to_signal)(mp)


def synthesize_fn(model_cfg: ModelConfig = ModelConfig(), stage: int = 7):
    """Returns ``f(params, z) -> waveforms`` — the flagship compiled graph.

    ``conv_impl="auto"`` resolves to the measured winner on first call
    (cached per process + persisted; ops/autotune.py) — the resolution
    happens here, outside the jitted graph, where ``z``'s shape is known.

    The returned ``f`` is itself jittable: if a caller wraps it in an
    outer ``jax.jit`` (the driver's compile check does), ``z`` arrives as
    a tracer and the autotuner is resolved in trace-safe mode — persisted
    winner if one exists, XLA lowering otherwise — instead of running the
    timing harness inside the trace.
    """
    from .ops.autotune import resolve_conv_impl, resolve_istft_impl

    def f(params, z):
        allow_measure = not isinstance(z, jax.core.Tracer)
        cfg = resolve_conv_impl(
            model_cfg, tuple(z.shape), stage, allow_measure=allow_measure
        )
        # Spectrum frames the vocoder will invert: the fully-convolutional
        # stack upsamples x2 per block (n_stages blocks), and partial
        # stages are nearest-upsampled back to full resolution first —
        # so every latent column becomes 2^n_stages frames regardless of
        # stage (z width 2*nb_vec -> 512*nb_vec frames).
        t_frames = z.shape[2] * 2 ** model_cfg.n_stages
        istft_impl = resolve_istft_impl(
            t_frames, allow_measure=allow_measure
        )
        return _synthesize(params, z, stage, cfg, istft_impl)

    return f


def load_generator_params(
    ckpt: str, model_cfg: ModelConfig = ModelConfig()
):
    """Load generator params from either a musicgan_tpu checkpoint
    (``.../checkpoints`` dir or a specific ``save_N`` dir) or a reference
    PyTorch ``gen_*.pt`` state_dict."""
    if os.path.isfile(ckpt) and ckpt.endswith(".pt"):
        from .models.torch_ingest import load_reference_generator

        return load_reference_generator(ckpt, model_cfg)

    from .train.checkpoint import CheckpointManager, resolve_checkpoint
    from .train.step import init_train_state

    root, save_idx = resolve_checkpoint(ckpt)
    mgr = CheckpointManager(root)
    template = init_train_state(jax.random.PRNGKey(0), model_cfg)
    state, _ = mgr.restore(save_idx, template)
    # EMA-carrying runs (TrainConfig.ema_decay > 0) ship the averaged
    # weights — ProGAN/GANSynth eval convention (VALIDATION.md r3).
    return state.gen_ema if state.gen_ema is not None else state.gen_params


def generate(
    output_dir: str,
    rand_channels: int,
    gen_ckpt: str,
    nb_vec: int = GenerateConfig.nb_vec,
    nb_music: int = GenerateConfig.nb_music,
    seed: int = 0,
    stage: int = 7,
    model_cfg: Optional[ModelConfig] = None,
    audio_cfg: AudioConfig = AudioConfig(),
    z=None,
) -> list[str]:
    """CLI workflow (reference ``generate.py:12-65``): sample ``nb_music``
    wide latents, synthesize, write ``sound_{i}.wav``.  Returns paths.

    ``z``: optional explicit latent batch ``(nb_music, latent_height,
    latent_width * nb_vec, rand_channels)`` overriding the seeded sample —
    for reproducible generation and cross-framework parity tests (the
    reference samples with torch RNG, so matching by seed is impossible;
    matching by value is exact)."""
    import dataclasses

    if model_cfg is None:
        model_cfg = (
            ModelConfig()
            if rand_channels == ModelConfig.rand_channels
            else dataclasses.replace(ModelConfig(), rand_channels=rand_channels)
        )
    os.makedirs(output_dir, exist_ok=True)

    params = load_generator_params(gen_ckpt, model_cfg)
    if z is None:
        z = jax.random.normal(
            jax.random.PRNGKey(seed),
            (
                nb_music,
                model_cfg.latent_height,
                model_cfg.latent_width * nb_vec,
                model_cfg.rand_channels,
            ),
        )
    else:
        import jax.numpy as jnp

        z = jnp.asarray(z)
        expect = (
            nb_music,
            model_cfg.latent_height,
            model_cfg.latent_width * nb_vec,
            model_cfg.rand_channels,
        )
        if tuple(z.shape) != expect:
            raise ValueError(f"z shape {tuple(z.shape)} != expected {expect}")
    waves = np.asarray(synthesize_fn(model_cfg, stage)(params, z))

    paths = []
    for i, w in enumerate(waves):
        p = os.path.join(output_dir, f"sound_{i}.wav")
        save_wav(p, w, audio_cfg.sample_rate)
        paths.append(p)
    return paths
