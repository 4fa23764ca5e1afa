"""musicgan_tpu — a TPU-native progressive-growing WGAN-GP music synthesis
framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
Ipsedo/MusicGAN reference (GANSynth-style bark-scaled magnitude +
instantaneous-frequency spectrogram images, ProGAN generator/discriminator,
WGAN-GP training, WAV generation), re-architected TPU-first:

* MXU matmul-DFT STFT/iSTFT (no FFT), fused magn/phase transforms;
* functional models with a static stage index (one XLA graph per stage);
* jitted, donated-buffer WGAN-GP train step with grad-of-grad penalty;
* data-parallel training over a ``jax.sharding.Mesh``;
* single-graph generation (G forward + iSTFT vocoder);
* full train-state checkpointing WITH resume (absent in the reference).
"""

__version__ = "0.1.0"

from . import audio, config, models

__all__ = [
    "audio",
    "config",
    "models",
    "create_dataset",
    "train",
    "generate",
    "view_audio",
    "__version__",
]


def __getattr__(name):
    # Lazy workflow imports keep `import musicgan_tpu` light (no optax/orbax
    # unless training is actually used).
    if name == "create_dataset":
        from .audio.ingest import create_dataset

        return create_dataset
    if name == "train":
        from .train import train

        return train
    if name == "generate":
        from .generate import generate

        return generate
    if name == "view_audio":
        from .view_audio import view_audio

        return view_audio
    raise AttributeError(name)
