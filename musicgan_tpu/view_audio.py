"""Visualization workflow: WAV -> magnitude/phase images
(reference ``view_audio.py:6-26``).

Headless-friendly: PNGs are written next to the input (or shown when a
display is available and ``save`` is False).
"""

from __future__ import annotations

import os

import numpy as np

from .audio import stft_to_phase_magn, wav_to_stft

__all__ = ["view_audio"]


def view_audio(
    audio_path: str,
    image_idx: int,
    save: bool = True,
    output_dir: str | None = None,
) -> list[str]:
    import matplotlib

    if save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = wav_to_stft(audio_path)
    magn, phase = stft_to_phase_magn(z)
    magn = np.asarray(magn[image_idx])
    phase = np.asarray(phase[image_idx])

    out_paths = []
    base = os.path.splitext(os.path.basename(audio_path))[0]
    out_dir = output_dir or os.path.dirname(os.path.abspath(audio_path))
    if save:
        os.makedirs(out_dir, exist_ok=True)
    for name, img in (("magnitude", magn), ("phase", phase)):
        fig, ax = plt.subplots()
        fig.suptitle(name)
        ax.matshow(img / (img.max() - img.min()), cmap="plasma")
        if save:
            p = os.path.join(out_dir, f"{base}_{name}_{image_idx}.png")
            fig.savefig(p)
            plt.close(fig)
            out_paths.append(p)
        else:
            fig.show()
    return out_paths
