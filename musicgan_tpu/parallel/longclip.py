"""Time-axis-sharded long-clip generation (sequence parallelism).

The reference generates long clips single-device with a width-extended
latent and an O(T) serial host loop for phase accumulation
(reference ``generate.py:47-54``, ``audio/functions.py:117-118``).  Here the
*entire* synthesis graph — fully-convolutional generator, bark unscale,
phase prefix-sum, iSTFT overlap-add — is partitioned across the mesh along
the time/width axis with ``jax.sharding`` annotations.  XLA's SPMD
partitioner inserts the halo exchanges the 3x3 convs and the overlapping
iSTFT windows need (hop 256 < win 1024), and lowers the phase cumsum to a
parallel scan with an ICI carry exchange — exactly the plan in SURVEY.md §5.

No manual collectives: the sharding annotation IS the program.  A 2x-wide
latent on an N-device mesh gives each device a 1/N slice of the track.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..audio import magn_phase_to_signal
from ..config import ModelConfig
from ..models import generator_forward

__all__ = ["sharded_synthesize_fn"]


def sharded_synthesize_fn(
    mesh: Mesh,
    model_cfg: ModelConfig = ModelConfig(),
    stage: int = 7,
    axis: str = "data",
):
    """Build ``f(params, z) -> waveform`` sharded along the time axis.

    ``z``: (1, h, w_total, C) with ``w_total`` divisible by the mesh size.
    Output: 1-D waveform of length ``(256 * w_total - 1) * hop``, sharded
    over the mesh (fetch or keep sharded for downstream chunked writes).
    """
    z_sharding = NamedSharding(mesh, P(None, None, axis, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(repl, z_sharding),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    def synth(params, z):
        img = generator_forward(params, z, stage, 1.0, model_cfg)
        if stage < model_cfg.n_stages - 1:
            # partial-growth audition: nearest-upsample to full resolution
            # (matches generate._synthesize); the resize is local per
            # output pixel, so the time sharding survives it
            factor = 2 ** (model_cfg.n_stages - 1 - stage)
            m, h, w, c = img.shape
            img = jax.image.resize(
                img, (m, h * factor, w * factor, c), method="nearest"
            )
        # keep activations time-sharded through the vocoder
        img = jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P(None, None, axis, None))
        )
        mp = img.transpose(0, 3, 1, 2)  # (1, 2, H, W)
        return magn_phase_to_signal(mp[0][None])

    return synth
