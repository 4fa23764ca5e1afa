"""Headline benchmark: end-to-end audio synthesis throughput.

Measures the flagship single-graph pipeline — full-grown generator forward
+ bark unscale + phase prefix-sum + MXU iSTFT — as *seconds of audio
synthesized per wall-clock second per chip*.

Methodology: K independent synthesis passes run on-device inside one
``lax.scan`` dispatch that returns a single scalar, which is then fetched
to the host.  This forces real execution and amortizes host<->device
round-trip latency (under the axon tunnel, ``block_until_ready`` is a
no-op and fetching the full waveform measures tunnel bandwidth, not the
chip — both were observed and rejected as methodologies).

North star (BASELINE.json): 60 s of audio in < 1 s end-to-end, i.e. a
value of 60; ``vs_baseline`` is value / 60.  The reference publishes no
numbers of its own (BASELINE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from musicgan_tpu.audio import magn_phase_to_signal
from musicgan_tpu.config import AudioConfig, ModelConfig
from musicgan_tpu.models import generator_forward, init_generator

NB_VEC = 20  # ~59.4 s of audio per synthesis
K = 8        # on-device iterations per dispatch
REPS = 3     # dispatches timed


def main() -> None:
    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model_cfg = ModelConfig()
    audio_cfg = AudioConfig()
    params = init_generator(jax.random.PRNGKey(0), model_cfg)

    # Scalar round-trip latency, subtracted from the measurement.
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(tiny(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    @jax.jit
    def many(params, key):
        def body(carry, i):
            z = jax.random.normal(
                jax.random.fold_in(key, i),
                (1, model_cfg.latent_height, model_cfg.latent_width * NB_VEC,
                 model_cfg.rand_channels),
            )
            img = generator_forward(params, z, 7, 1.0, model_cfg)
            mp = img.transpose(0, 3, 1, 2)[:, None]
            wave = jax.vmap(magn_phase_to_signal)(mp)
            return carry + jnp.sum(wave), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out

    np.asarray(many(params, jax.random.PRNGKey(99)))  # warmup / compile

    t0 = time.perf_counter()
    for r in range(REPS):
        np.asarray(many(params, jax.random.PRNGKey(r)))
    per_synthesis = ((time.perf_counter() - t0) / REPS - rtt) / K

    audio_seconds = (
        (512 * NB_VEC - 1) * audio_cfg.stft_stride / audio_cfg.sample_rate
    )
    value = audio_seconds / per_synthesis
    print(
        json.dumps(
            {
                "metric": "gen_audio_sec_per_wall_sec",
                "value": round(value, 2),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(value / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys
    import time as _time

    # The tunneled TPU occasionally reports FAILED_PRECONDITION right after
    # another process released it; retry before giving up.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed ({e!r}); retrying",
                  file=sys.stderr)
            _time.sleep(20)
