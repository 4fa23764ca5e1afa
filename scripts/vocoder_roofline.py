"""Vocoder (iSTFT) close-out study: fused Pallas kernel vs XLA vs bounds.

The round-4 VERDICT item 6 / BASELINE.json north-star item ("iSTFT
inverse become fused JAX/Pallas kernels") closes with DATA from this
script, run on the real chip at the synthesis shape:

1. measured matmul peak (f32 default precision AND Precision.HIGHEST —
   the vocoder runs HIGHEST; the two differ ~6x on the MXU),
2. measured HBM bandwidth (big elementwise add),
3. wall time per iSTFT for both lowerings (autotune's own harness),
4. the matmul-only "ideal" (the two iDFT products alone, no OLA/env),
5. the light-speed bound  max(flops / peak_highest, bytes / bw)  and
   each lowering's fraction of it,
6. end-to-end synthesis (G fwd + vocoder, the bench headline graph)
   with each lowering.

Usage: python scripts/vocoder_roofline.py [--nb-vec 20] [--json-out F]
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from musicgan_tpu.utils.cache import enable_compilation_cache


# Shared repo-wide measurement primitives (utils/timing.py) — the same
# implementations bench.py and the autotuner use, so the roofline's
# numbers are directly comparable to BENCH_r*.json rows.
from musicgan_tpu.utils.timing import (  # noqa: E402
    measure_peak_tflops,
    scalar_rtt as _rtt,
    time_dispatch as _time_dispatch,
)


def measure_peak(precision, rtt, n=2048, depth=64) -> float:
    return measure_peak_tflops(
        jnp.float32, rtt, precision=precision, n=n, depth=depth
    )


def measure_bandwidth(rtt, mb=256, depth=16) -> float:
    """Effective HBM GB/s: chained adds on a big buffer (read+write)."""
    n = mb * (1 << 20) // 4
    x = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def chain(x):
        def body(c, _):
            return c + 1.0, None

        c, _ = jax.lax.scan(body, x, None, length=depth)
        return jnp.sum(c[:8])

    dt = _time_dispatch(chain, x, rtt=rtt)
    return 2.0 * n * 4 * depth / dt / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb-vec", type=int, default=20)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()

    from musicgan_tpu.config import ModelConfig
    from musicgan_tpu.generate import _synthesize
    from musicgan_tpu.models import init_generator
    from musicgan_tpu.ops.autotune import measure_istft_impls
    from musicgan_tpu.ops.istft_pallas import _windowed_idft_bases

    n_bins, n_fft, hop = 513, 1024, 256
    t = 512 * args.nb_vec
    rtt = _rtt()
    out: dict = {"t_frames": t, "rtt_ms": round(rtt * 1e3, 3)}

    out["peak_tflops_f32_default"] = round(
        measure_peak(jax.lax.Precision.DEFAULT, rtt), 2
    )
    out["peak_tflops_f32_highest"] = round(
        measure_peak(jax.lax.Precision.HIGHEST, rtt), 2
    )
    out["hbm_gbs"] = round(measure_bandwidth(rtt), 1)

    # --- the two lowerings, autotune's own harness -----------------------
    times = measure_istft_impls(n_bins, t)
    # rtt-corrected tiny-shape timings can clamp to 0; keep a floor so the
    # fractions below stay defined (the headline shape is never this fast)
    xla_s = max(times["xla"], 1e-7)
    pallas_s = max(times["pallas"], 1e-7)
    out["istft_xla_ms"] = round(xla_s * 1e3, 4)
    out["istft_pallas_ms"] = round(pallas_s * 1e3, 4)

    # --- matmul-only ideal: the two iDFT products, nothing else ----------
    wcos, wsin = (jnp.asarray(b) for b in _windowed_idft_bases(n_fft, True))
    rng = np.random.default_rng(0)
    rt = jnp.asarray(rng.normal(size=(t, n_bins)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(t, n_bins)).astype(np.float32))

    @jax.jit
    def mm_only(rt, it):
        def body(c, i):
            f = jax.lax.dot_general(
                rt + i * 0.0, wcos, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) + jax.lax.dot_general(
                it, wsin, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return c + jnp.sum(f), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(4))
        return c

    out["matmul_only_ms"] = round(
        (_time_dispatch(mm_only, rt, it, rtt=rtt) / 4) * 1e3, 3
    )

    # --- light-speed bound ------------------------------------------------
    flops = 2.0 * 2.0 * t * n_bins * n_fft
    bytes_min = (2 * t * n_bins + t * hop) * 4
    t_comp = flops / (out["peak_tflops_f32_highest"] * 1e12)
    t_mem = bytes_min / (out["hbm_gbs"] * 1e9)
    bound_ms = max(t_comp, t_mem) * 1e3
    out["flops_per_istft"] = flops
    out["bytes_min_per_istft"] = bytes_min
    out["bound_ms"] = round(bound_ms, 4)
    out["bound_kind"] = "compute" if t_comp >= t_mem else "memory"
    out["xla_frac_of_bound"] = round(bound_ms / (xla_s * 1e3), 3)
    out["pallas_frac_of_bound"] = round(bound_ms / (pallas_s * 1e3), 3)

    # --- end-to-end synthesis (the bench headline graph), both lowerings -
    from musicgan_tpu.ops.autotune import resolve_conv_impl

    mcfg = ModelConfig()
    z = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, mcfg.latent_height, mcfg.latent_width * args.nb_vec,
         mcfg.rand_channels),
    )
    mcfg = resolve_conv_impl(mcfg, tuple(z.shape), 7)
    params = init_generator(jax.random.PRNGKey(0), mcfg)
    for impl in ("xla", "pallas"):
        fn = jax.jit(
            lambda p, zz, _i=impl: jnp.sum(_synthesize(p, zz, 7, mcfg, _i))
        )
        out[f"synthesis_{impl}_ms"] = round(
            _time_dispatch(fn, params, z, rtt=rtt) * 1e3, 2
        )

    print(json.dumps(out, indent=1))
    winner = "pallas" if out["istft_pallas_ms"] < out["istft_xla_ms"] else "xla"
    print(
        f"verdict: {winner} wins the iSTFT at t={t} "
        f"({out['istft_pallas_ms']} vs {out['istft_xla_ms']} ms; "
        f"bound {out['bound_ms']} ms, {out['bound_kind']}-limited)"
    )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
