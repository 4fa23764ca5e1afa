"""Fused Pallas iSTFT: iDFT matmuls + window + overlap-add in one kernel.

The north-star item (BASELINE.json: "iSTFT inverse become fused JAX/Pallas
kernels"; SURVEY §7 step 7).  The XLA lowering (``audio/stft.py:152-191``)
materializes the ``(T, n_fft)`` frame matrix in HBM between the iDFT
matmul, the window multiply, and the overlap-add's shifted pads; this
kernel keeps a whole frame tile resident in VMEM from MXU output to the
overlap-added signal tile, and the window multiply disappears entirely —
it is FOLDED INTO the iDFT bases ahead of time (``(A @ B) * w == A @
(B * w[None, :])`` since the window scales output columns).

Layout (per batch element):

* the ``(n_bins, T)`` spectrum is transposed to time-major and padded
  with ``r - 1 = n_fft/hop - 1`` leading zero frames, so every output
  tile's overlap-add halo reads ONE contiguous row range;
* grid ``(B, n_tiles)``: each step DMAs its ``(T_b + r - 1, n_bins)``
  real/imag tiles HBM -> VMEM (double-buffered — the next tile's DMA is
  in flight while this tile computes), runs the two ``(T_b + r - 1,
  n_bins) @ (n_bins, n_fft)`` MXU matmuls, overlap-adds in registers via
  ``r`` static shifted slices, and writes a dense ``(T_b, hop)`` signal
  tile;
* the COLA envelope division and centering trim are left to XLA (tiny
  elementwise epilogue, fused into the surrounding graph).

Numerics are float32 end-to-end and match ``istft_real_imag`` (parity
tests in ``tests/test_ops.py``).  Batch rides the grid, not ``vmap`` —
manual-DMA kernels and ``vmap`` do not mix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.stft import _idft_bases, hann_window, overlap_add, signal_length

__all__ = ["istft_fused"]


@functools.lru_cache(maxsize=8)
def _windowed_idft_bases(
    n_fft: int, normalized: bool
) -> tuple[np.ndarray, np.ndarray]:
    """iDFT bases with the synthesis window (and the ``normalized=True``
    rescale of ``istft_real_imag``) folded into the output columns."""
    cos_ib, sin_ib = _idft_bases(n_fft)
    w = hann_window(n_fft, np.float64)
    scale = np.sqrt(np.sum(w**2)) if normalized else 1.0
    wcos = (cos_ib.astype(np.float64) * w[None, :] * scale).astype(np.float32)
    wsin = (sin_ib.astype(np.float64) * w[None, :] * scale).astype(np.float32)
    return wcos, wsin


def _kernel_factory(t_block: int, r: int, hop: int, n_bins: int, n_tiles: int):
    L = t_block + r - 1
    # Mosaic requires DMA'd VMEM slices to be tile-aligned — (8, 128) for
    # f32 — so the halo tile pads its rows to 8 and the caller pads the
    # bin (lane) dim to 128.  Neither costs real work: the MXU tiles the
    # contraction dim to 128 internally regardless, and the pad columns
    # are zeros.
    L_pad = -(-L // 8) * 8

    def kernel(rt_ref, it_ref, wcos_ref, wsin_ref, out_ref,
               rt_sc, it_sc, sem_rt, sem_it):
        b = pl.program_id(0)
        i = pl.program_id(1)
        n_b = pl.num_programs(0)

        def dmas(slot, bb, tile):
            return (
                pltpu.make_async_copy(
                    rt_ref.at[bb, pl.ds(tile * t_block, L_pad), :],
                    rt_sc.at[slot], sem_rt.at[slot],
                ),
                pltpu.make_async_copy(
                    it_ref.at[bb, pl.ds(tile * t_block, L_pad), :],
                    it_sc.at[slot], sem_it.at[slot],
                ),
            )

        step = b * n_tiles + i

        @pl.when(step == 0)
        def _():
            for d in dmas(0, 0, 0):
                d.start()

        # Prefetch the next tile (possibly the next batch element's first)
        # while this one computes.
        nxt_b = jnp.where(i + 1 < n_tiles, b, b + 1)
        nxt_i = jnp.where(i + 1 < n_tiles, i + 1, 0)

        @pl.when(step + 1 < n_b * n_tiles)
        def _():
            for d in dmas((step + 1) % 2, nxt_b, nxt_i):
                d.start()

        for d in dmas(step % 2, b, i):
            d.wait()

        slot = step % 2
        # HIGHEST precision: the MXU multiplies in bf16 by default (3.6e-4
        # relative error observed on-chip); the multi-pass f32 mode
        # matches the XLA lowering's Precision.HIGHEST vocoder numerics.
        frames = jax.lax.dot_general(
            rt_sc[slot], wcos_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + jax.lax.dot_general(
            it_sc[slot], wsin_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # Overlap-add: acc[q] = sum_j frames[q + (r-1) - j][chunk j]
        # (the r-1 leading halo rows make every term a static 2-D slice;
        # the L_pad - L alignment rows beyond the halo are never read).
        acc = frames[r - 1 : r - 1 + t_block, 0:hop]
        for j in range(1, r):
            lo = r - 1 - j
            acc = acc + frames[lo : lo + t_block, j * hop : (j + 1) * hop]
        out_ref[:] = acc[None]

    return kernel, L_pad


def istft_fused(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    normalized: bool = True,
    t_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-kernel inverse STFT from ``(B, n_bins, T)`` (or unbatched
    ``(n_bins, T)``) real/imag parts -> ``(B, (T-1)*hop)`` signals.

    Drop-in numerical match for ``audio.stft.istft_real_imag`` (which
    documents the torch semantics both implement)."""
    assert n_fft % hop == 0
    unbatched = real.ndim == 2
    if unbatched:
        real, imag = real[None], imag[None]
    batch, n_bins, t = real.shape
    assert n_fft // 2 + 1 == n_bins, (n_bins, n_fft)
    r = n_fft // hop

    rows_out = t + r - 1  # overlap-add rows before trimming
    n_tiles = -(-rows_out // t_block)
    l_pad = -(-(t_block + r - 1) // 8) * 8  # mirrors _kernel_factory
    rows_in = (n_tiles - 1) * t_block + l_pad
    nb_pad = -(-n_bins // 128) * 128  # lane-aligned bin dim (zero columns)

    # Time-major, (r-1) leading zero frames (the halo), zero tail padding,
    # zero-padded bin columns for lane alignment (the MXU tiles the
    # contraction dim to 128 internally anyway, so the pad is free work).
    def prep(x):
        x = x.transpose(0, 2, 1).astype(jnp.float32)  # (B, T, n_bins)
        return jnp.pad(
            x,
            ((0, 0), (r - 1, rows_in - (r - 1) - t), (0, nb_pad - n_bins)),
        )

    rt, it = prep(real), prep(imag)
    wcos, wsin = (
        jnp.pad(jnp.asarray(b), ((0, nb_pad - n_bins), (0, 0)))
        for b in _windowed_idft_bases(n_fft, normalized)
    )

    kernel, l_scratch = _kernel_factory(t_block, r, hop, nb_pad, n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # rt: DMA'd manually
            pl.BlockSpec(memory_space=pl.ANY),      # it: DMA'd manually
            pl.BlockSpec(
                (nb_pad, n_fft), lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nb_pad, n_fft), lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_block, hop), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, n_tiles * t_block, hop), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, l_scratch, nb_pad), jnp.float32),
            pltpu.VMEM((2, l_scratch, nb_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rt, it, wcos, wsin)

    y = out.reshape(batch, -1)[:, : rows_out * hop]

    # COLA envelope + centering trim — identical epilogue to
    # istft_real_imag (XLA fuses these elementwise ops into the graph).
    window = jnp.asarray(hann_window(n_fft))
    env = overlap_add(
        jnp.broadcast_to((window**2).reshape(1, -1), (t, n_fft)), hop
    )
    y = y / jnp.maximum(env, 1e-11)[None, :]
    pad = n_fft // 2
    y = y[:, pad : pad + signal_length(t, hop)]
    return y[0] if unbatched else y
