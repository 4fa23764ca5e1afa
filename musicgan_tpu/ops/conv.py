"""Fused 3x3 convolution Pallas kernel for small-channel ProGAN layers.

Why: XLA's conv lowering for this generator's channel counts (16..128)
materializes im2col patches in HBM and leaves the MXU lanes mostly idle —
measured ~3.9 ms for the largest layer (24 GFLOP at ~6 TFLOP/s, with ~10x
the minimal HBM traffic).  This kernel instead:

* keeps activations in **NCHW** (W on the 128-lane dim — W is huge in this
  model, channels are tiny, so lane padding waste disappears);
* builds the 9-tap patch matrix **in VMEM** (never touching HBM) and packs
  the taps into the MXU contraction dim: one ``(cout, 9*cin) @ (9*cin,
  hb*wc)`` matmul per tile — K = 144..1152 instead of 16..128;
* fuses bias + LeakyReLU + (optional) PixelNorm into the matmul epilogue,
  eliminating separate HBM round-trips for the elementwise chain.

The caller pre-pads the input by the conv halo (and to tile multiples) in
XLA, so the kernel has no edge cases: every DMA is in-bounds and the zero
padding implements 'SAME' semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_conv3x3", "fused_conv3x3_msq", "fused_upconv3x3", "fused_block",
    "pack_weights", "pack_upconv_weights",
]


def pack_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) HWIO -> (cout, 9*cin), K ordered (dy, dx, c) to
    match the kernel's patch layout."""
    kh, kw, cin, cout = w_hwio.shape
    assert (kh, kw) == (3, 3)
    return w_hwio.reshape(9 * cin, cout).T


def pack_upconv_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) -> (4, cout, 4*cin): the four sub-pixel phase
    kernels of ``conv3x3(upsample_nearest_2x(x))`` (see
    ``models/layers.py::conv3x3_on_nearest_up2x``), each packed like
    :func:`pack_weights` with K ordered (dy, dx, c).  Phase index is
    ``a * 2 + b`` for output pixel (2i+a, 2j+b)."""
    kh, kw, cin, cout = w_hwio.shape
    assert (kh, kw) == (3, 3)
    w = w_hwio
    rows = [
        jnp.stack([w[0], w[1] + w[2]], axis=0),  # a = 0: (2, 3, cin, cout)
        jnp.stack([w[0] + w[1], w[2]], axis=0),  # a = 1
    ]

    def col_comb(wa, b):
        if b == 0:
            return jnp.stack([wa[:, 0], wa[:, 1] + wa[:, 2]], axis=1)
        return jnp.stack([wa[:, 0] + wa[:, 1], wa[:, 2]], axis=1)

    phases = [
        col_comb(rows[a], b).reshape(4 * cin, cout).T
        for a in (0, 1) for b in (0, 1)
    ]
    return jnp.stack(phases, axis=0)


def _choose_tiles(cin: int, h: int, w: int, itemsize: int) -> tuple[int, int]:
    """Pick (hb, wc) so slab + patch + out fit comfortably in VMEM.

    Both must respect Mosaic tiling: hb multiple of 8 (sublanes), wc
    multiple of 128 (lanes).  The VMEM budget must be computed on the
    SUBLANE-PADDED patch size: narrow dtypes tile at (32/itemsize, 128),
    so a (…, hb=8, wc) bf16 buffer occupies 16 sublane rows — ignoring
    that doubles the real footprint and blows the 16 MB scoped-vmem limit
    (observed at the wide-synthesis shape)."""
    wc = min(512, -(-w // 128) * 128)
    hb = 8
    padded_hb = max(hb, 32 // itemsize)  # Mosaic native sublane tiling
    # Shrink in 128-lane multiples (NOT halving: 384 // 2 = 192 violates
    # Mosaic's lane-multiple requirement on the output block).
    while wc > 128 and 9 * cin * padded_hb * wc * itemsize > 6 * 2**20:
        wc -= 128
    return hb, wc


def _kernel(x_hbm, w_ref, b_ref, o_ref, *rest,
            cin, cout, hb, wc, slope, pixel_norm, eps, upcast_dot=False,
            emit_msq=False):
    # ``emit_msq`` (training path): also write the pre-PixelNorm
    # ``mean(u^2)`` map — the one intermediate the custom VJP cannot
    # recover from the output (ops/conv_vjp.py).
    if emit_msq:
        m_ref, slab, patch, sem = rest
    else:
        slab, patch, sem = rest
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # DMA sizes are rounded up to the (8, 128) tiling: the slab over-reads
    # past the 2-element conv halo (the caller pads the source to cover it).
    copy = pltpu.make_async_copy(
        x_hbm.at[bi, :, pl.ds(i * hb, hb + 8), pl.ds(j * wc, wc + 128)],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    # Build the 9-tap patch tensor in VMEM: sublane groups (dy*3+dx)*cin..
    # +cin are the (dy, dx)-shifted view of the slab over the (hb, wc) tile.
    for dy in range(3):
        for dx in range(3):
            patch[(dy * 3 + dx) * cin : (dy * 3 + dx + 1) * cin, :, :] = (
                slab[:, dy : dy + hb, dx : dx + wc]
            )

    lhs = w_ref[:]
    rhs = patch[:].reshape(9 * cin, hb * wc)
    if upcast_dot:  # interpret mode: CPU has no bf16 x bf16 = f32 dot.
        # Faithful MXU emulation: bf16 products are exact in float32.
        lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
    y = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)  # (cout, hb*wc)
    y = y + b_ref[:]
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    if pixel_norm:
        mean_sq = jnp.mean(jnp.square(y), axis=0, keepdims=True)
        if emit_msq:
            m_ref[0] = mean_sq.reshape(1, hb, wc)
        y = y * jax.lax.rsqrt(mean_sq + eps)
    o_ref[0] = y.reshape(cout, hb, wc).astype(o_ref.dtype)


def _upconv_kernel(x_hbm, w_ref, b_ref, o_ref, slab, patch, sem, *,
                   cin, cout, hb, wc, slope, pixel_norm, eps,
                   upcast_dot=False, interp=False):
    """conv3x3(up2x(x)) via the four sub-pixel phase convolutions, the 4x
    upsampled intermediate never leaving VMEM.  Phase (a, b) sources the
    2x2 input window at offsets (a+dy, b+dx), dy/dx in {0,1}; the slab's
    leading halo row/col supplies offset 0."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, :, pl.ds(i * hb, hb + 8), pl.ds(j * wc, wc + 128)],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    ys = []
    for a in range(2):
        for b in range(2):
            for dy in range(2):
                for dx in range(2):
                    patch[(dy * 2 + dx) * cin : (dy * 2 + dx + 1) * cin] = (
                        slab[:, a + dy : a + dy + hb, b + dx : b + dx + wc]
                    )
            lhs = w_ref[a * 2 + b]
            rhs = patch[:].reshape(4 * cin, hb * wc)
            if upcast_dot:  # interpret mode: CPU lacks bf16 x bf16 dots
                lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
            y = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
            y = y + b_ref[:]
            if slope is not None:
                y = jnp.where(y >= 0, y, slope * y)
            if pixel_norm:
                mean_sq = jnp.mean(jnp.square(y), axis=0, keepdims=True)
                y = y * jax.lax.rsqrt(mean_sq + eps)
            ys.append(y.reshape(cout, hb, wc))

    # Interleave phases: out[c, 2r+a, 2q+b] = ys[a*2+b][c, r, q].
    if o_ref.dtype == jnp.bfloat16 and not interp:
        # Lane-local interleave via 16-bit pair packing: two bf16 packed
        # into one u32 lane unpack (pltpu.bitcast) along the SECOND-MINOR
        # dim with exactly interleave semantics (row 2r = low half).  The
        # W interleave rides the same trick behind a minor-dim transpose.
        # Everything is elementwise/bit ops + supported relayouts — no
        # lane gathers (Mosaic rejects multi-vreg gather dimensions) and
        # no trailing-1 shape casts.
        def pack_pairs(lo, hi):  # bf16 pair -> u32, lo in the low bits
            lo16 = pltpu.bitcast(lo, jnp.uint16).astype(jnp.uint32)
            hi16 = pltpu.bitcast(hi, jnp.uint16).astype(jnp.uint32)
            return lo16 | (hi16 << 16)

        def w_interleave(y_b0, y_b1):  # f32 (cout,hb,wc) -> bf16 (cout,hb,2wc)
            a0 = jnp.swapaxes(y_b0.astype(jnp.bfloat16), -1, -2)
            a1 = jnp.swapaxes(y_b1.astype(jnp.bfloat16), -1, -2)
            inter = pltpu.bitcast(pack_pairs(a0, a1), jnp.bfloat16)
            return jnp.swapaxes(inter, -1, -2)

        row0 = w_interleave(ys[0], ys[1])       # a = 0
        row1 = w_interleave(ys[2], ys[3])       # a = 1
        o_ref[0] = pltpu.bitcast(pack_pairs(row0, row1), jnp.bfloat16)
    else:
        # f32 output: stack + reshape (fine in the interpreter; Mosaic
        # currently rejects these casts, so on TPU the autotuner simply
        # never picks the f32 "pallas_up" — the bf16 variant is the point)
        row0 = jnp.stack([ys[0], ys[1]], axis=-1)
        row1 = jnp.stack([ys[2], ys[3]], axis=-1)
        t = jnp.stack([row0, row1], axis=2)     # (cout, hb, 2, wc, 2)
        o_ref[0] = t.reshape(cout, 2 * hb, 2 * wc).astype(o_ref.dtype)


def _choose_upconv_tiles(cin, cout, h, w, itemsize):
    """(hb, wc) for the upconv kernel.  The scoped-VMEM estimate must
    cover everything live at once: the 4-tap patch and slab (input
    dtype), the FOUR f32 phase outputs pre-interleave, the double-size
    output tile, and ~2 tile-sized interleave temporaries (transposed /
    packed copies)."""
    wc = min(512, -(-w // 128) * 128)
    hb = 8
    padded_hb = max(hb, 32 // itemsize)

    def est(wc):
        patch_slab = (4 * cin * padded_hb * wc
                      + cin * padded_hb * (wc + 128)) * itemsize
        ys_f32 = 4 * cout * padded_hb * wc * 4
        out_tile = cout * 2 * padded_hb * 2 * wc * itemsize * 3
        return patch_slab + ys_f32 + out_tile

    while wc > 128 and est(wc) > 10 * 2**20:
        wc -= 128
    return hb, wc


def _block_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  slab, patch9, c1, patch4, sem, *,
                  cin, cmid, cout, hb, wc, h_true, w_true, slope, eps,
                  upcast_dot=False, interp=False):
    """Whole generator block in one kernel: conv3x3 + LeakyReLU + PixelNorm
    (conv1) -> conv3x3(up2x(.)) + LeakyReLU + PixelNorm (the fused
    sub-pixel upconv).  conv1's output lives only in VMEM (computed with a
    1-pixel halo so the upconv's phase taps stay in-tile); the block's
    only HBM traffic is the input slab and the final 2x-resolution output.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, :, pl.ds(i * hb, hb + 8), pl.ds(j * wc, wc + 256)],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    # --- conv1 over the (hb+2)-row halo region ---------------------------
    # Columns span the full 128-aligned slab width: Mosaic only supports
    # the (rows, lanes) -> (rows*lanes) merge when the lane dim is a
    # 128-multiple, so a ragged wc+2 region cannot feed the matmul.  The
    # extra columns are wasted MACs on halo data; only [0, wc+2) is read
    # by the upconv stage.
    hr, wr = hb + 2, wc + 128
    for dy in range(3):
        for dx in range(3):
            patch9[(dy * 3 + dx) * cin : (dy * 3 + dx + 1) * cin] = (
                slab[:, dy : dy + hr, dx : dx + wr]
            )
    lhs = w1_ref[:]
    rhs = patch9[:].reshape(9 * cin, hr * wr)
    if upcast_dot:
        lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
    y1 = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    y1 = y1 + b1_ref[:]
    y1 = jnp.where(y1 >= 0, y1, slope * y1)
    mean_sq = jnp.mean(jnp.square(y1), axis=0, keepdims=True)
    y1 = y1 * jax.lax.rsqrt(mean_sq + eps)
    y1 = y1.reshape(cmid, hr, wr)
    # The c1 halo must match the UNFUSED semantics: conv2's 'SAME' padding
    # sees ZEROS outside the true input, not conv1-of-zero-padding values.
    # Mask halo positions that fall outside [0, h) x [0, w) globally.
    rows = jax.lax.broadcasted_iota(jnp.int32, (cmid, hr, wr), 1) \
        + i * hb - 1
    cols = jax.lax.broadcasted_iota(jnp.int32, (cmid, hr, wr), 2) \
        + j * wc - 1
    valid = ((rows >= 0) & (rows < h_true) & (cols >= 0) & (cols < w_true))
    c1[...] = jnp.where(valid, y1, 0.0).astype(c1.dtype)

    # --- fused up2x + conv3x3 from the VMEM-resident c1 ------------------
    ys = []
    for a in range(2):
        for b in range(2):
            for dy in range(2):
                for dx in range(2):
                    patch4[(dy * 2 + dx) * cmid : (dy * 2 + dx + 1) * cmid] = (
                        c1[:, a + dy : a + dy + hb, b + dx : b + dx + wc]
                    )
            lhs = w2_ref[a * 2 + b]
            rhs = patch4[:].reshape(4 * cmid, hb * wc)
            if upcast_dot:
                lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
            y = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
            y = y + b2_ref[:]
            y = jnp.where(y >= 0, y, slope * y)
            mean_sq = jnp.mean(jnp.square(y), axis=0, keepdims=True)
            y = y * jax.lax.rsqrt(mean_sq + eps)
            ys.append(y.reshape(cout, hb, wc))

    if o_ref.dtype == jnp.bfloat16 and not interp:
        def pack_pairs(lo, hi):
            lo16 = pltpu.bitcast(lo, jnp.uint16).astype(jnp.uint32)
            hi16 = pltpu.bitcast(hi, jnp.uint16).astype(jnp.uint32)
            return lo16 | (hi16 << 16)

        def w_interleave(y_b0, y_b1):
            a0 = jnp.swapaxes(y_b0.astype(jnp.bfloat16), -1, -2)
            a1 = jnp.swapaxes(y_b1.astype(jnp.bfloat16), -1, -2)
            inter = pltpu.bitcast(pack_pairs(a0, a1), jnp.bfloat16)
            return jnp.swapaxes(inter, -1, -2)

        row0 = w_interleave(ys[0], ys[1])
        row1 = w_interleave(ys[2], ys[3])
        o_ref[0] = pltpu.bitcast(pack_pairs(row0, row1), jnp.bfloat16)
    else:
        row0 = jnp.stack([ys[0], ys[1]], axis=-1)
        row1 = jnp.stack([ys[2], ys[3]], axis=-1)
        t = jnp.stack([row0, row1], axis=2)
        o_ref[0] = t.reshape(cout, 2 * hb, 2 * wc).astype(o_ref.dtype)


def _choose_block_tiles(cin, cmid, cout, h, w, itemsize):
    """(hb, wc) for the whole-block kernel: patch9 + slab + c1 + patch4 +
    four f32 phase outputs + double-size output tile + interleave temps."""
    wc = min(512, -(-w // 128) * 128)
    hb = 8
    padded_hb = max(hb, 32 // itemsize)

    def est(wc):
        hr = padded_hb + 2
        return (
            (9 * cin * hr * (wc + 128)          # patch9 (aligned width)
             + cin * (padded_hb + 8) * (wc + 256)  # slab
             + cmid * hr * (wc + 128)           # c1
             + 4 * cmid * padded_hb * wc) * itemsize
            + (cmid + cout) * hr * (wc + 128) * 4  # y1 + ys f32 staging
            + 4 * cout * padded_hb * wc * 4     # ys f32
            + cout * 2 * padded_hb * 2 * wc * itemsize * 3
        )

    while wc > 128 and est(wc) > 10 * 2**20:
        wc -= 128
    return hb, wc


def fused_block_fits(cin, cmid, cout, itemsize) -> bool:
    """Whether the whole-block kernel's scratch fits scoped VMEM at the
    minimum tile.  Big-channel layers (the spatially tiny early blocks)
    exceed it — callers fall back to the conv + upconv pair there."""
    padded_hb = max(8, 32 // itemsize)
    hr = padded_hb + 2
    wc = 128
    est = (
        (9 * cin * hr * (wc + 128)
         + cin * (padded_hb + 8) * (wc + 256)
         + cmid * hr * (wc + 128)
         + 4 * cmid * padded_hb * wc) * itemsize
        + (cmid + cout) * hr * (wc + 128) * 4
        + 4 * cout * padded_hb * wc * 4
        + cout * 2 * padded_hb * 2 * wc * itemsize * 3
    )
    return est <= 10 * 2**20


@functools.partial(
    jax.jit, static_argnames=("slope", "eps", "out_dtype", "interpret")
)
def fused_block(
    x: jnp.ndarray,
    w1_hwio: jnp.ndarray,
    b1: jnp.ndarray,
    w2_hwio: jnp.ndarray,
    b2: jnp.ndarray,
    slope: float = 0.2,
    eps: float = 1e-8,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """One whole ProGAN generator block in a single Pallas call:
    ``pn(lrelu(conv3x3))`` then ``pn(lrelu(conv3x3(up2x(.))))`` on NCHW
    ``(B, cin, H, W)`` -> ``(B, cout, 2H, 2W)``.  Neither the conv1
    output nor the 4x upsampled intermediate ever touches HBM."""
    bsz, cin, h, w = x.shape
    cmid = w1_hwio.shape[3]
    cout = w2_hwio.shape[3]
    assert w1_hwio.shape[:3] == (3, 3, cin)
    assert w2_hwio.shape[:3] == (3, 3, cmid)

    hb, wc = _choose_block_tiles(cin, cmid, cout, h, w, x.dtype.itemsize)
    n_h = -(-h // hb)
    n_w = -(-w // wc)
    h_pad, w_pad = n_h * hb, n_w * wc

    # Halo 2: conv1's 1-pixel halo on top of the upconv's 1-pixel reach.
    # Column padding covers the aligned conv1 width (wc + 256 slab).
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (2, h_pad + 6 - h), (2, w_pad + 254 - w))
    )
    w1_packed = pack_weights(w1_hwio).astype(x.dtype)       # (cmid, 9cin)
    w2_packed = pack_upconv_weights(w2_hwio).astype(x.dtype)
    b1_col = b1.reshape(cmid, 1).astype(jnp.float32)
    b2_col = b2.reshape(cout, 1).astype(jnp.float32)

    kern = functools.partial(
        _block_kernel,
        cin=cin, cmid=cmid, cout=cout, hb=hb, wc=wc,
        h_true=h, w_true=w, slope=slope, eps=eps,
        upcast_dot=interpret and x.dtype != jnp.float32,
        interp=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_h, n_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cmid, 9 * cin), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, 1), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cout, 4 * cmid), lambda bi, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda bi, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, 2 * hb, 2 * wc), lambda bi, i, j: (bi, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, cout, 2 * h_pad, 2 * w_pad), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((cin, hb + 8, wc + 256), x.dtype),
            pltpu.VMEM((9 * cin, hb + 2, wc + 128), x.dtype),
            pltpu.VMEM((cmid, hb + 2, wc + 128), x.dtype),
            pltpu.VMEM((4 * cmid, hb, wc), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1_packed, b1_col, w2_packed, b2_col)
    return out[:, :, : 2 * h, : 2 * w]


@functools.partial(
    jax.jit,
    static_argnames=("slope", "pixel_norm", "eps", "out_dtype", "interpret"),
)
def fused_upconv3x3(
    x: jnp.ndarray,
    w_hwio: jnp.ndarray,
    b: jnp.ndarray,
    slope: float | None = None,
    pixel_norm: bool = False,
    eps: float = 1e-8,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """``conv3x3(upsample_nearest_2x(x))`` on NCHW ``(B, cin, H, W)`` ->
    ``(B, cout, 2H, 2W)`` with fused bias / LeakyReLU / PixelNorm.

    The 4x-sized upsampled intermediate exists only in VMEM — on the
    DMA-bound generator stack this halves the HBM traffic of every
    up+conv pair (the dominant term; PERF.md)."""
    bsz, cin, h, w = x.shape
    cout = w_hwio.shape[3]
    assert w_hwio.shape[:3] == (3, 3, cin)

    hb, wc = _choose_upconv_tiles(cin, cout, h, w, x.dtype.itemsize)
    n_h = -(-h // hb)
    n_w = -(-w // wc)
    h_pad, w_pad = n_h * hb, n_w * wc

    xp = jnp.pad(
        x, ((0, 0), (0, 0), (1, h_pad + 7 - h), (1, w_pad + 127 - w))
    )
    w_packed = pack_upconv_weights(w_hwio).astype(x.dtype)  # (4, cout, 4cin)
    b_col = b.reshape(cout, 1).astype(jnp.float32)

    kern = functools.partial(
        _upconv_kernel,
        cin=cin, cout=cout, hb=hb, wc=wc,
        slope=slope, pixel_norm=pixel_norm, eps=eps,
        upcast_dot=interpret and x.dtype != jnp.float32,
        interp=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_h, n_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (4, cout, 4 * cin), lambda bi, i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cout, 1), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, 2 * hb, 2 * wc), lambda bi, i, j: (bi, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, cout, 2 * h_pad, 2 * w_pad), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((cin, hb + 8, wc + 128), x.dtype),
            pltpu.VMEM((4 * cin, hb, wc), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w_packed, b_col)
    return out[:, :, : 2 * h, : 2 * w]


def _conv3x3_call(
    x, w_hwio, b, slope, pixel_norm, eps, out_dtype, interpret, emit_msq
):
    """Shared pallas_call construction for the fused 3x3 conv; with
    ``emit_msq`` also returns the pre-PixelNorm ``mean(u^2)`` map
    ``(B, 1, H, W)`` (the custom-VJP residual)."""
    bsz, cin, h, w = x.shape
    cout = w_hwio.shape[3]
    assert w_hwio.shape[:3] == (3, 3, cin)

    hb, wc = _choose_tiles(cin, h, w, x.dtype.itemsize)
    # hb stays a multiple of 8 even for tiny H: the DMA slab's second-minor
    # dim (hb + 8) must be 8-aligned for Mosaic; extra rows are zero padding.
    n_h = -(-h // hb)
    n_w = -(-w // wc)
    h_pad, w_pad = n_h * hb, n_w * wc

    # Halo + tile-multiple + DMA-alignment padding in XLA; the zero halo
    # implements 'SAME' conv semantics, the extra rows/cols only satisfy
    # Mosaic's (8, 128)-aligned DMA size requirement.
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (1, h_pad + 7 - h), (1, w_pad + 127 - w))
    )

    w_packed = pack_weights(w_hwio).astype(x.dtype)  # (cout, 9*cin)
    b_col = b.reshape(cout, 1).astype(jnp.float32)

    kern = functools.partial(
        _kernel,
        cin=cin, cout=cout, hb=hb, wc=wc,
        slope=slope, pixel_norm=pixel_norm, eps=eps,
        upcast_dot=interpret and x.dtype != jnp.float32,
        emit_msq=emit_msq,
    )
    out_specs = pl.BlockSpec(
        (1, cout, hb, wc), lambda bi, i, j: (bi, 0, i, j),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((bsz, cout, h_pad, w_pad), out_dtype)
    if emit_msq:
        assert pixel_norm
        out_specs = (out_specs, pl.BlockSpec(
            (1, 1, hb, wc), lambda bi, i, j: (bi, 0, i, j),
            memory_space=pltpu.VMEM,
        ))
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (bsz, 1, h_pad, w_pad), jnp.float32
        ))
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_h, n_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (cout, 9 * cin), lambda bi, i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cout, 1), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((cin, hb + 8, wc + 128), x.dtype),
            pltpu.VMEM((9 * cin, hb, wc), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w_packed, b_col)
    if emit_msq:
        y, m = out
        return y[:, :, :h, :w], m[:, :, :h, :w]
    return out[:, :, :h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("slope", "pixel_norm", "eps", "out_dtype", "interpret"),
)
def fused_conv3x3(
    x: jnp.ndarray,
    w_hwio: jnp.ndarray,
    b: jnp.ndarray,
    slope: float | None = None,
    pixel_norm: bool = False,
    eps: float = 1e-8,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 'SAME' conv on NCHW ``(B, cin, H, W)`` -> ``(B, cout, H, W)``
    with fused bias / LeakyReLU / PixelNorm epilogue."""
    return _conv3x3_call(
        x, w_hwio, b, slope, pixel_norm, eps, out_dtype, interpret,
        emit_msq=False,
    )


@functools.partial(
    jax.jit, static_argnames=("slope", "eps", "interpret")
)
def fused_conv3x3_msq(
    x: jnp.ndarray,
    w_hwio: jnp.ndarray,
    b: jnp.ndarray,
    slope: float | None = None,
    eps: float = 1e-8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Training-forward variant of :func:`fused_conv3x3` with PixelNorm:
    returns ``(y, mean_sq)`` where ``mean_sq`` is the pre-norm
    ``mean_c(u^2)`` map ``(B, 1, H, W)`` — the only intermediate the
    backward pass (ops/conv_vjp.py) cannot reconstruct from ``y`` (f32
    cancellation: ``mean(y^2) = m/(m+eps)`` rounds to 1.0 for m >> eps)."""
    return _conv3x3_call(
        x, w_hwio, b, slope, True, eps, jnp.float32, interpret,
        emit_msq=True,
    )
