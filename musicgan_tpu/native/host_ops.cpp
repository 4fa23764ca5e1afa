// Native host-side ingest kernel: fused magn/phase/bark/minmax/chunk-pack.
//
// The TPU-native framework keeps device compute in XLA/Pallas; the host
// ingest tail (reference create_dataset.py:13-64 -> audio/functions.py:65-94)
// is the one hot CPU path, and the numpy mirror in audio/ingest.py spends
// most of its time in many full-array passes (SIMD atan2/abs, a float64
// phase-difference pipeline with several temporaries, in-place
// normalization sweeps, a strided packing transpose).  This kernel fuses
// the whole post-FFT tail into a small number of cache-resident passes:
//
//   per frequency bin (row of the spectrogram, time-contiguous):
//     stage A (vectorized): magnitude sqrt(re^2+im^2)*bark and phase
//         atan2(im, re) for the whole row into two L1/L2-resident
//         scratch buffers.  atan2 is a branchless degree-11 minimax
//         polynomial (max error ~2e-7 rad — the parity budget against the
//         numpy mirror is ~6e-6 rad) that g++ auto-vectorizes; exact at
//         the axes (atan2(+-0, -1) = +-pi, atan2(0, 1) = 0), which the
//         sign-flip wrap edge below depends on.
//     stage B (scalar f64): wrapped first difference of the float32 phase
//         with identical edge semantics to ingest._phase_diff_np (a -pi
//         wrap of a positive jump maps to +pi; |d| < pi kept untouched),
//         written straight into the packed (chunk, channel, bin, frame)
//         output layout, accumulating per-track min/max over ALL frames
//         (including the leading `t % n_vec` trimmed ones -- the
//         reference normalizes before trimming).
//   final pass: in-place min-max -> [-1, 1] with the same float32 op
//         order as the numpy mirror (a -= mn; a *= f32(2/(mx-mn)); a -= 1).
//
// Build: g++ -O3 -march=native -fno-math-errno -shared -fPIC (see build.py).
// Python binding: ctypes (musicgan_tpu/native/__init__.py).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// Branchless atan2f: minimax atan(a) on [0,1] + quadrant fixups.
// Auto-vectorizes (no libm calls, no branches — ternaries become blends).
inline float fast_atan2(float y, float x) {
    const float ax = std::fabs(x), ay = std::fabs(y);
    const float mx = ax > ay ? ax : ay;
    const float mn = ax > ay ? ay : ax;
    const float a = mn / (mx > 0.0f ? mx : 1.0f);  // atan2(0,0) -> 0, not NaN
    const float s = a * a;
    float r = ((((-0.0117212f * s + 0.0526533f) * s - 0.1164329f) * s
                + 0.1935435f) * s - 0.3326235f) * s + 0.9999773f;
    r *= a;
    r = ay > ax ? 1.5707963267948966f - r : r;
    // signbit, not (x < 0): atan2(+-0, -0.0) = +-pi like IEEE/numpy
    r = std::signbit(x) ? 3.14159265358979323846f - r : r;
    return std::copysign(r, y);
}

}  // namespace

extern "C" {

// z:    (n_bins, T) complex64, row-major, interleaved re/im
// bark: (n_bins,) float32 per-bin magnitude weight
// out:  (n_chunks, 2, n_bins, n_vec) float32, n_chunks = (T-1)/n_vec
// Returns 0 on success, -1 on bad geometry, -2 on allocation failure.
int mg_magn_phase_pack(const float* z, int64_t n_bins, int64_t T,
                       const float* bark, int64_t n_vec, float* out) {
    const int64_t td = T - 1;            // frames after the first-difference
    if (td < n_vec || n_vec <= 0 || n_bins <= 0) return -1;
    const int64_t n_chunks = td / n_vec;
    const int64_t trim = td % n_vec;     // leading frames dropped after norm
    const double pi = 3.14159265358979323846;
    const double two_pi = 2.0 * pi;

    float* scratch = static_cast<float*>(std::malloc(2 * T * sizeof(float)));
    if (!scratch) return -2;
    float* mrow = scratch;       // |z| * bark
    float* phi = scratch + T;    // atan2(im, re)

    float m_min = INFINITY, m_max = -INFINITY;
    float p_min = INFINITY, p_max = -INFINITY;

    const int64_t chan_stride = n_bins * n_vec;       // one channel plane
    const int64_t chunk_stride = 2 * chan_stride;     // one chunk

    for (int64_t b = 0; b < n_bins; ++b) {
        const float* row = z + 2 * b * T;
        const float w = bark[b];

        // stage A: vectorized magnitude + phase for the whole row
        for (int64_t t = 0; t < T; ++t) {
            const float re = row[2 * t], im = row[2 * t + 1];
            mrow[t] = std::sqrt(re * re + im * im) * w;
            phi[t] = fast_atan2(im, re);
        }
        // magnitude min/max over t = 1..T-1 (col 0 is dropped by the diff)
        float bm_min = INFINITY, bm_max = -INFINITY;
        for (int64_t t = 1; t < T; ++t) {
            bm_min = mrow[t] < bm_min ? mrow[t] : bm_min;
            bm_max = mrow[t] > bm_max ? mrow[t] : bm_max;
        }
        if (bm_min < m_min) m_min = bm_min;
        if (bm_max > m_max) m_max = bm_max;

        // pack kept magnitude frames: contiguous n_vec-long runs per chunk
        float* magn_row = out + b * n_vec;                 // + c*chunk_stride
        for (int64_t c = 0; c < n_chunks; ++c) {
            std::memcpy(magn_row + c * chunk_stride,
                        mrow + 1 + trim + c * n_vec,
                        n_vec * sizeof(float));
        }

        // stage B: scalar f64 wrapped diff, packed + min/max on the fly
        float* phase_row = out + chan_stride + b * n_vec;  // channel 1
        for (int64_t t = 1; t < T; ++t) {
            const double d = (double)phi[t] - (double)phi[t - 1];
            float p;
            if (d < pi && d > -pi) {
                p = (float)d;
            } else {
                double dm = std::fmod(d + pi, two_pi);
                if (dm < 0.0) dm += two_pi;
                dm -= pi;
                if (dm == -pi && d > 0.0) dm = pi;
                p = (float)dm;
            }
            if (p < p_min) p_min = p;
            if (p > p_max) p_max = p;
            const int64_t k = (t - 1) - trim;  // index into kept frames
            if (k >= 0) {
                phase_row[(k / n_vec) * chunk_stride + (k % n_vec)] = p;
            }
        }
    }
    std::free(scratch);

    // final: normalize in place, float32 op order matching the numpy mirror
    const float m_scale = (float)(2.0 / (double)(m_max - m_min));
    const float p_scale = (float)(2.0 / (double)(p_max - p_min));
    for (int64_t c = 0; c < n_chunks; ++c) {
        float* mp = out + c * chunk_stride;
        for (int64_t j = 0; j < chan_stride; ++j) {
            mp[j] = (mp[j] - m_min) * m_scale - 1.0f;
        }
        float* pp = mp + chan_stride;
        for (int64_t j = 0; j < chan_stride; ++j) {
            pp[j] = (pp[j] - p_min) * p_scale - 1.0f;
        }
    }
    return 0;
}

}  // extern "C"
