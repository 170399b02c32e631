// Native data-pipeline engine for laplace_inducing_points_tpu.
//
// The input pipeline is host-side work that competes with dispatch on the
// single host core: epoch shuffles, batch gathers out of the in-memory
// dataset, and CIFAR train-time augmentation (RandomCrop(pad=4) + HFlip —
// reference behavior: /root/reference/src/scaledata.py:34-49, implemented
// there as per-image torchvision transforms). Here they are tight C loops
// over contiguous float32 buffers, driven through ctypes from
// laplace_inducing_points_tpu/data/native.py with a pure-numpy fallback.
//
// Determinism: all randomness comes from an explicit splitmix64 seed so
// Python and C++ runs are reproducible (not required to match numpy's RNG).

#include <cstdint>
#include <cstring>

extern "C" {

// --- RNG -------------------------------------------------------------------
static inline uint64_t splitmix64(uint64_t& state) {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

// Fisher-Yates shuffle of [0, n) into out.
void lip_shuffle_indices(int64_t* out, int64_t n, uint64_t seed) {
    for (int64_t i = 0; i < n; ++i) out[i] = i;
    uint64_t s = seed;
    for (int64_t i = n - 1; i > 0; --i) {
        int64_t j = (int64_t)(splitmix64(s) % (uint64_t)(i + 1));
        int64_t t = out[i];
        out[i] = out[j];
        out[j] = t;
    }
}

// Gather rows: dst[b] = src[idx[b]] for items of item_size floats.
void lip_gather_f32(const float* src, const int64_t* idx, float* dst,
                    int64_t batch, int64_t item_size) {
    for (int64_t b = 0; b < batch; ++b) {
        std::memcpy(dst + b * item_size, src + idx[b] * item_size,
                    (size_t)item_size * sizeof(float));
    }
}

void lip_gather_i32(const int32_t* src, const int64_t* idx, int32_t* dst,
                    int64_t batch) {
    for (int64_t b = 0; b < batch; ++b) dst[b] = src[idx[b]];
}

// Random-crop + horizontal-flip batch assembly.
//   src: (n, H+2p, W+2p, C) zero-padded images
//   dst: (batch, H, W, C)
// Per item: crop offset dy, dx ~ U[0, 2p], flip with prob 1/2.
void lip_crop_flip_f32(const float* src, const int64_t* idx, float* dst,
                       int64_t batch, int64_t H, int64_t W, int64_t C,
                       int64_t pad, uint64_t seed) {
    const int64_t Hp = H + 2 * pad;
    const int64_t Wp = W + 2 * pad;
    const int64_t src_item = Hp * Wp * C;
    const int64_t dst_item = H * W * C;
    uint64_t s = seed;
    for (int64_t b = 0; b < batch; ++b) {
        const uint64_t r = splitmix64(s);
        const int64_t dy = (int64_t)(r % (uint64_t)(2 * pad + 1));
        const int64_t dx = (int64_t)((r >> 16) % (uint64_t)(2 * pad + 1));
        const bool flip = ((r >> 32) & 1ULL) != 0;
        const float* img = src + idx[b] * src_item;
        float* out = dst + b * dst_item;
        for (int64_t y = 0; y < H; ++y) {
            const float* row = img + ((y + dy) * Wp + dx) * C;
            float* orow = out + y * W * C;
            if (!flip) {
                std::memcpy(orow, row, (size_t)(W * C) * sizeof(float));
            } else {
                for (int64_t x = 0; x < W; ++x) {
                    const float* px = row + (W - 1 - x) * C;
                    float* opx = orow + x * C;
                    for (int64_t c = 0; c < C; ++c) opx[c] = px[c];
                }
            }
        }
    }
}

// Normalize in place: (x - mean[c]) / std[c] over (n, H, W, C).
void lip_normalize_f32(float* data, int64_t n, int64_t hw, int64_t C,
                       const float* mean, const float* stddev) {
    for (int64_t i = 0; i < n * hw; ++i) {
        float* px = data + i * C;
        for (int64_t c = 0; c < C; ++c) px[c] = (px[c] - mean[c]) / stddev[c];
    }
}

}  // extern "C"
