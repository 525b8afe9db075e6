// dcsynth — native data-synthesis core for deepcharuco_tpu.
//
// The training-input pipeline is host-bound (SURVEY §2.4: the reference's
// real throughput machinery is CPU augmentation in DataLoader workers). The
// Python/cv2 path makes ~8 full-frame passes per sample (paste, jitter,
// shift, noise, 2 blurs, multiplicative, brightness). This library fuses the
// non-convolutional photometric stack + board compositing into ONE pass per
// pixel, generates procedural backgrounds, and builds the detector label
// maps — all behind a C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC dcsynth.cpp -o libdcsynth.so
//
// RNG: per-call splitmix64/xoshiro256++ seeded by the caller, so the Python
// side controls determinism exactly as with np.random.Generator.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

// ----------------------------------------------------------------- RNG ----
struct Rng {
    uint64_t s[4];
    explicit Rng(uint64_t seed) {
        // splitmix64 expansion of the seed
        uint64_t z = seed;
        for (int i = 0; i < 4; i++) {
            z += 0x9e3779b97f4a7c15ULL;
            uint64_t t = z;
            t = (t ^ (t >> 30)) * 0xbf58476d1ce4e5b9ULL;
            t = (t ^ (t >> 27)) * 0x94d049bb133111ebULL;
            s[i] = t ^ (t >> 31);
        }
    }
    static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
    uint64_t next() {
        uint64_t r = rotl(s[0] + s[3], 23) + s[0];
        uint64_t t = s[1] << 17;
        s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3];
        s[2] ^= t; s[3] = rotl(s[3], 45);
        return r;
    }
    double uniform() { return (next() >> 11) * 0x1.0p-53; }
    double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
    // Box–Muller
    double normal(double mu, double sigma) {
        double u1 = uniform(), u2 = uniform();
        if (u1 < 1e-300) u1 = 1e-300;
        return mu + sigma * std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
    }
    int64_t randint(int64_t lo, int64_t hi) {  // [lo, hi)
        return lo + (int64_t)(uniform() * (double)(hi - lo));
    }
    // Cheap zero-mean noise with std ~sigma (triangular distribution): one
    // next() call, no transcendental. Right fidelity for image augmentation.
    float fast_noise(float sigma) {
        const uint64_t r = next();
        const float u1 = (float)(uint32_t)r * (1.0f / 4294967296.0f);
        const float u2 = (float)(uint32_t)(r >> 32) * (1.0f / 4294967296.0f);
        return (u1 + u2 - 1.0f) * (sigma * 2.449489743f);  // var((U+U-1)) = 1/6
    }
};

inline uint8_t clamp_u8(float v) {
    return (uint8_t)std::min(255.0f, std::max(0.0f, v));
}

}  // namespace

extern "C" {

// --------------------------------------------------- procedural background
// Gradient base + soft blobs + broadband noise, one allocation-free pass.
// out: H*W*3 uint8 (BGR).
void dc_procedural_bg(uint64_t seed, int h, int w, uint8_t* out) {
    Rng rng(seed);
    float c00[3], c01[3], c10[3], c11[3];
    for (int k = 0; k < 3; k++) {
        c00[k] = (float)rng.uniform(0, 255);
        c01[k] = (float)rng.uniform(0, 255);
        c10[k] = (float)rng.uniform(0, 255);
        c11[k] = (float)rng.uniform(0, 255);
    }
    const int n_blobs = (int)rng.randint(2, 8);
    float bx[8], by[8], br2[8], bc[8][3], ba[8];
    for (int i = 0; i < n_blobs; i++) {
        bx[i] = (float)rng.randint(0, w);
        by[i] = (float)rng.randint(0, h);
        float r = (float)rng.randint(h / 8, h / 2);
        br2[i] = r * r;
        for (int k = 0; k < 3; k++) bc[i][k] = (float)rng.uniform(0, 255);
        ba[i] = (float)rng.uniform(0.2, 0.7);
    }
    const float sigma = (float)rng.uniform(2.0, 12.0);

    for (int y = 0; y < h; y++) {
        const float fy = (float)y / (float)(h - 1);
        for (int x = 0; x < w; x++) {
            const float fx = (float)x / (float)(w - 1);
            uint8_t* px = out + (y * w + x) * 3;
            for (int k = 0; k < 3; k++) {
                float v = (1 - fy) * ((1 - fx) * c00[k] + fx * c01[k])
                        + fy * ((1 - fx) * c10[k] + fx * c11[k]);
                for (int i = 0; i < n_blobs; i++) {
                    float dx = (float)x - bx[i], dy = (float)y - by[i];
                    if (dx * dx + dy * dy < br2[i])
                        v = v * (1 - ba[i]) + bc[i][k] * ba[i];
                }
                v += rng.fast_noise(sigma);
                px[k] = clamp_u8(v);
            }
        }
    }
}

// ------------------------------------------- fused composite + photometric
// Paste board over background through mask, then apply the photometric stack
// (contrast/saturation jitter, rgb shift, gaussian noise, multiplicative
// noise, brightness) in a single pass. Blurs (neighborhood ops) are applied
// separately by dc_box_blur when enabled.
//
// board, bg: H*W*3 uint8; mask: H*W uint8 (255 = board pixel). Result into
// `bg` (in place). Probabilities follow transformations.py:104-117.
void dc_composite_photometric(uint64_t seed, int h, int w,
                              const uint8_t* board, const uint8_t* mask,
                              uint8_t* bg, int is_negative) {
    Rng rng(seed);
    // Draw all the per-frame parameters first (one RNG stream).
    const bool do_jitter = rng.uniform() < 0.5;
    const float contrast = do_jitter ? (float)rng.uniform(0.8, 1.2) : 1.0f;
    const float saturation = do_jitter ? (float)rng.uniform(0.8, 1.2) : 1.0f;
    const bool do_shift = rng.uniform() < 0.5;
    float shift[3] = {0, 0, 0};
    if (do_shift)
        for (int k = 0; k < 3; k++) shift[k] = (float)rng.randint(-20, 21);
    const bool do_noise = rng.uniform() < 0.5;
    const float noise_sigma = do_noise ? std::sqrt((float)rng.uniform(10.0, 50.0)) : 0.0f;
    const bool do_mult = rng.uniform() < 0.5;
    const float mult = do_mult ? (float)rng.uniform(0.95, 1.05) : 1.0f;
    const bool do_bright = rng.uniform() < 0.5;
    const float bright = do_bright ? (float)(rng.uniform(-0.8, 0.35) * 255.0) : 0.0f;

    // mean for contrast pivot: cheap two-pass would re-read; use 128 pivot
    // (equivalent distribution-wise for augmentation purposes).
    const float pivot = 128.0f;

    const int n = h * w;
    for (int i = 0; i < n; i++) {
        uint8_t* px = bg + i * 3;
        const uint8_t* bpx = board + i * 3;
        float v[3];
        const bool use_board = !is_negative && mask[i];
        for (int k = 0; k < 3; k++)
            v[k] = (float)(use_board ? bpx[k] : px[k]);

        // saturation about the luma, contrast about the pivot
        float luma = 0.114f * v[0] + 0.587f * v[1] + 0.299f * v[2];
        for (int k = 0; k < 3; k++) {
            float x = luma + (v[k] - luma) * saturation;
            x = (x - pivot) * contrast + pivot;
            x += shift[k];
            if (noise_sigma > 0) x += rng.fast_noise(noise_sigma);
            x *= mult;
            x += bright;
            px[k] = clamp_u8(x);
        }
    }
}

// ------------------------------------------------------------- box blur ---
// Separable box blur (radius r), an O(n) stand-in for the gaussian/motion
// blur stage; applied with probability by the caller. In-place on H*W*3.
void dc_box_blur(int h, int w, int r, uint8_t* img, uint8_t* scratch) {
    if (r <= 0) return;
    const int c = 3;
    const float inv = 1.0f / (2 * r + 1);
    // horizontal into scratch
    for (int y = 0; y < h; y++) {
        for (int k = 0; k < c; k++) {
            float acc = 0;
            for (int x = -r; x <= r; x++) {
                int xi = std::min(w - 1, std::max(0, x));
                acc += img[(y * w + xi) * c + k];
            }
            for (int x = 0; x < w; x++) {
                scratch[(y * w + x) * c + k] = clamp_u8(acc * inv);
                int xo = std::max(0, x - r);
                int xi = std::min(w - 1, x + r + 1);
                acc += img[(y * w + xi) * c + k] - img[(y * w + xo) * c + k];
            }
        }
    }
    // vertical back into img
    for (int x = 0; x < w; x++) {
        for (int k = 0; k < c; k++) {
            float acc = 0;
            for (int y = -r; y <= r; y++) {
                int yi = std::min(h - 1, std::max(0, y));
                acc += scratch[(yi * w + x) * c + k];
            }
            for (int y = 0; y < h; y++) {
                img[(y * w + x) * c + k] = clamp_u8(acc * inv);
                int yo = std::max(0, y - r);
                int yi = std::min(h - 1, y + r + 1);
                acc += scratch[(yi * w + x) * c + k] - scratch[(yo * w + x) * c + k];
            }
        }
    }
}


}  // extern "C"
