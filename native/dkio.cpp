// dkio: native I/O helpers for checkpoint loading.
//
// Role: the cold-start hot path of the framework (reference analogue: MLX's
// C++ mx.load / safetensors reader, reference model_io.py:725 `mx.load`).
// Python mmaps the checkpoint and builds zero-copy numpy views; this library
// supplies the pieces that need native code:
//   - dk_prefetch: madvise(WILLNEED) + optional eager readahead so the page
//     cache is warm before the mapper walks tensors (sequential fault-in of
//     a 24 GB file through 4 KiB faults is the slow path it replaces).
//   - dk_f16_to_f32 / dk_bf16_to_f32 / dk_f32_to_bf16: bulk dtype
//     conversions, written so gcc auto-vectorizes them; used when remapping
//     fp16 HF checkpoints to TPU dtypes.
//
// Built with: g++ -O3 -march=native -shared -fPIC dkio.cpp -o libdkio.so
// (see diffusionkit_tpu/native.py, which builds on demand and falls back to
// pure numpy when no toolchain is present).

//   - dk_quantize_int4: multi-threaded affine group quantization of an
//     (in, out) float kernel to the packed int4 execution layout
//     (ops/quantized.py schema) — the host-side cost of --quantize-mmdit on
//     a 12B model is minutes single-threaded in numpy, seconds here.

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <sys/mman.h>
#include <unistd.h>
#endif

extern "C" {

// Advise the kernel we will need [base, base+len) soon and touch one byte
// per page to trigger readahead. Returns 0 on success.
int dk_prefetch(const void* base, size_t len, int eager) {
#if defined(__unix__) || defined(__APPLE__)
  int rc = madvise(const_cast<void*>(base), len, MADV_WILLNEED);
  if (eager) {
    volatile uint8_t sink = 0;
    const uint8_t* p = static_cast<const uint8_t*>(base);
    const size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
    for (size_t off = 0; off < len; off += page) sink ^= p[off];
    (void)sink;
  }
  return rc;
#else
  (void)base; (void)len; (void)eager;
  return -1;
#endif
}

// IEEE half -> float. Branch-free enough for auto-vectorization.
static inline float half_to_float(uint16_t h) {
  uint32_t sign = (static_cast<uint32_t>(h) & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t mant = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while ((mant & 0x400u) == 0) { mant <<= 1; ++shift; }
      mant &= 0x3FFu;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
    }
  } else if (exp == 0x1F) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf / nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

void dk_f16_to_f32(const uint16_t* src, float* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) dst[i] = half_to_float(src[i]);
}

void dk_bf16_to_f32(const uint16_t* src, float* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    uint32_t bits = static_cast<uint32_t>(src[i]) << 16;
    std::memcpy(&dst[i], &bits, sizeof(float));
  }
}

// Round-to-nearest-even float -> bfloat16.
void dk_f32_to_bf16(const float* src, uint16_t* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    uint32_t bits;
    std::memcpy(&bits, &src[i], sizeof(float));
    uint32_t lsb = (bits >> 16) & 1u;
    bits += 0x7FFFu + lsb;
    dst[i] = static_cast<uint16_t>(bits >> 16);
  }
}

// Affine group quantization (MLX-compatible: w = scale*q + zero, q in
// [0, 15]) of an (in_dim, out_dim) row-major float kernel, groups of
// `group` along in_dim. Outputs the execution layout of ops/quantized.py:
//   packed (in_dim/8, out_dim) uint32 — nibble j of word r at rows r*8+j
//   scales/zeros (in_dim/group, out_dim) float32
// Parallelized over output-column stripes (each thread touches disjoint
// output columns; reads are shared and read-only).
void dk_quantize_int4(const float* w, int64_t in_dim, int64_t out_dim,
                      int64_t group, uint32_t* packed, float* scales,
                      float* zeros) {
  const int64_t n_groups = in_dim / group;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  const int64_t stripe = std::max<int64_t>(64, out_dim / hw);
  std::vector<std::thread> threads;
  for (int64_t c0 = 0; c0 < out_dim; c0 += stripe) {
    const int64_t c1 = std::min(out_dim, c0 + stripe);
    threads.emplace_back([=]() {
      std::vector<float> scale_row(static_cast<size_t>(c1 - c0));
      std::vector<float> zero_row(static_cast<size_t>(c1 - c0));
      for (int64_t g = 0; g < n_groups; ++g) {
        const int64_t r0 = g * group;
        // min/max per column over the group's rows
        for (int64_t c = c0; c < c1; ++c) {
          scale_row[c - c0] = w[r0 * out_dim + c];  // reuse as running max
          zero_row[c - c0] = w[r0 * out_dim + c];   // running min
        }
        for (int64_t r = r0 + 1; r < r0 + group; ++r) {
          const float* row = w + r * out_dim;
          for (int64_t c = c0; c < c1; ++c) {
            const float v = row[c];
            scale_row[c - c0] = std::max(scale_row[c - c0], v);
            zero_row[c - c0] = std::min(zero_row[c - c0], v);
          }
        }
        for (int64_t c = c0; c < c1; ++c) {
          const float s =
              std::max((scale_row[c - c0] - zero_row[c - c0]) / 15.0f, 1e-8f);
          scales[g * out_dim + c] = s;
          zeros[g * out_dim + c] = zero_row[c - c0];
          scale_row[c - c0] = s;  // reuse as the divisor (division, not
                                  // reciprocal: bit-matches the numpy path)
        }
        // quantize + pack 8 rows per uint32 word
        for (int64_t r = r0; r < r0 + group; r += 8) {
          uint32_t* out_word = packed + (r / 8) * out_dim;
          for (int64_t c = c0; c < c1; ++c) out_word[c] = 0;
          for (int64_t j = 0; j < 8; ++j) {
            const float* row = w + (r + j) * out_dim;
            const uint32_t shift = static_cast<uint32_t>(4 * j);
            for (int64_t c = c0; c < c1; ++c) {
              float q = std::nearbyint((row[c] - zeros[g * out_dim + c]) /
                                       scale_row[c - c0]);
              q = std::min(15.0f, std::max(0.0f, q));
              out_word[c] |= static_cast<uint32_t>(q) << shift;
            }
          }
        }
      }
    });
  }
  for (auto& t : threads) t.join();
}

// IEEE float -> half, round-to-nearest-even (bit-matches numpy's
// astype(float16)). Used to round the refined affine grid onto the f16
// storage dtype BEFORE the final requantize, so q is optimal for the grid
// actually stored.
static inline uint16_t float_to_half(float f) {
  uint32_t x;
  std::memcpy(&x, &f, sizeof(x));
  const uint32_t sign = (x >> 16) & 0x8000u;
  uint32_t mant = x & 0x7FFFFFu;
  const uint32_t exp_f = (x >> 23) & 0xFFu;
  if (exp_f == 0xFFu) return static_cast<uint16_t>(sign | 0x7C00u | (mant ? 0x200u : 0));
  int32_t exp = static_cast<int32_t>(exp_f) - 127 + 15;
  if (exp >= 31) return static_cast<uint16_t>(sign | 0x7C00u);
  if (exp <= 0) {
    if (exp < -10) return static_cast<uint16_t>(sign);
    mant |= 0x800000u;
    const uint32_t shift = static_cast<uint32_t>(14 - exp);
    uint32_t h = mant >> shift;
    const uint32_t rem = mant & ((1u << shift) - 1u);
    const uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (h & 1u))) ++h;
    return static_cast<uint16_t>(sign | h);
  }
  uint32_t h = sign | (static_cast<uint32_t>(exp) << 10) | (mant >> 13);
  const uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (h & 1u))) ++h;  // carry may bump exp — correct
  return static_cast<uint16_t>(h);
}

static inline float half_round(float f) { return half_to_float(float_to_half(f)); }

// Refined affine int4 group quantization: min/max init + `iters` rounds of
// alternating least squares (refit (scale, zero) to the current codes by
// per-column linear regression, then requantize), tracking the best grid by
// group MSE. Data-free "scale search" — on Gaussian weights it recovers
// ~0.7 dB of weight SNR over min/max at any group size (see
// ops/quantized.quantize_kernel_host for the measured table). With
// `f16_grid` nonzero the winning (scale, zero) are rounded to IEEE half
// (the storage dtype) before the final requantize+pack, so the codes are
// optimal for the grid actually stored. Same parallelization as
// dk_quantize_int4 (disjoint output-column stripes).
void dk_quantize_int4_als(const float* w, int64_t in_dim, int64_t out_dim,
                          int64_t group, int iters, int f16_grid,
                          uint32_t* packed, float* scales, float* zeros,
                          float* wscale /* nullable: per-column
                          max|dequant|/127, the w4a8 int8-grid scale —
                          computed here from the exact final codes so
                          loaders skip a second full nibble-unpack pass */) {
  const int64_t n_groups = in_dim / group;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  const int64_t stripe = std::max<int64_t>(64, out_dim / hw);
  std::vector<std::thread> threads;
  for (int64_t c0 = 0; c0 < out_dim; c0 += stripe) {
    const int64_t c1 = std::min(out_dim, c0 + stripe);
    threads.emplace_back([=]() {
      const size_t nc = static_cast<size_t>(c1 - c0);
      std::vector<float> s(nc), z(nc), best_s(nc), best_z(nc), best_e(nc);
      std::vector<float> sw(nc), sq(nc), sqq(nc), swq(nc), err(nc);
      std::vector<float> amax(nc, 0.0f);
      const float n = static_cast<float>(group);
      for (int64_t g = 0; g < n_groups; ++g) {
        const int64_t r0 = g * group;
        // min/max + sum(w) per column
        for (int64_t c = c0; c < c1; ++c) {
          const float v = w[r0 * out_dim + c];
          s[c - c0] = v;   // running max
          z[c - c0] = v;   // running min
          sw[c - c0] = v;
        }
        for (int64_t r = r0 + 1; r < r0 + group; ++r) {
          const float* row = w + r * out_dim;
          for (int64_t c = c0; c < c1; ++c) {
            const float v = row[c];
            s[c - c0] = std::max(s[c - c0], v);
            z[c - c0] = std::min(z[c - c0], v);
            sw[c - c0] += v;
          }
        }
        for (size_t i = 0; i < nc; ++i) {
          s[i] = std::max((s[i] - z[i]) / 15.0f, 1e-8f);
          best_e[i] = 3.4e38f;
        }
        // iters x (evaluate current grid, keep best, refit)
        for (int it = 0; it <= iters; ++it) {
          std::fill(sq.begin(), sq.end(), 0.0f);
          std::fill(sqq.begin(), sqq.end(), 0.0f);
          std::fill(swq.begin(), swq.end(), 0.0f);
          std::fill(err.begin(), err.end(), 0.0f);
          for (int64_t r = r0; r < r0 + group; ++r) {
            const float* row = w + r * out_dim;
            for (int64_t c = c0; c < c1; ++c) {
              const size_t i = static_cast<size_t>(c - c0);
              float q = std::nearbyint((row[c] - z[i]) / s[i]);
              q = std::min(15.0f, std::max(0.0f, q));
              const float d = s[i] * q + z[i] - row[c];
              err[i] += d * d;
              sq[i] += q;
              sqq[i] += q * q;
              swq[i] += row[c] * q;
            }
          }
          for (size_t i = 0; i < nc; ++i) {
            if (err[i] < best_e[i]) {
              best_e[i] = err[i];
              best_s[i] = s[i];
              best_z[i] = z[i];
            }
            if (it == iters) continue;
            const float denom = n * sqq[i] - sq[i] * sq[i];
            if (denom > 1e-10f) {
              const float s_new = (n * swq[i] - sq[i] * sw[i]) / denom;
              if (s_new > 1e-8f) {
                s[i] = s_new;
                z[i] = (sw[i] - s_new * sq[i]) / n;
              }
            }
          }
        }
        for (size_t i = 0; i < nc; ++i) {
          float bs = best_s[i], bz = best_z[i];
          if (f16_grid) {
            // round onto the storage grid; floor keeps 1/s finite after the
            // half rounding (f16 subnormals reach 6e-8)
            bs = std::max(half_round(bs), 6.1e-8f);
            bz = half_round(bz);
          }
          scales[g * out_dim + c0 + i] = bs;
          zeros[g * out_dim + c0 + i] = bz;
          s[i] = bs;  // reuse as the final quantization grid
          z[i] = bz;
        }
        for (int64_t r = r0; r < r0 + group; r += 8) {
          uint32_t* out_word = packed + (r / 8) * out_dim;
          for (int64_t c = c0; c < c1; ++c) out_word[c] = 0;
          for (int64_t j = 0; j < 8; ++j) {
            const float* row = w + (r + j) * out_dim;
            const uint32_t shift = static_cast<uint32_t>(4 * j);
            for (int64_t c = c0; c < c1; ++c) {
              const size_t i = static_cast<size_t>(c - c0);
              float q = std::nearbyint((row[c] - z[i]) / s[i]);
              q = std::min(15.0f, std::max(0.0f, q));
              out_word[c] |= static_cast<uint32_t>(q) << shift;
              if (wscale) {
                amax[i] = std::max(amax[i], std::fabs(s[i] * q + z[i]));
              }
            }
          }
        }
      }
      if (wscale) {
        for (size_t i = 0; i < nc; ++i)
          wscale[c0 + static_cast<int64_t>(i)] =
              std::max(amax[i], 1e-8f) / 127.0f;
      }
    });
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
