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

#include <cstdint>
#include <cstring>
#include <cstddef>

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

}  // extern "C"
