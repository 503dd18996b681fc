// Host-side packing runtime for kvquant_tpu.
//
// The TPU compute path is Pallas/XLA; this C++ library is the HOST side of
// the cache format: converting token-major quantization codes to/from the
// bit-plane group layout (ops/packing.py documents the layout contract)
// and encoding outlier words, at memcpy-like speed without a JAX round
// trip. Used for cache import/export, artifact tooling, and as an
// independent implementation the Python/JAX layout is tested against.
//
// Layout contract (must match ops/packing.py):
//   token t lives in group g = t/128, word row g*4 + (t%128)%4,
//   bit (t%128)/4; planes shape (..., bits, T/32, D), codes (..., T, D).
//
// Outlier words: fp32 bit pattern = (residual bits & ~0x1FF) | (head_in_group<<7 | dim).

#include <cstdint>
#include <cstring>

extern "C" {

// codes (lead, T, D) int32 -> planes (lead, bits, T/32, D) int32
void kvq_pack_codes(const int32_t* codes, int32_t* planes,
                    int64_t lead, int64_t T, int64_t D, int32_t bits) {
    const int64_t TW = T / 32;
    const int64_t plane_stride = TW * D;
    const int64_t out_block = (int64_t)bits * plane_stride;
    std::memset(planes, 0, sizeof(int32_t) * lead * out_block);
    for (int64_t l = 0; l < lead; ++l) {
        const int32_t* src = codes + l * T * D;
        int32_t* dst = planes + l * out_block;
        for (int64_t t = 0; t < T; ++t) {
            const int64_t g = t >> 7;           // t / 128
            const int64_t r = t & 127;          // t % 128
            const int64_t w = g * 4 + (r & 3);  // word row
            const int32_t j = (int32_t)(r >> 2);  // bit position
            const int32_t* row = src + t * D;
            for (int32_t b = 0; b < bits; ++b) {
                int32_t* prow = dst + b * plane_stride + w * D;
                for (int64_t d = 0; d < D; ++d) {
                    prow[d] |= (((row[d] >> b) & 1) << j);
                }
            }
        }
    }
}

// planes (lead, bits, T/32, D) int32 -> codes (lead, T, D) int32
void kvq_unpack_codes(const int32_t* planes, int32_t* codes,
                      int64_t lead, int64_t T, int64_t D, int32_t bits) {
    const int64_t TW = T / 32;
    const int64_t plane_stride = TW * D;
    const int64_t in_block = (int64_t)bits * plane_stride;
    for (int64_t l = 0; l < lead; ++l) {
        const int32_t* src = planes + l * in_block;
        int32_t* dst = codes + l * T * D;
        for (int64_t t = 0; t < T; ++t) {
            const int64_t g = t >> 7;
            const int64_t r = t & 127;
            const int64_t w = g * 4 + (r & 3);
            const int32_t j = (int32_t)(r >> 2);
            int32_t* row = dst + t * D;
            for (int64_t d = 0; d < D; ++d) row[d] = 0;
            for (int32_t b = 0; b < bits; ++b) {
                const int32_t* prow = src + b * plane_stride + w * D;
                for (int64_t d = 0; d < D; ++d) {
                    row[d] |= (((prow[d] >> j) & 1) << b);
                }
            }
        }
    }
}

// vals fp32 + idx int32 -> encoded fp32 words (n elements)
void kvq_encode_outliers(const float* vals, const int32_t* idx,
                         float* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t bits_;
        std::memcpy(&bits_, &vals[i], 4);
        bits_ = (bits_ & 0xFFFFFE00u) | ((uint32_t)idx[i] & 0x1FFu);
        std::memcpy(&out[i], &bits_, 4);
    }
}

// encoded fp32 words -> vals fp32 + idx int32
void kvq_decode_outliers(const float* words, float* vals, int32_t* idx,
                         int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t bits_;
        std::memcpy(&bits_, &words[i], 4);
        idx[i] = (int32_t)(bits_ & 0x1FFu);
        const uint32_t vb = bits_ & 0xFFFFFE00u;
        std::memcpy(&vals[i], &vb, 4);
    }
}

}  // extern "C"
