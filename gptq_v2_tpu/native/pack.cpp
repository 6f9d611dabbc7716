// Native INT4 pack/unpack for the plane-per-group packed-weight layout
// (see ops/packing.py for the layout contract).
//
// The TPU compute path needs no native code (Pallas kernels compile via
// XLA); this is the *host-side* hot loop — packing a 70B model's weights
// (or re-sharding them for tensor parallelism, which unpacks + repacks
// per shard) pushes tens of GB through these transforms at load time.
// Single translation unit, C ABI, bound via ctypes; numpy remains the
// behavioral reference and fallback.
//
// Layout (pack): for block b of 8*g stored columns, nibble-plane i of the
// g packed words holds quantization group i of that block:
//   word[b*g + w][r] |= codes[r][b*8g + i*g + w] << 4*i
#include <cstdint>
#include <cstring>

extern "C" {

// codes: (R, C) row-major uint8 (values 0..15); C % (8*g) == 0
// out:   (C/8, R) row-major int32, zero-initialized by the caller
void pack_int4(const uint8_t* codes, int64_t R, int64_t C, int64_t g,
               int32_t* out) {
    const int64_t block = 8 * g;
    const int64_t n_blocks = C / block;
    const int64_t out_rows = C / 8;  // == n_blocks * g
    for (int64_t r = 0; r < R; ++r) {
        const uint8_t* row = codes + r * C;
        for (int64_t b = 0; b < n_blocks; ++b) {
            const uint8_t* blk = row + b * block;
            int32_t* out_blk = out + (b * g) * R + r;
            for (int64_t w = 0; w < g; ++w) {
                uint32_t word = 0;
                for (int i = 0; i < 8; ++i) {
                    word |= (uint32_t)(blk[i * g + w] & 0xF) << (4 * i);
                }
                out_blk[w * R] = (int32_t)word;
            }
        }
    }
}

// packed: (C/8, R) row-major int32; out: (R, C) row-major uint8
void unpack_int4(const int32_t* packed, int64_t R, int64_t C, int64_t g,
                 uint8_t* out) {
    const int64_t block = 8 * g;
    const int64_t n_blocks = C / block;
    for (int64_t r = 0; r < R; ++r) {
        uint8_t* row = out + r * C;
        for (int64_t b = 0; b < n_blocks; ++b) {
            const int32_t* in_blk = packed + (b * g) * R + r;
            uint8_t* blk = row + b * block;
            for (int64_t w = 0; w < g; ++w) {
                uint32_t word = (uint32_t)in_blk[w * R];
                for (int i = 0; i < 8; ++i) {
                    blk[i * g + w] = (uint8_t)((word >> (4 * i)) & 0xF);
                }
            }
        }
    }
}

}  // extern "C"
