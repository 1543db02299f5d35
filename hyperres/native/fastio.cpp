// hyperres native IO codec: threaded block DEFLATE + TIFF predictor loops.
//
// The reference delegates its raster encoding to GDAL's C++ core
// (DEFLATE-compressed tiled GeoTIFFs, e.g. tiles_helpers/utils.py:308-440,
// EMIT_data/emit_proj.py:248-276). hyperres owns its GeoTIFF codec in
// Python; this library provides the hot loops natively:
//   - hr_deflate_blocks / hr_inflate_blocks: independent raster blocks
//     (strips/tiles) compressed/decompressed across a thread pool,
//   - hr_predictor2_{encode,decode}_{u8,u16,u32}: horizontal differencing
//     over (rows, cols, samples) blocks.
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 fastio.cpp -o libhyperresio.so -lz -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

int worker_count(int requested) {
    if (requested > 0) return requested;
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? static_cast<int>(hw) : 4;
}

template <typename Fn>
void parallel_for(int n, int n_threads, Fn fn) {
    n_threads = worker_count(n_threads);
    if (n_threads <= 1 || n <= 1) {
        for (int i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int> next{0};
    std::vector<std::thread> pool;
    int spawn = std::min(n_threads, n);
    pool.reserve(spawn);
    for (int t = 0; t < spawn; ++t) {
        pool.emplace_back([&]() {
            while (true) {
                int i = next.fetch_add(1);
                if (i >= n) return;
                fn(i);
            }
        });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Compress n_blocks independent buffers. src is a contiguous arena with
// per-block offsets/sizes; dst likewise with per-block capacities.
// On success writes the compressed size of each block into dst_sizes and
// returns 0. A block whose output would overflow its capacity yields -2.
int hr_deflate_blocks(const uint8_t* src, const int64_t* src_offsets,
                      const int64_t* src_sizes, uint8_t* dst,
                      const int64_t* dst_offsets, const int64_t* dst_caps,
                      int64_t* dst_sizes, int n_blocks, int level,
                      int n_threads) {
    std::atomic<int> status{0};
    parallel_for(n_blocks, n_threads, [&](int i) {
        uLongf out_len = static_cast<uLongf>(dst_caps[i]);
        int rc = compress2(dst + dst_offsets[i], &out_len,
                           src + src_offsets[i],
                           static_cast<uLong>(src_sizes[i]), level);
        if (rc == Z_OK) {
            dst_sizes[i] = static_cast<int64_t>(out_len);
        } else {
            dst_sizes[i] = -1;
            status.store(rc == Z_BUF_ERROR ? -2 : -1);
        }
    });
    return status.load();
}

int hr_inflate_blocks(const uint8_t* src, const int64_t* src_offsets,
                      const int64_t* src_sizes, uint8_t* dst,
                      const int64_t* dst_offsets, const int64_t* dst_caps,
                      int64_t* dst_sizes, int n_blocks, int n_threads) {
    std::atomic<int> status{0};
    parallel_for(n_blocks, n_threads, [&](int i) {
        uLongf out_len = static_cast<uLongf>(dst_caps[i]);
        int rc = uncompress(dst + dst_offsets[i], &out_len,
                            src + src_offsets[i],
                            static_cast<uLong>(src_sizes[i]));
        if (rc == Z_OK) {
            dst_sizes[i] = static_cast<int64_t>(out_len);
        } else {
            dst_sizes[i] = -1;
            status.store(rc == Z_BUF_ERROR ? -2 : -1);
        }
    });
    return status.load();
}

// TIFF predictor 2 (horizontal differencing), in place over
// (rows, cols, samples); one block. Encode: right-to-left difference.
#define HR_PREDICTOR(NAME, T)                                               \
    void hr_predictor2_encode_##NAME(T* data, int64_t rows, int64_t cols,   \
                                     int64_t samples, int n_threads) {      \
        parallel_for(static_cast<int>(rows), n_threads, [&](int r) {        \
            T* row = data + static_cast<int64_t>(r) * cols * samples;       \
            for (int64_t c = cols - 1; c >= 1; --c)                         \
                for (int64_t s = 0; s < samples; ++s)                       \
                    row[c * samples + s] = static_cast<T>(                  \
                        row[c * samples + s] - row[(c - 1) * samples + s]); \
        });                                                                 \
    }                                                                       \
    void hr_predictor2_decode_##NAME(T* data, int64_t rows, int64_t cols,   \
                                     int64_t samples, int n_threads) {      \
        parallel_for(static_cast<int>(rows), n_threads, [&](int r) {        \
            T* row = data + static_cast<int64_t>(r) * cols * samples;       \
            for (int64_t c = 1; c < cols; ++c)                              \
                for (int64_t s = 0; s < samples; ++s)                       \
                    row[c * samples + s] = static_cast<T>(                  \
                        row[c * samples + s] + row[(c - 1) * samples + s]); \
        });                                                                 \
    }

HR_PREDICTOR(u8, uint8_t)
HR_PREDICTOR(u16, uint16_t)
HR_PREDICTOR(u32, uint32_t)

#undef HR_PREDICTOR

int hr_version() { return 1; }

}  // extern "C"
