// Native host-side runtime kernels for theoremsearch_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// hot HOST loops around it — the work the reference delegates to
// Postgres/pgvector C code and PyTorch internals:
//   - bulk int8 quantization + L2 normalization during index builds
//     (multi-threaded, streaming over row blocks),
//   - k-way top-k merge of per-shard candidate lists (serving fan-in on
//     the host when results arrive from multiple processes/hosts),
//   - LaTeX comment stripping (the ingest pipeline's hottest scan).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   ->  libtheoremsearch_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_rows(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t workers = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, n));
    if (workers == 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + workers - 1) / workers;
    for (int64_t w = 0; w < workers; ++w) {
        int64_t lo = w * chunk;
        int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([=, &fn] { fn(lo, hi); });
    }
    for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Row-wise L2 normalization in place. x: (n, d) float32.
void ts_l2_normalize(float* x, int64_t n, int64_t d) {
    parallel_rows(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            float* row = x + i * d;
            double acc = 0.0;
            for (int64_t j = 0; j < d; ++j) acc += (double)row[j] * row[j];
            float inv = acc > 1e-24 ? (float)(1.0 / std::sqrt(acc)) : 0.0f;
            for (int64_t j = 0; j < d; ++j) row[j] *= inv;
        }
    });
}

// Symmetric per-row int8 quantization. x: (n, d) f32 -> codes (n, d) i8,
// scales (n,) f32 with scale = maxabs/127 (1.0 for all-zero rows).
void ts_quantize_int8(const float* x, int64_t n, int64_t d, int8_t* codes, float* scales) {
    parallel_rows(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const float* row = x + i * d;
            float m = 0.0f;
            for (int64_t j = 0; j < d; ++j) m = std::max(m, std::fabs(row[j]));
            float scale = m > 0.0f ? m / 127.0f : 1.0f;
            scales[i] = scale;
            int8_t* out = codes + i * d;
            for (int64_t j = 0; j < d; ++j) {
                // divide (not multiply by 1/scale): bit-parity with the
                // numpy fallback's np.rint(x/scale) at .5 boundaries
                float v = std::nearbyint(row[j] / scale);
                v = std::max(-127.0f, std::min(127.0f, v));
                out[j] = (int8_t)v;
            }
        }
    });
}

// Global absolute max over (n, d) f32 (threaded reduction) — pass 1 of
// global-scale quantization.
float ts_absmax(const float* x, int64_t n, int64_t d) {
    if (n <= 0 || d <= 0) return 0.0f;   // empty input: chunk below would
                                         // be 0 and lo/chunk would SIGFPE
    unsigned hw = std::thread::hardware_concurrency();
    int64_t workers = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, n));
    int64_t chunk = std::max<int64_t>(1, (n + workers - 1) / workers);
    std::vector<float> part(workers, 0.0f);
    parallel_rows(n, [&](int64_t lo, int64_t hi) {
        float m = 0.0f;
        const float* p = x + lo * d;
        const float* end = x + hi * d;
        for (; p < end; ++p) m = std::max(m, std::fabs(*p));
        // one exclusive slot per worker range (parallel_rows hands each
        // worker a single [w*chunk, ...) range); the clamp only guards
        // indexing. If parallel_rows ever moves to finer-grained chunks,
        // slots would be shared and this needs an atomic max instead.
        int64_t slot = std::min<int64_t>(workers - 1, lo / chunk);
        part[slot] = std::max(part[slot], m);
    });
    float m = 0.0f;
    for (float v : part) m = std::max(m, v);
    return m;
}

// Symmetric GLOBAL-scale int8 quantization: codes = clip(round(x/scale)).
// The scan kernel's int32 speed path needs one corpus-wide scale
// (kernels/mips.py fused_mips_topk_g); numpy's round/clip/astype chain
// allocates three full-size f32 temporaries (~12 GB at 4M x 1024) and
// was the warm-rebuild hotspot — this streams row blocks in threads.
void ts_quantize_global_int8(const float* x, int64_t n, int64_t d, float scale,
                             int8_t* codes) {
    // divide, not multiply-by-reciprocal: bit-parity with the numpy
    // fallback's np.rint(x/scale) at .5 boundaries
    const float s = scale > 0.0f ? scale : 1.0f;
    parallel_rows(n, [&](int64_t lo, int64_t hi) {
        const float* p = x + lo * d;
        int8_t* out = codes + lo * d;
        int64_t cnt = (hi - lo) * d;
        for (int64_t j = 0; j < cnt; ++j) {
            float v = std::nearbyint(p[j] / s);
            v = std::max(-127.0f, std::min(127.0f, v));
            out[j] = (int8_t)v;
        }
    });
}

// Merge per-shard top-k candidate lists: scores/ids (b, c) -> exact
// descending top-k (b, k). Ties keep the earlier (lower-index) candidate,
// matching jax.lax.top_k. Padding uses id -1 / score -inf.
void ts_merge_topk(const float* scores, const int32_t* ids, int64_t b, int64_t c,
                   int64_t k, float* out_s, int32_t* out_i) {
    parallel_rows(b, [&](int64_t lo, int64_t hi) {
        std::vector<int32_t> idx(c);
        for (int64_t row = lo; row < hi; ++row) {
            const float* s = scores + row * c;
            const int32_t* d = ids + row * c;
            for (int64_t j = 0; j < c; ++j) idx[j] = (int32_t)j;
            int64_t kk = std::min(k, c);
            std::partial_sort(idx.begin(), idx.begin() + kk, idx.end(),
                              [&](int32_t a, int32_t bcol) {
                                  if (s[a] != s[bcol]) return s[a] > s[bcol];
                                  return a < bcol;
                              });
            for (int64_t j = 0; j < k; ++j) {
                if (j < kk) {
                    out_s[row * k + j] = s[idx[j]];
                    out_i[row * k + j] = d[idx[j]];
                } else {
                    out_s[row * k + j] = -INFINITY;
                    out_i[row * k + j] = -1;
                }
            }
        }
    });
}

// Strip %-comments from LaTeX (keeping \%), writing to dst (same size or
// smaller). Returns the output length. Single pass, branch-light.
int64_t ts_strip_comments(const char* src, int64_t n, char* dst) {
    int64_t o = 0;
    for (int64_t i = 0; i < n; ++i) {
        char ch = src[i];
        if (ch == '\\' && i + 1 < n) {
            dst[o++] = ch;
            dst[o++] = src[++i];
            continue;
        }
        if (ch == '%') {
            while (i + 1 < n && src[i + 1] != '\n') ++i;
            continue;
        }
        dst[o++] = ch;
    }
    return o;
}

}  // extern "C"
