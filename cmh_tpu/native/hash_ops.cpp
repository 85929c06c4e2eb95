// Native CPU serving kernels over packed binary hash codes.
//
// The TPU serving path (cmh_tpu/serving.py) scores queries with the Pallas
// XOR+popcount kernel; deployment hosts without an accelerator need the same
// exact top-k at CPU speed. Codes arrive as the uint32 words produced by
// ops/hashing.pack_bits (bit j of word w = code[w*32+j] > 0, zero-padded, so
// padding cancels in XOR). The reference has no serving layer at all — its
// eval pipeline materializes a float distance matrix and sorts it in python
// (/root/reference/common/calc_utils.py:51-92).
//
// Exact semantics (must match serving._search):
//   top-k by Hamming distance ascending, ties broken by LOWER gallery index.
//
// Built on demand by cmh_tpu/native/hash_ops.py (g++ -O3 -march=native,
// ctypes C ABI — no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int row_hamming(const uint32_t* a, const uint32_t* b, int words) {
    int d = 0;
    int w = 0;
    // pair 32-bit words into 64-bit popcounts; memcpy keeps loads
    // alignment-safe (rows of odd `words` leave later rows 4-byte aligned)
    for (; w + 2 <= words; w += 2) {
        uint64_t xa, xb;
        std::memcpy(&xa, a + w, 8);
        std::memcpy(&xb, b + w, 8);
        d += __builtin_popcountll(xa ^ xb);
    }
    if (w < words) d += __builtin_popcount(a[w] ^ b[w]);
    return d;
}

struct Cand {
    int32_t dist;
    int64_t idx;
    // max-heap orders the WORST candidate on top; worse = larger distance,
    // ties = larger index (so equal-distance later entries are evicted first,
    // preserving the lower-index-wins tie order)
    bool operator<(const Cand& o) const {
        return dist != o.dist ? dist < o.dist : idx < o.idx;
    }
};

void topk_query_range(const uint32_t* query, const uint32_t* gallery,
                      int64_t n_gallery, int words, int k, int64_t q_begin,
                      int64_t q_end, int32_t* out_dist, int64_t* out_idx) {
    std::vector<Cand> heap;
    heap.reserve(k);
    for (int64_t q = q_begin; q < q_end; ++q) {
        const uint32_t* qrow = query + q * words;
        heap.clear();
        for (int64_t g = 0; g < n_gallery; ++g) {
            int32_t d = row_hamming(qrow, gallery + g * words, words);
            if ((int64_t)heap.size() < k) {
                heap.push_back({d, g});
                std::push_heap(heap.begin(), heap.end());
            } else if (d < heap.front().dist) {
                // scanning ascending g: an equal-distance candidate can never
                // displace the heap max (its index is larger), so strict <
                std::pop_heap(heap.begin(), heap.end());
                heap.back() = {d, g};
                std::push_heap(heap.begin(), heap.end());
            }
        }
        std::sort_heap(heap.begin(), heap.end());  // ascending (dist, idx)
        for (int i = 0; i < k; ++i) {
            out_dist[q * k + i] = heap[i].dist;
            out_idx[q * k + i] = heap[i].idx;
        }
    }
}

}  // namespace

extern "C" {

// query (n_query, words) and gallery (n_gallery, words) row-major uint32;
// writes out_dist (n_query, k) int32 and out_idx (n_query, k) int64.
// Requires 0 < k <= n_gallery (enforced by the python wrapper).
void hamming_topk(const uint32_t* query, int64_t n_query,
                  const uint32_t* gallery, int64_t n_gallery, int words,
                  int k, int32_t* out_dist, int64_t* out_idx, int n_threads) {
    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 1;
    }
    if ((int64_t)n_threads > n_query) n_threads = (int)n_query;
    if (n_threads <= 1) {
        topk_query_range(query, gallery, n_gallery, words, k, 0, n_query,
                         out_dist, out_idx);
        return;
    }
    std::vector<std::thread> workers;
    workers.reserve(n_threads);
    int64_t chunk = (n_query + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t begin = t * chunk;
        int64_t end = std::min(begin + chunk, n_query);
        if (begin >= end) break;
        workers.emplace_back(topk_query_range, query, gallery, n_gallery,
                             words, k, begin, end, out_dist, out_idx);
    }
    for (auto& w : workers) w.join();
}

}  // extern "C"
