// Native data-preprocessing kernels for the tgt_tpu input pipeline.
//
// TPU-native replacements for the reference's numba JIT kernels
// (lib/data/pcqm/structural_transform.py:8-48, bin_ops.py:5-48,
// dataset/stack_with_pad.py:5-91): the host side of a pod-scale input
// pipeline must sustain hundreds of molecules/sec/host without a JIT
// warmup or the GIL; these run as plain C, called via ctypes from
// tgt_tpu/data/_native.py, and release no Python state.
//
// Build: csrc/build.sh (g++ -O3 -shared -fPIC).
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// All-pairs hop distances over a dense adjacency (int16), unreachable = 510.
// Semantics match reference floyd_warshall (structural_transform.py:8-28).
void floyd_warshall(const int16_t* adj, int16_t* dist, int n) {
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < n; ++j) {
            dist[i * n + j] = (i == j) ? 0 : (adj[i * n + j] ? 1 : 510);
        }
    }
    for (int k = 0; k < n; ++k) {
        const int16_t* dk = dist + k * n;
        for (int i = 0; i < n; ++i) {
            int16_t dik = dist[i * n + k];
            if (dik >= 510) continue;
            int16_t* di = dist + i * n;
            for (int j = 0; j < n; ++j) {
                int16_t nd = (int16_t)(dik + dk[j]);
                if (nd < di[j]) di[j] = nd;
            }
        }
    }
}

// Offset feature encoding + dense scatter + hop matrix in one pass.
// node_feats (n, fn) int16 -> +1 + col*128; edges (m, 2) int64;
// edge_feats (m, fe) int16 -> +1 + col*8 scattered to (n, n, fe).
// Matches reference preprocess_data (structural_transform.py:31-48).
void preprocess_graph(int n, int fn, int fe, int m,
                      const int64_t* edges,
                      const int16_t* node_feats_in, int16_t* node_feats_out,
                      const int16_t* edge_feats_in,
                      int16_t* dist_out, int16_t* featm_out) {
    for (int i = 0; i < n; ++i)
        for (int f = 0; f < fn; ++f)
            node_feats_out[i * fn + f] =
                (int16_t)(node_feats_in[i * fn + f] + 1 + f * 128);

    int16_t* adj = new int16_t[n * n];
    std::memset(adj, 0, sizeof(int16_t) * n * n);
    std::memset(featm_out, 0, sizeof(int16_t) * n * n * fe);
    for (int e = 0; e < m; ++e) {
        int i = (int)edges[e * 2], j = (int)edges[e * 2 + 1];
        adj[i * n + j] = 1;
        for (int f = 0; f < fe; ++f)
            featm_out[(i * n + j) * fe + f] =
                (int16_t)(edge_feats_in[e * fe + f] + 1 + f * 8);
    }
    floyd_warshall(adj, dist_out, n);
    delete[] adj;
}

// Strict-upper-triangle pack: (s, n, n) any 1/2-byte dtype -> (s, n(n-1)/2).
void pack_bins_multi(const uint8_t* bins, uint8_t* out, int s, int n,
                     int itemsize) {
    const int tri = n * (n - 1) / 2;
    for (int si = 0; si < s; ++si) {
        const uint8_t* src = bins + (size_t)si * n * n * itemsize;
        uint8_t* dst = out + (size_t)si * tri * itemsize;
        int k = 0;
        for (int i = 0; i < n; ++i)
            for (int j = i + 1; j < n; ++j, ++k)
                std::memcpy(dst + (size_t)k * itemsize,
                            src + ((size_t)i * n + j) * itemsize, itemsize);
    }
}

void unpack_bins_multi(const uint8_t* packed, uint8_t* out, int s, int n,
                       int itemsize) {
    const int tri = n * (n - 1) / 2;
    std::memset(out, 0, (size_t)s * n * n * itemsize);
    for (int si = 0; si < s; ++si) {
        const uint8_t* src = packed + (size_t)si * tri * itemsize;
        uint8_t* dst = out + (size_t)si * n * n * itemsize;
        int k = 0;
        for (int i = 0; i < n; ++i)
            for (int j = i + 1; j < n; ++j, ++k)
                std::memcpy(dst + ((size_t)i * n + j) * itemsize,
                            src + (size_t)k * itemsize, itemsize);
    }
}

// Ragged stack-with-pad (ranks 1-4, like the reference): copy `count` arrays
// (same rank/dtype, row-major) into a pre-zeroed dense batch whose per-item
// shape is out_shape (per-dim maxima or bucket-padded). shapes: (count, rank).
void stack_with_pad(const uint8_t** srcs, const int64_t* shapes, int count,
                    int rank, const int64_t* out_shape, uint8_t* out,
                    int itemsize) {
    int64_t os[4] = {1, 1, 1, 1};
    for (int d = 0; d < rank; ++d) os[d] = out_shape[d];
    const int64_t s3 = (int64_t)itemsize;
    const int64_t s2 = os[3] * s3;
    const int64_t s1 = os[2] * s2;
    const int64_t s0 = os[1] * s1;
    const int64_t batch = os[0] * s0;

    for (int c = 0; c < count; ++c) {
        const int64_t* shp = shapes + (size_t)c * rank;
        int64_t d0 = shp[0];
        int64_t d1 = rank > 1 ? shp[1] : 1;
        int64_t d2 = rank > 2 ? shp[2] : 1;
        int64_t d3 = rank > 3 ? shp[3] : 1;
        const uint8_t* src = srcs[c];
        uint8_t* dstc = out + (size_t)c * batch;
        const int64_t row = d3 * itemsize;
        for (int64_t i = 0; i < d0; ++i)
            for (int64_t j = 0; j < d1; ++j)
                for (int64_t k = 0; k < d2; ++k) {
                    std::memcpy(dstc + i * s0 + j * s1 + k * s2, src, row);
                    src += row;
                }
    }
}

}  // extern "C"
