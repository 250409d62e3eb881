// Native row-block tile packer.
//
// C++ implementation of maxk_tpu.ops.tiling.build_tiles — the TPU-native
// replacement for the reference's offline warp-metadata generator
// (reference kernels/generate_meta.py: one (row, loc, len, pad) quadruple
// per CUDA warp, each warp owning <=64 consecutive nonzeros of one row).
// The Python/numpy builder walks row blocks in a Python loop, which is the
// graph-load bottleneck for the larger graphs of the 24-graph benchmark
// suite (V up to ~2.5M, E up to ~120M); this version is a single linear
// pass over the CSR arrays.
//
// Semantics are bit-identical to tiling.build_tiles (tests/test_native.py
// checks equality on random graphs):
//   - rows are grouped into blocks of R rows;
//   - each block's edges are packed into tiles of exactly C slots, tiles
//     never spanning two blocks;
//   - padding slots get col=0, val=0, lrow=R (the discarded garbage row);
//   - the tile count is rounded up to a multiple of the gather group
//     (min(64, max(1, 65536 / C)) — MUST match ops/tiling.py
//     gather_group) with all-padding tiles.
//
// Exposed via ctypes (no pybind11 in this environment) — see build.py.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Number of tiles needed (including gather-group rounding).
int64_t mk_count_tiles(const int64_t* indptr, int64_t n_nodes,
                       int64_t R, int64_t C) {
    int64_t n_blocks = std::max<int64_t>(1, (n_nodes + R - 1) / R);
    int64_t n_tiles = 0;
    for (int64_t b = 0; b < n_blocks; ++b) {
        int64_t r0 = std::min(b * R, n_nodes);
        int64_t r1 = std::min((b + 1) * R, n_nodes);
        int64_t cnt = indptr[r1] - indptr[r0];
        n_tiles += (cnt + C - 1) / C;
    }
    if (n_tiles == 0) n_tiles = 1;
    int64_t group = std::max<int64_t>(1, std::min<int64_t>(64, 65536 / C));
    return ((n_tiles + group - 1) / group) * group;
}

// Fill pre-allocated tile arrays.
//   cols  (n_tiles, C) int32   — caller-zeroed not required (fully written)
//   vals  (n_tiles, C) float32
//   lrow  (n_tiles, C) int32
//   block (n_tiles,)   int32
void mk_fill_tiles(const int64_t* indptr, const int32_t* indices,
                   const float* values, int64_t n_nodes,
                   int64_t R, int64_t C, int64_t n_tiles,
                   int32_t* cols, float* vals, int32_t* lrow,
                   int32_t* block) {
    int64_t n_blocks = std::max<int64_t>(1, (n_nodes + R - 1) / R);
    // Padding defaults. Trailing all-padding tiles point at the last block
    // (keeps the tile->block map monotone for output-block revisiting).
    for (int64_t t = 0; t < n_tiles; ++t) {
        std::memset(cols + t * C, 0, C * sizeof(int32_t));
        std::memset(vals + t * C, 0, C * sizeof(float));
        std::fill(lrow + t * C, lrow + (t + 1) * C, (int32_t)R);
        block[t] = (int32_t)(n_blocks - 1);
    }
    int64_t t = 0;
    for (int64_t b = 0; b < n_blocks; ++b) {
        int64_t r0 = std::min(b * R, n_nodes);
        int64_t r1 = std::min((b + 1) * R, n_nodes);
        int64_t e0 = indptr[r0], e1 = indptr[r1];
        if (e0 == e1) continue;
        // Walk the block's rows once, emitting tiles of C consecutive edges.
        int64_t row = r0;
        for (int64_t s = e0; s < e1; s += C, ++t) {
            int64_t e = std::min(s + C, e1);
            int32_t* tc = cols + t * C;
            float* tv = vals + t * C;
            int32_t* tl = lrow + t * C;
            block[t] = (int32_t)b;
            // Advance `row` so indptr[row] <= s < indptr[row+1].
            while (indptr[row + 1] <= s) ++row;
            int64_t r = row;
            for (int64_t i = s; i < e; ++i) {
                while (indptr[r + 1] <= i) ++r;
                tc[i - s] = indices[i];
                tv[i - s] = values[i];
                tl[i - s] = (int32_t)(r - b * R);
            }
        }
    }
}

// CSR transpose via counting sort: O(V + E), stable within columns.
// numpy's stable argsort over 100M+ edges costs tens of seconds at
// reddit scale; this runs in ~1 s (the host-side analog of the
// reference's implicit transpose reuse, SURVEY.md section 2.1 backward).
void mk_transpose(const int64_t* indptr, const int32_t* indices,
                  const float* values, int64_t n_nodes,
                  int64_t* out_indptr, int32_t* out_indices,
                  float* out_values) {
    int64_t n_edges = indptr[n_nodes];
    // Column counts -> output row pointers.
    std::fill(out_indptr, out_indptr + n_nodes + 1, (int64_t)0);
    for (int64_t e = 0; e < n_edges; ++e) out_indptr[indices[e] + 1]++;
    for (int64_t v = 0; v < n_nodes; ++v) out_indptr[v + 1] += out_indptr[v];
    // Scatter edges; cursor array reuses a scratch copy of the pointers.
    std::vector<int64_t> cursor(out_indptr, out_indptr + n_nodes);
    for (int64_t r = 0; r < n_nodes; ++r) {
        for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
            int64_t pos = cursor[indices[e]]++;
            out_indices[pos] = (int32_t)r;
            out_values[pos] = values[e];
        }
    }
}

// COO -> CSR via counting sort: O(V + E), stable in input order.
// numpy's stable argsort over 100M+ edges costs minutes (measured 525 s
// building the reddit-shaped synthetic graph); this is seconds.
void mk_coo_to_csr(const int64_t* src, const int32_t* dst,
                   const float* values, int64_t n_nodes, int64_t n_edges,
                   int64_t* out_indptr, int32_t* out_indices,
                   float* out_values) {
    std::fill(out_indptr, out_indptr + n_nodes + 1, (int64_t)0);
    for (int64_t e = 0; e < n_edges; ++e) out_indptr[src[e] + 1]++;
    for (int64_t v = 0; v < n_nodes; ++v) out_indptr[v + 1] += out_indptr[v];
    std::vector<int64_t> cursor(out_indptr, out_indptr + n_nodes);
    for (int64_t e = 0; e < n_edges; ++e) {
        int64_t pos = cursor[src[e]]++;
        out_indices[pos] = dst[e];
        out_values[pos] = values[e];
    }
}

// Column-range split (PartedGraph construction): two O(E) passes fill
// every part's CSR simultaneously (the numpy per-part masking costs
// ~40 s/part at 115M edges; this is ~2 s total).
//   out_indptr  (n_parts, n_nodes+1) int64
//   out_indices (n_edges,) int32 — parts packed back to back in the order
//               given by out_offsets (n_parts+1,) int64
void mk_split_columns(const int64_t* indptr, const int32_t* indices,
                      const float* values, int64_t n_nodes,
                      int64_t part_rows, int64_t n_parts,
                      int64_t* out_indptr, int32_t* out_indices,
                      float* out_values, int64_t* out_offsets) {
    int64_t n_edges = indptr[n_nodes];
    // Pass 1: per-(part, row) counts.
    std::fill(out_indptr, out_indptr + n_parts * (n_nodes + 1), (int64_t)0);
    for (int64_t r = 0; r < n_nodes; ++r) {
        for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
            int64_t p = indices[e] / part_rows;
            out_indptr[p * (n_nodes + 1) + r + 1]++;
        }
    }
    // Prefix sums per part + global part offsets.
    out_offsets[0] = 0;
    for (int64_t p = 0; p < n_parts; ++p) {
        int64_t* ip = out_indptr + p * (n_nodes + 1);
        for (int64_t r = 0; r < n_nodes; ++r) ip[r + 1] += ip[r];
        out_offsets[p + 1] = out_offsets[p] + ip[n_nodes];
    }
    // Pass 2: scatter with per-part cursors (edges stay row-ordered).
    std::vector<int64_t> cursor(n_parts);
    for (int64_t r = 0; r < n_nodes; ++r) {
        for (int64_t p = 0; p < n_parts; ++p)
            cursor[p] = out_offsets[p] + out_indptr[p * (n_nodes + 1) + r];
        for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
            int64_t p = indices[e] / part_rows;
            int64_t pos = cursor[p]++;
            out_indices[pos] = (int32_t)(indices[e] - p * part_rows);
            out_values[pos] = values[e];
        }
    }
}

}  // extern "C"
