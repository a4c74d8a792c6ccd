// mlamg_tpu native runtime: host-side sparse preprocessing.
//
// The device compute path is JAX/XLA/Pallas; this library is the native
// *runtime around it* — the data-loader / graph-builder stage that turns
// raw CSR problems into the padded, statically-shaped buffers the TPU
// programs consume. These transforms run once per problem but over whole
// datasets (thousands of grids), so they are implemented in C++ and bound
// via ctypes (see mlamg_tpu/native/__init__.py, with numpy fallbacks).
//
// Contents:
//   csr_to_ell        — pad CSR rows into fixed-width ELL buffers
//   csr_to_dia        — extract diagonal (DIA) storage
//   count_diagonals   — structure probe for auto-format selection
//   rcm_ordering      — reverse Cuthill-McKee bandwidth reduction
//   greedy_coloring   — graph coloring for multicolor Gauss-Seidel
//   partition_rows    — contiguous row partitioning with halo checks
//   bellman_ford      — multi-source shortest paths (host oracle)
//   fem_p1_assemble   — P1 stiffness triplets for triangle meshes
//
// Build: make -C native   (produces libmlamg_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// Pack CSR rows into ELL (row-major, width w). Padding: col 0 / val 0.
// Returns 0 on success, -1 if some row exceeds the width.
int csr_to_ell(int64_t n, const int64_t* indptr, const int32_t* indices,
               const float* data, int64_t width, float* out_data,
               int32_t* out_cols) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t lo = indptr[i], hi = indptr[i + 1];
    if (hi - lo > width) return -1;
    float* drow = out_data + i * width;
    int32_t* crow = out_cols + i * width;
    int64_t k = 0;
    for (int64_t j = lo; j < hi; ++j, ++k) {
      drow[k] = data[j];
      crow[k] = indices[j];
    }
    for (; k < width; ++k) {
      drow[k] = 0.0f;
      crow[k] = 0;
    }
  }
  return 0;
}

// Number of distinct diagonals (structure probe for auto-format).
int64_t count_diagonals(int64_t n, const int64_t* indptr,
                        const int32_t* indices) {
  std::vector<uint8_t> seen(2 * n + 1, 0);
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
      int64_t off = (int64_t)indices[j] - i + n;  // in [0, 2n]
      if (!seen[off]) {
        seen[off] = 1;
        ++count;
      }
    }
  }
  return count;
}

// Extract DIA storage: offsets (sorted) and data[d * n + i] = A[i, i+off_d].
// offsets buffer must have capacity >= count_diagonals(); returns D.
int64_t csr_to_dia(int64_t n, const int64_t* indptr, const int32_t* indices,
                   const float* data, int64_t* offsets, float* out_data) {
  std::vector<int64_t> offs;
  {
    std::vector<uint8_t> seen(2 * n + 1, 0);
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
        int64_t off = (int64_t)indices[j] - i + n;
        if (!seen[off]) {
          seen[off] = 1;
          offs.push_back(off - n);
        }
      }
  }
  std::sort(offs.begin(), offs.end());
  std::vector<int64_t> inv(2 * n + 1, -1);
  for (size_t d = 0; d < offs.size(); ++d) inv[offs[d] + n] = (int64_t)d;
  std::memset(out_data, 0, sizeof(float) * offs.size() * n);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
      int64_t d = inv[(int64_t)indices[j] - i + n];
      out_data[d * n + i] = data[j];
    }
  std::copy(offs.begin(), offs.end(), offsets);
  return (int64_t)offs.size();
}

// Reverse Cuthill-McKee ordering. perm[k] = old index of new position k.
void rcm_ordering(int64_t n, const int64_t* indptr, const int32_t* indices,
                  int32_t* perm) {
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = indptr[i + 1] - indptr[i];
  std::vector<uint8_t> visited(n, 0);
  int64_t out = 0;
  std::vector<int32_t> order;
  order.reserve(n);
  for (;;) {
    // lowest-degree unvisited seed
    int64_t seed = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && degree[i] < best) {
        best = degree[i];
        seed = i;
      }
    if (seed < 0) break;
    std::queue<int32_t> q;
    q.push((int32_t)seed);
    visited[seed] = 1;
    while (!q.empty()) {
      int32_t u = q.front();
      q.pop();
      order.push_back(u);
      // neighbours sorted by degree
      std::vector<int32_t> nbrs;
      for (int64_t j = indptr[u]; j < indptr[u + 1]; ++j) {
        int32_t v = indices[j];
        if (!visited[v]) {
          visited[v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(), [&](int32_t a, int32_t b) {
        return degree[a] < degree[b];
      });
      for (int32_t v : nbrs) q.push(v);
    }
  }
  // reverse
  for (int64_t k = 0; k < n; ++k) perm[k] = order[n - 1 - k];
  (void)out;
}

// Greedy graph coloring; returns the number of colors.
int32_t greedy_coloring(int64_t n, const int64_t* indptr,
                        const int32_t* indices, int32_t* colors) {
  std::fill(colors, colors + n, -1);
  int32_t num_colors = 0;
  std::vector<uint8_t> used;
  for (int64_t i = 0; i < n; ++i) {
    used.assign((size_t)num_colors + 1, 0);
    for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
      int32_t c = colors[indices[j]];
      if (c >= 0 && c < (int32_t)used.size()) used[c] = 1;
    }
    int32_t c = 0;
    while (c < (int32_t)used.size() && used[c]) ++c;
    colors[i] = c;
    if (c >= num_colors) num_colors = c + 1;
  }
  return num_colors;
}

// Max |col - row_block_start| overflow beyond a contiguous partition with
// n_loc rows per shard: returns the required halo width.
int64_t required_halo(int64_t n, const int64_t* indptr, const int32_t* indices,
                      int64_t n_loc) {
  int64_t halo = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t lo = (i / n_loc) * n_loc;
    int64_t hi = lo + n_loc;
    for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
      int64_t c = indices[j];
      if (c < lo) halo = std::max(halo, lo - c);
      if (c >= hi) halo = std::max(halo, c - hi + 1);
    }
  }
  return halo;
}

// Multi-source Bellman-Ford (host oracle for the device kernel).
// dist must be pre-filled with +inf, nearest with -1.
void bellman_ford(int64_t n, const int64_t* indptr, const int32_t* indices,
                  const float* weights, const int32_t* centers,
                  int64_t num_centers, float* dist, int32_t* nearest) {
  for (int64_t c = 0; c < num_centers; ++c) {
    dist[centers[c]] = 0.0f;
    nearest[centers[c]] = centers[c];
  }
  bool changed = true;
  while (changed) {
    changed = false;
    for (int64_t i = 0; i < n; ++i) {
      if (dist[i] == INFINITY) continue;
      for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
        int32_t v = indices[j];
        float nd = dist[i] + weights[j];
        if (nd < dist[v]) {
          dist[v] = nd;
          nearest[v] = nearest[i];
          changed = true;
        }
      }
    }
  }
}

// P1 stiffness triplets for a triangle mesh with per-element 2x2 diffusion
// tensors. rows/cols/vals have capacity 9 * n_tri.
void fem_p1_assemble(int64_t n_tri, const double* vertices /* (n_v, 2) */,
                     const int64_t* triangles /* (n_tri, 3) */,
                     const double* kappa /* (n_tri, 2, 2) */,
                     int64_t* rows, int64_t* cols, double* vals) {
  for (int64_t t = 0; t < n_tri; ++t) {
    const int64_t* tri = triangles + 3 * t;
    double x0 = vertices[2 * tri[0]], y0 = vertices[2 * tri[0] + 1];
    double x1 = vertices[2 * tri[1]], y1 = vertices[2 * tri[1] + 1];
    double x2 = vertices[2 * tri[2]], y2 = vertices[2 * tri[2] + 1];
    double d1x = x1 - x0, d1y = y1 - y0, d2x = x2 - x0, d2y = y2 - y0;
    double det = d1x * d2y - d1y * d2x;
    double area = 0.5 * std::abs(det);
    double inv = 1.0 / det;
    // basis gradients
    double g[3][2];
    g[1][0] = d2y * inv;
    g[1][1] = -d2x * inv;
    g[2][0] = -d1y * inv;
    g[2][1] = d1x * inv;
    g[0][0] = -(g[1][0] + g[2][0]);
    g[0][1] = -(g[1][1] + g[2][1]);
    const double* K = kappa + 4 * t;  // row-major 2x2
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) {
        double kg0 = K[0] * g[b][0] + K[1] * g[b][1];
        double kg1 = K[2] * g[b][0] + K[3] * g[b][1];
        double v = area * (g[a][0] * kg0 + g[a][1] * kg1);
        int64_t idx = 9 * t + 3 * a + b;
        rows[idx] = tri[a];
        cols[idx] = tri[b];
        vals[idx] = v;
      }
  }
}

}  // extern "C"
