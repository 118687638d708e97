// Native host-side graph kernels for theiasfm_tpu.
//
// The reference keeps its host hot loops in C++ (union-find track
// building, src/theia/sfm/track_builder.cc + math/graph/
// connected_components.h; sequential orderings). These are the
// components that stay on the host in the TPU design (SURVEY.md §7
// hard part #6), so they get native implementations here, exposed
// through a C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libhost_ops.so)
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

// Array-based union-find with path halving + union by size.
struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int64_t> size;

  explicit UnionFind(int64_t n) : parent(n), size(n, 1) {
    std::iota(parent.begin(), parent.end(), 0);
  }

  int64_t Find(int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }

  void Union(int64_t a, int64_t b) {
    int64_t ra = Find(a), rb = Find(b);
    if (ra == rb) return;
    if (size[ra] < size[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    size[ra] += size[rb];
  }
};

}  // namespace

extern "C" {

// Connected components over `num_edges` pairs; writes the component
// root of each of the `num_nodes` nodes into `labels_out`.
void uf_connected_components(const int64_t* edges_a,
                             const int64_t* edges_b, int64_t num_edges,
                             int64_t num_nodes, int64_t* labels_out) {
  UnionFind uf(num_nodes);
  for (int64_t i = 0; i < num_edges; ++i) {
    uf.Union(edges_a[i], edges_b[i]);
  }
  for (int64_t i = 0; i < num_nodes; ++i) {
    labels_out[i] = uf.Find(i);
  }
}

// Greedy minimum-feedback-arc-set ordering (the 1DSfM ORDER step):
// repeatedly emit the remaining node maximizing out-in weight, sources
// first. arcs are directed i->j with weight w. Writes position-in-order
// per node. O(V^2 + E) with dense bookkeeping — the same algorithm the
// reference runs per random projection
// (filter_view_pairs_from_relative_translation.cc).
void mfas_order(const int64_t* arcs_i, const int64_t* arcs_j,
                const double* arc_w, int64_t num_arcs, int64_t num_nodes,
                int64_t* order_out) {
  std::vector<double> out_w(num_nodes, 0.0), in_w(num_nodes, 0.0);
  std::vector<std::vector<std::pair<int64_t, double>>> out_adj(num_nodes),
      in_adj(num_nodes);
  for (int64_t e = 0; e < num_arcs; ++e) {
    out_w[arcs_i[e]] += arc_w[e];
    in_w[arcs_j[e]] += arc_w[e];
    out_adj[arcs_i[e]].emplace_back(arcs_j[e], arc_w[e]);
    in_adj[arcs_j[e]].emplace_back(arcs_i[e], arc_w[e]);
  }
  std::vector<char> remaining(num_nodes, 1);
  for (int64_t pos = 0; pos < num_nodes; ++pos) {
    int64_t best = -1;
    double best_score = -1e300;
    for (int64_t v = 0; v < num_nodes; ++v) {
      if (!remaining[v]) continue;
      double score = out_w[v] - in_w[v];
      if (in_w[v] <= 1e-12) score += 1e12;  // sources first
      if (score > best_score) {
        best_score = score;
        best = v;
      }
    }
    remaining[best] = 0;
    order_out[best] = pos;
    for (const auto& [j, w] : out_adj[best]) {
      if (remaining[j]) in_w[j] -= w;
    }
    for (const auto& [i, w] : in_adj[best]) {
      if (remaining[i]) out_w[i] -= w;
    }
  }
}

// Kruskal minimum spanning tree. Returns number of edges written into
// mst_out (indices into the input edge list). Caller sorts by weight?
// No: weights are provided, sorted here.
int64_t kruskal_mst(const int64_t* edges_a, const int64_t* edges_b,
                    const double* weights, int64_t num_edges,
                    int64_t num_nodes, int64_t* mst_out) {
  std::vector<int64_t> idx(num_edges);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return weights[a] < weights[b];
  });
  UnionFind uf(num_nodes);
  int64_t n_out = 0;
  for (int64_t k = 0; k < num_edges; ++k) {
    int64_t e = idx[k];
    int64_t ra = uf.Find(edges_a[e]), rb = uf.Find(edges_b[e]);
    if (ra != rb) {
      uf.Union(ra, rb);
      mst_out[n_out++] = e;
    }
  }
  return n_out;
}

}  // extern "C"
