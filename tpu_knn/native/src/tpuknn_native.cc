// tpuknn_native — host-side native runtime for the TPU 1-NN engine.
//
// The CUDA reference implements its entire host layer in C++ (generator.h,
// main.cu, the v0 oracle and KD-tree build in core.cu). This library is the
// TPU build's native equivalent: deterministic sample generation, the
// serial-semantics oracle used as the correctness baseline for large
// shapes, and the KD-tree construction (reference core.cu:975-1008) whose
// nth_element-based recursive build is inherently host-side.
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in this
// toolchain). All functions are thread-safe unless noted.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <utility>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// glibc rand() — TYPE_3 additive feedback generator (degree 31, separation
// 3, 310 warm-up discards), bit-compatible with glibc srand()/rand().
// Mirrors tpu_knn/harness/generator.py:GlibcRand; differentially validated
// against the system libc in tests/test_generator.py.
// ---------------------------------------------------------------------------

struct TkRand {
  uint32_t buf[31];
  int64_t pos;
};

void* tk_rand_new(int32_t seed) {
  auto* st = new TkRand();
  // glibc __srandom_r: seed is unsigned, 0 becomes 1, and the state is
  // expanded with Schrage's method on the int32 view of the seed (exact
  // C truncated-division semantics, matching harness/generator.py).
  uint32_t us = (uint32_t)seed;
  if (us == 0) us = 1;
  int32_t r[34];
  int64_t word = (int32_t)us;
  r[0] = (int32_t)word;
  for (int i = 1; i < 31; i++) {
    int64_t hi = word / 127773;
    int64_t lo = word % 127773;
    word = 16807 * lo - 2836 * hi;
    if (word < 0) word += 2147483647;
    r[i] = (int32_t)word;
  }
  for (int i = 31; i < 34; i++) r[i] = r[i - 31];
  for (int i = 3; i < 34; i++) st->buf[i % 31] = (uint32_t)r[i];
  st->pos = 34;
  // Discard the 310 warm-up outputs.
  for (int j = 0; j < 310; j++) {
    int i = (int)(st->pos % 31);
    st->buf[i] = st->buf[i] + st->buf[(st->pos - 3) % 31];
    st->pos++;
  }
  return st;
}

void tk_rand_free(void* handle) { delete (TkRand*)handle; }

// Next `count` raw rand() outputs (0..2^31-1).
void tk_rand_raw(void* handle, int64_t count, int32_t* out) {
  auto* st = (TkRand*)handle;
  for (int64_t j = 0; j < count; j++) {
    int i = (int)(st->pos % 31);
    st->buf[i] = st->buf[i] + st->buf[(st->pos - 3) % 31];
    out[j] = (int32_t)(st->buf[i] >> 1);
    st->pos++;
  }
}

// Next `count` floats mapped like the reference getRandNum (generator.h:17-19):
// float(rand() / double(RAND_MAX)).
void tk_rand_floats(void* handle, int64_t count, float* out) {
  auto* st = (TkRand*)handle;
  const double inv = 1.0 / 2147483647.0;
  for (int64_t j = 0; j < count; j++) {
    int i = (int)(st->pos % 31);
    st->buf[i] = st->buf[i] + st->buf[(st->pos - 3) % 31];
    out[j] = (float)((double)(st->buf[i] >> 1) * inv);
    st->pos++;
  }
}

// ---------------------------------------------------------------------------
// v0 oracle — serial-semantics exact 1-NN (reference core.cu:25-63):
// float32 accumulation in k order, strict-> running min (lowest-index ties).
// tk_oracle_omp parallelizes over queries (each query's scan is unchanged,
// so results are bit-identical to the serial loop) — the analog of the
// reference's host OpenMP usage (core.cu:1209-1218).
// ---------------------------------------------------------------------------

static inline void oracle_row(int k, int n, const float* q, const float* ref,
                              int32_t* out_idx, float* out_dist) {
  float best = std::numeric_limits<float>::infinity();
  int32_t besti = 0;
  for (int j = 0; j < n; j++) {
    float acc = 0.0f;
    const float* r = ref + (int64_t)j * k;
    for (int t = 0; t < k; t++) {
      const float diff = q[t] - r[t];
      acc += diff * diff;
    }
    if (best > acc) {
      best = acc;
      besti = j;
    }
  }
  *out_idx = besti;
  if (out_dist) *out_dist = best;
}

void tk_oracle(int k, int m, int n, const float* search, const float* ref,
               int32_t* out_idx, float* out_dist) {
  for (int i = 0; i < m; i++) {
    oracle_row(k, n, search + (int64_t)i * k, ref, out_idx + i,
               out_dist ? out_dist + i : nullptr);
  }
}

void tk_oracle_omp(int k, int m, int n, const float* search, const float* ref,
                   int32_t* out_idx, float* out_dist) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < m; i++) {
    oracle_row(k, n, search + (int64_t)i * k, ref, out_idx + i,
               out_dist ? out_dist + i : nullptr);
  }
}

// ---------------------------------------------------------------------------
// KD-tree build — implicit-heap array layout (reference core.cu:960-1008):
// node 1 is the root, children of node i are 2i and 2i+1; `p[node]` is the
// reference-point index stored at the node (-1 = empty), `dim[node]` the
// split dimension chosen by maximum variance, median split via
// nth_element. Arrays are sized 4n like the reference (README.md:331).
// ---------------------------------------------------------------------------

struct BuildCtx {
  int k;
  const float* ref;  // (n, k) AoS
  int32_t* p;
  int32_t* dim;
  std::vector<int32_t> order;  // permutation being partitioned
};

static void kd_build_rec(BuildCtx& ctx, int node, int lo, int hi) {
  if (lo >= hi) return;
  // Pick the dimension with maximum variance over [lo, hi).
  int best_dim = 0;
  double best_var = -1.0;
  const int cnt = hi - lo;
  for (int d = 0; d < ctx.k; d++) {
    double sum = 0.0, sum2 = 0.0;
    for (int i = lo; i < hi; i++) {
      const double v = ctx.ref[(int64_t)ctx.order[i] * ctx.k + d];
      sum += v;
      sum2 += v * v;
    }
    const double var = sum2 / cnt - (sum / cnt) * (sum / cnt);
    if (var > best_var) {
      best_var = var;
      best_dim = d;
    }
  }
  const int mid = (lo + hi) / 2;
  const int k = ctx.k;
  const float* ref = ctx.ref;
  std::nth_element(ctx.order.begin() + lo, ctx.order.begin() + mid,
                   ctx.order.begin() + hi,
                   [ref, k, best_dim](int32_t a, int32_t b) {
                     return ref[(int64_t)a * k + best_dim] <
                            ref[(int64_t)b * k + best_dim];
                   });
  ctx.p[node] = ctx.order[mid];
  ctx.dim[node] = best_dim;
  kd_build_rec(ctx, 2 * node, lo, mid);
  kd_build_rec(ctx, 2 * node + 1, mid + 1, hi);
}

// p and dim must have space for 4n int32 entries; initialized to -1 here.
void tk_kdtree_build(int k, int n, const float* ref, int32_t* p,
                     int32_t* dim) {
  const int64_t cap = 4LL * n;
  for (int64_t i = 0; i < cap; i++) {
    p[i] = -1;
    dim[i] = -1;
  }
  BuildCtx ctx;
  ctx.k = k;
  ctx.ref = ref;
  ctx.p = p;
  ctx.dim = dim;
  ctx.order.resize(n);
  for (int i = 0; i < n; i++) ctx.order[i] = i;
  kd_build_rec(ctx, 1, 0, n);
}

// ---------------------------------------------------------------------------
// KD-tree CPU query (reference v9, core.cu:1010-1025): recursive descend +
// backtrack with squared-distance pruning. Returns the nearest reference
// index per query; exact (prune uses strict inequality with the reference's
// 1e-6 slack removed — we prune only when the splitting-plane distance
// strictly exceeds the best, which keeps exactness and lowest-index ties
// handled by the < update and deterministic traversal order).
// ---------------------------------------------------------------------------

struct QueryCtx {
  int k;
  const float* ref;
  const int32_t* p;
  const int32_t* dim;
  int64_t cap;  // 4n
};

static void kd_ask_rec(const QueryCtx& ctx, int node, const float* q,
                       float& best, int32_t& besti) {
  if (node >= ctx.cap || ctx.p[node] < 0) return;
  const int32_t pi = ctx.p[node];
  const float* r = ctx.ref + (int64_t)pi * ctx.k;
  float acc = 0.0f;
  for (int t = 0; t < ctx.k; t++) {
    const float diff = q[t] - r[t];
    acc += diff * diff;
  }
  // Lowest-index tie-break: on equal distance prefer the smaller point
  // index (the serial oracle keeps the first of equals in scan order; for
  // tree traversal order is not scan order, so we make the rule explicit).
  if (acc < best || (acc == best && pi < besti)) {
    best = acc;
    besti = pi;
  }
  const int d = ctx.dim[node];
  const float delta = q[d] - r[d];
  const int near_child = delta < 0 ? 2 * node : 2 * node + 1;
  const int far_child = delta < 0 ? 2 * node + 1 : 2 * node;
  kd_ask_rec(ctx, near_child, q, best, besti);
  if (delta * delta <= best) {
    kd_ask_rec(ctx, far_child, q, best, besti);
  }
}

void tk_kdtree_query(int k, int m, int n, const float* search,
                     const float* ref, const int32_t* p, const int32_t* dim,
                     int32_t* out_idx, float* out_dist) {
  QueryCtx ctx;
  ctx.k = k;
  ctx.ref = ref;
  ctx.p = p;
  ctx.dim = dim;
  ctx.cap = 4LL * n;
#pragma omp parallel for schedule(dynamic, 16)
  for (int i = 0; i < m; i++) {
    float best = std::numeric_limits<float>::infinity();
    int32_t besti = 0;
    kd_ask_rec(ctx, 1, search + (int64_t)i * k, best, besti);
    out_idx[i] = besti;
    if (out_dist) out_dist[i] = best;
  }
}

// Top-K traversal (serving extension — no reference analog): a bounded
// max-heap of (d2, idx) per query, lex-ordered so equal distances keep
// the LOWEST index set (v0's tie rule extended to K). Prune rule matches
// the 1-NN traversal: descend the far child while delta^2 <= the current
// k-th best (or the heap is not yet full).

struct TkTopkEntry {
  float d2;
  int32_t idx;
};

// Strict lex (d2, idx) "a nearer than b"; used as the heap comparator so
// the heap front is the lex-LARGEST (worst) of the kept K.
static bool tk_nearer(const TkTopkEntry& a, const TkTopkEntry& b) {
  return a.d2 < b.d2 || (a.d2 == b.d2 && a.idx < b.idx);
}

static void kd_ask_topk_rec(const QueryCtx& ctx, int64_t node, const float* q,
                            int K, std::vector<TkTopkEntry>& heap) {
  if (node >= ctx.cap || ctx.p[node] < 0) return;
  const int32_t pi = ctx.p[node];
  const float* r = ctx.ref + (int64_t)pi * ctx.k;
  float acc = 0.0f;
  for (int t = 0; t < ctx.k; t++) {
    const float diff = q[t] - r[t];
    acc += diff * diff;
  }
  const TkTopkEntry cur{acc, pi};
  if ((int)heap.size() < K) {
    heap.push_back(cur);
    std::push_heap(heap.begin(), heap.end(), tk_nearer);
  } else if (tk_nearer(cur, heap.front())) {
    std::pop_heap(heap.begin(), heap.end(), tk_nearer);
    heap.back() = cur;
    std::push_heap(heap.begin(), heap.end(), tk_nearer);
  }
  const int d = ctx.dim[node];
  const float delta = q[d] - r[d];
  const int64_t near_child = delta < 0 ? 2 * node : 2 * node + 1;
  const int64_t far_child = delta < 0 ? 2 * node + 1 : 2 * node;
  kd_ask_topk_rec(ctx, near_child, q, K, heap);
  if ((int)heap.size() < K || delta * delta <= heap.front().d2) {
    kd_ask_topk_rec(ctx, far_child, q, K, heap);
  }
}

// out_idx/out_d2 are (m, K) row-major; when n < K the row tail is filled
// with idx -1 / d2 +inf. Rows are sorted ascending by (d2, idx).
void tk_kdtree_query_topk(int k, int m, int n, int K, const float* search,
                          const float* ref, const int32_t* p,
                          const int32_t* dim, int32_t* out_idx,
                          float* out_d2) {
  QueryCtx ctx;
  ctx.k = k;
  ctx.ref = ref;
  ctx.p = p;
  ctx.dim = dim;
  ctx.cap = 4LL * n;
#pragma omp parallel for schedule(dynamic, 16)
  for (int i = 0; i < m; i++) {
    std::vector<TkTopkEntry> heap;
    heap.reserve(K);
    kd_ask_topk_rec(ctx, 1, search + (int64_t)i * k, K, heap);
    std::sort(heap.begin(), heap.end(), tk_nearer);
    int32_t* oi = out_idx + (int64_t)i * K;
    float* od = out_d2 + (int64_t)i * K;
    for (int j = 0; j < K; j++) {
      if (j < (int)heap.size()) {
        oi[j] = heap[j].idx;
        od[j] = heap[j].d2;
      } else {
        oi[j] = -1;
        od[j] = std::numeric_limits<float>::infinity();
      }
    }
  }
}

int tk_version() { return 1; }

}  // extern "C"
