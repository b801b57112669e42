// Single-core CPU baseline of the reference's RtreeBvh query backend and
// grid generator — built to MEASURE the "vs single-core Rust RtreeBvh"
// multipliers instead of estimating them (BASELINE.md north star; no Rust
// toolchain exists on this host).
//
// Implements, from the SURVEY.md description of the reference:
//   * BVH over triangles: median-split on centroid, AABB per node
//     (≙ `bvh` crate build used at `rtree_bvh.rs:108-118`).
//   * Branch-and-bound nearest triangle distance (≙ `bvh_ext.rs:59-168`
//     + rstar nearest_neighbor at `rtree_bvh.rs:126`).
//   * 3-axis aligned raycast parity sign (≙ `rtree_bvh.rs:143-171`,
//     `geo.rs:156-216`).
//   * The 3-phase grid generator: AABB±1 preheap rasterization, Dijkstra
//     heap propagation over 26-neighborhoods, boundary-ray raycast parity
//     (≙ `generate/grid.rs:265-378`) — single-threaded, so the measured
//     number is the per-core baseline the README/CHANGELOG claims scale
//     from.
//
// This is an independent implementation in C++ (no reference code reused).
//
// Protocol (stdin, little-endian):
//   u32 mode            0 = query points, 1 = grid
//   u32 T               triangle count
//   f32 tris[T*9]       a.xyz b.xyz c.xyz
//   mode 0: u32 Q, f32 queries[Q*3]
//   mode 1: f32 first_cell[3], f32 cell_size[3], u32 cell_count[3]
// Output (stdout): one JSON line with timings and throughput.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 vmin(V3 a, V3 b) { return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)}; }
static inline V3 vmax(V3 a, V3 b) { return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)}; }

struct Tri {
  V3 a, b, c;
};

// Closest-point-on-triangle squared distance (Embree-style region ladder —
// the same published algorithm as `geo.rs:70-138`).
static float tri_dist2(const V3& p, const Tri& t) {
  V3 ab = t.b - t.a, ac = t.c - t.a, ap = p - t.a;
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0.f && d2 <= 0.f) return dot(ap, ap);
  V3 bp = p - t.b;
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0.f && d4 <= d3) return dot(bp, bp);
  V3 cp = p - t.c;
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0.f && d5 <= d6) return dot(cp, cp);
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0.f && d1 >= 0.f && d3 <= 0.f) {
    float v = d1 / (d1 - d3);
    V3 q = ap - ab * v;
    return dot(q, q);
  }
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0.f && d2 >= 0.f && d6 <= 0.f) {
    float w = d2 / (d2 - d6);
    V3 q = ap - ac * w;
    return dot(q, q);
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0.f && d4 - d3 >= 0.f && d5 - d6 >= 0.f) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 q = bp - (t.c - t.b) * w;
    return dot(q, q);
  }
  float denom = va + vb + vc;
  if (denom == 0.f) {  // degenerate: best vertex
    return std::min({dot(ap, ap), dot(bp, bp), dot(cp, cp)});
  }
  float v = vb / denom, w = vc / denom;
  V3 q = ap - ab * v - ac * w;
  return dot(q, q);
}

// Strict +axis aligned ray-triangle crossing with t > 0
// (≙ `geo.rs:156-216`): 2-D edge cross products in the transverse plane.
static bool ray_hit_axis(const V3& o, const Tri& t, int axis, float* t_out) {
  const float* a = &t.a.x;
  const float* b = &t.b.x;
  const float* c = &t.c.x;
  const float* p = &o.x;
  int ix = axis, iy = (axis + 1) % 3, iz = (axis + 2) % 3;
  float p0y = p[iy] - a[iy], p0z = p[iz] - a[iz];
  float p1y = p[iy] - b[iy], p1z = p[iz] - b[iz];
  float p2y = p[iy] - c[iy], p2z = p[iz] - c[iz];
  float e12y = c[iy] - b[iy], e12z = c[iz] - b[iz];
  float e20y = a[iy] - c[iy], e20z = a[iz] - c[iz];
  float e01y = b[iy] - a[iy], e01z = b[iz] - a[iz];
  float w0 = p1z * e12y - p1y * e12z;
  float w1 = p2z * e20y - p2y * e20z;
  float w2 = p0z * e01y - p0y * e01z;
  bool inside = (w0 < 0.f && w1 < 0.f && w2 < 0.f) ||
                (w0 > 0.f && w1 > 0.f && w2 > 0.f);
  if (!inside) return false;
  float wsum = w0 + w1 + w2;
  if (wsum == 0.f) return false;
  float num = w0 * (p[ix] - a[ix]) + w1 * (p[ix] - b[ix]) + w2 * (p[ix] - c[ix]);
  float tt = -num / wsum;
  if (tt <= 0.f) return false;
  *t_out = tt;
  return true;
}

struct Bvh2 {
  struct N {
    V3 lo, hi;
    int l = -1, r = -1, first = 0, count = 0;
  };
  std::vector<N> nodes;
  std::vector<int> order;
  const std::vector<Tri>* tris = nullptr;

  void build(const std::vector<Tri>& t) {
    tris = &t;
    size_t n = t.size();
    order.resize(n);
    std::vector<V3> cent(n);
    for (size_t i = 0; i < n; ++i) {
      order[i] = (int)i;
      cent[i] = (t[i].a + t[i].b + t[i].c) * (1.f / 3.f);
    }
    nodes.reserve(2 * n / 3 + 8);
    root = rec(0, (int)n, cent);
  }
  int root = 0;

  int rec(int begin, int end, std::vector<V3>& cent) {
    int id = (int)nodes.size();
    nodes.push_back({});
    V3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
    for (int i = begin; i < end; ++i) {
      const Tri& tr = (*tris)[order[i]];
      lo = vmin(lo, vmin(tr.a, vmin(tr.b, tr.c)));
      hi = vmax(hi, vmax(tr.a, vmax(tr.b, tr.c)));
    }
    nodes[id].lo = lo;
    nodes[id].hi = hi;
    if (end - begin <= 4) {
      nodes[id].first = begin;
      nodes[id].count = end - begin;
      return id;
    }
    V3 ext = hi - lo;
    int ax = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
    int mid = (begin + end) / 2;
    std::nth_element(order.begin() + begin, order.begin() + mid,
                     order.begin() + end, [&](int l, int r) {
                       return (&cent[l].x)[ax] < (&cent[r].x)[ax];
                     });
    int l = rec(begin, mid, cent);
    int r = rec(mid, end, cent);
    nodes[id].l = l;
    nodes[id].r = r;
    return id;
  }

  // iquilezles box distance² (≙ `bvh_ext.rs:18-31`).
  static float box_dist2(const V3& p, const V3& lo, const V3& hi) {
    float dx = std::max({lo.x - p.x, 0.f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }

  // Branch-and-bound nearest distance² (≙ `bvh_ext.rs:59-168`).
  float nearest2(const V3& p) const {
    float best = 1e30f;
    nearest_rec(root, p, &best);
    return best;
  }
  void nearest_rec(int id, const V3& p, float* best) const {
    const N& nd = nodes[id];
    if (box_dist2(p, nd.lo, nd.hi) >= *best) return;
    if (nd.count) {
      for (int i = 0; i < nd.count; ++i)
        *best = std::min(*best, tri_dist2(p, (*tris)[order[nd.first + i]]));
      return;
    }
    float dl = box_dist2(p, nodes[nd.l].lo, nodes[nd.l].hi);
    float dr = box_dist2(p, nodes[nd.r].lo, nodes[nd.r].hi);
    if (dl < dr) {
      nearest_rec(nd.l, p, best);
      if (dr < *best) nearest_rec(nd.r, p, best);
    } else {
      nearest_rec(nd.r, p, best);
      if (dl < *best) nearest_rec(nd.l, p, best);
    }
  }

  // Count +axis ray crossings with t > 0 (≙ BVH traverse per axis,
  // `rtree_bvh.rs:143-159`).
  int crossings(const V3& o, int axis) const {
    int cnt = 0;
    cross_rec(root, o, axis, &cnt, nullptr);
    return cnt;
  }
  // When ts != nullptr, also collect hit parameters (grid raycast phase).
  void cross_rec(int id, const V3& o, int axis, int* cnt,
                 std::vector<float>* ts) const {
    const N& nd = nodes[id];
    const float* lo = &nd.lo.x;
    const float* hi = &nd.hi.x;
    const float* p = &o.x;
    // Ray +axis from o intersects box iff transverse coords inside and
    // box not entirely behind.
    int iy = (axis + 1) % 3, iz = (axis + 2) % 3;
    if (p[iy] < lo[iy] || p[iy] > hi[iy] || p[iz] < lo[iz] || p[iz] > hi[iz])
      return;
    if (p[axis] > hi[axis]) return;
    if (nd.count) {
      for (int i = 0; i < nd.count; ++i) {
        float t;
        if (ray_hit_axis(o, (*tris)[order[nd.first + i]], axis, &t)) {
          ++*cnt;
          if (ts) ts->push_back(t);
        }
      }
      return;
    }
    cross_rec(nd.l, o, axis, cnt, ts);
    cross_rec(nd.r, o, axis, cnt, ts);
  }
};

static double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch())
      .count();
}

static bool read_exact(void* dst, size_t n) {
  return std::fread(dst, 1, n, stdin) == n;
}

struct HeapState {  // ≙ `grid.rs:17-40` State
  float dist;
  int cell;
  int tri;
  bool operator>(const HeapState& o) const { return dist > o.dist; }
};

}  // namespace

int main() {
  uint32_t mode = 0, T = 0;
  if (!read_exact(&mode, 4) || !read_exact(&T, 4)) return 1;
  std::vector<Tri> tris(T);
  if (!read_exact(tris.data(), sizeof(Tri) * T)) return 1;

  double t0 = now_ms();
  Bvh2 bvh;
  bvh.build(tris);
  double build_ms = now_ms() - t0;

  if (mode == 0) {
    uint32_t Q = 0;
    if (!read_exact(&Q, 4)) return 1;
    std::vector<V3> qs(Q);
    if (!read_exact(qs.data(), sizeof(V3) * Q)) return 1;

    std::vector<float> out(Q);
    double t1 = now_ms();
    for (uint32_t i = 0; i < Q; ++i) {
      float d = std::sqrt(bvh.nearest2(qs[i]));
      // Best-of-3 axis parity vote (≙ `rtree_bvh.rs:143-171`).
      int odd = 0;
      for (int ax = 0; ax < 3; ++ax) odd += bvh.crossings(qs[i], ax) & 1;
      out[i] = odd >= 2 ? -d : d;
    }
    double query_ms = now_ms() - t1;
    double checksum = 0;
    for (float v : out) checksum += v;
    std::printf(
        "{\"mode\": \"query\", \"tris\": %u, \"queries\": %u, "
        "\"build_ms\": %.2f, \"query_ms\": %.2f, \"queries_per_s\": %.1f, "
        "\"checksum\": %.6f}\n",
        T, Q, build_ms, query_ms, 1000.0 * Q / query_ms, checksum);
    return 0;
  }

  // mode 1: grid — the reference's 3-phase algorithm, single-threaded.
  float first_cell[3], cell_size[3];
  uint32_t cc[3];
  if (!read_exact(first_cell, 12) || !read_exact(cell_size, 12) ||
      !read_exact(cc, 12))
    return 1;
  int nx = cc[0], ny = cc[1], nz = cc[2];
  size_t N = (size_t)nx * ny * nz;
  std::vector<float> dist(N, 1e30f);
  std::vector<int> tri_of(N, -1);
  auto cell_center = [&](int x, int y, int z) -> V3 {
    return {first_cell[0] + x * cell_size[0], first_cell[1] + y * cell_size[1],
            first_cell[2] + z * cell_size[2]};
  };
  auto flat = [&](int x, int y, int z) -> size_t {
    return ((size_t)x * ny + y) * nz + z;  // x-major (`grid.rs:122-132`)
  };

  double t1 = now_ms();
  // Phase 1: preheap — rasterize each triangle's snapped AABB ±1
  // (`grid.rs:383-456`).
  for (uint32_t t = 0; t < T; ++t) {
    V3 lo = vmin(tris[t].a, vmin(tris[t].b, tris[t].c));
    V3 hi = vmax(tris[t].a, vmax(tris[t].b, tris[t].c));
    int lc[3], hc[3];
    for (int k = 0; k < 3; ++k) {
      lc[k] = std::max(
          (int)std::floor(((&lo.x)[k] - 1e-4f - first_cell[k]) / cell_size[k]) - 1,
          0);
      hc[k] = std::min(
          (int)std::floor(((&hi.x)[k] + 1e-4f - first_cell[k]) / cell_size[k]) + 1,
          (int)cc[k] - 1);
    }
    for (int x = lc[0]; x <= hc[0]; ++x)
      for (int y = lc[1]; y <= hc[1]; ++y)
        for (int z = lc[2]; z <= hc[2]; ++z) {
          float d = std::sqrt(tri_dist2(cell_center(x, y, z), tris[t]));
          size_t i = flat(x, y, z);
          if (d < dist[i]) {
            dist[i] = d;
            tri_of[i] = (int)t;
          }
        }
  }
  double preheap_ms = now_ms() - t1;

  // Phase 2: Dijkstra-like propagation over 26-neighborhoods
  // (`grid.rs:495-558`), single binary heap.
  double t2 = now_ms();
  std::priority_queue<HeapState, std::vector<HeapState>,
                      std::greater<HeapState>>
      heap;
  for (size_t i = 0; i < N; ++i)
    if (tri_of[i] >= 0) heap.push({dist[i], (int)i, tri_of[i]});
  while (!heap.empty()) {
    HeapState s = heap.top();
    heap.pop();
    if (s.dist > dist[s.cell]) continue;  // stale
    int x = s.cell / (ny * nz), y = (s.cell / nz) % ny, z = s.cell % nz;
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          if (!dx && !dy && !dz) continue;
          int X = x + dx, Y = y + dy, Z = z + dz;
          if (X < 0 || Y < 0 || Z < 0 || X >= nx || Y >= ny || Z >= nz)
            continue;
          size_t ni = flat(X, Y, Z);
          float nd = std::sqrt(tri_dist2(cell_center(X, Y, Z), tris[s.tri]));
          if (nd < dist[ni]) {
            dist[ni] = nd;
            tri_of[ni] = s.tri;
            heap.push({nd, (int)ni, s.tri});
          }
        }
  }
  double prop_ms = now_ms() - t2;

  // Phase 3: raycast sign — one +axis ray per boundary cell of the 3
  // negative faces; every cell before each hit gets a crossing increment
  // (`grid.rs:568-641`); inside iff ≥2 axes odd.
  double t3 = now_ms();
  std::vector<uint8_t> oddc(3 * N, 0);
  std::vector<float> ts;
  for (int ax = 0; ax < 3; ++ax) {
    int nu = ax == 0 ? ny : nx;
    int nv = ax == 2 ? ny : nz;
    for (int u = 0; u < nu; ++u)
      for (int v = 0; v < nv; ++v) {
        int x = ax == 0 ? 0 : u;
        int y = ax == 0 ? u : (ax == 1 ? 0 : v);
        int z = ax == 2 ? 0 : v;
        V3 o = cell_center(x, y, z);
        ts.clear();
        int cnt = 0;
        bvh.cross_rec(bvh.root, o, ax, &cnt, &ts);
        for (float t : ts) {
          int steps = std::min((int)(t / cell_size[ax]) + 1, (int)cc[ax]);
          for (int s = 0; s < steps; ++s) {
            int X = x + (ax == 0 ? s : 0);
            int Y = y + (ax == 1 ? s : 0);
            int Z = z + (ax == 2 ? s : 0);
            oddc[ax * N + flat(X, Y, Z)] ^= 1;
          }
        }
      }
  }
  for (size_t i = 0; i < N; ++i) {
    int odd = oddc[i] + oddc[N + i] + oddc[2 * N + i];
    if (odd >= 2) dist[i] = -dist[i];
  }
  double ray_ms = now_ms() - t3;

  double total_ms = build_ms + preheap_ms + prop_ms + ray_ms;
  double checksum = 0;
  for (float v : dist) checksum += v;
  std::printf(
      "{\"mode\": \"grid\", \"tris\": %u, \"cells\": %zu, "
      "\"build_ms\": %.2f, \"preheap_ms\": %.2f, \"prop_ms\": %.2f, "
      "\"raycast_ms\": %.2f, \"total_ms\": %.2f, \"cells_per_s\": %.1f, "
      "\"checksum\": %.6f}\n",
      T, N, build_ms, preheap_ms, prop_ms, ray_ms, total_ms,
      1000.0 * N / total_ms, checksum);
  return 0;
}
