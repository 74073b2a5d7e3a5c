// Native routed-SpMV plan analysis: bipartite multigraph edge coloring.
//
// The TPU routed-SpMV plan (spmm_tpu/ops/kernels/spmv_routed.py) must
// assign every CSR entry a lane-row (color) within its 128-row group such
// that no two entries share a (class-sublane, color) or a (row, color)
// pair — a bipartite multigraph edge coloring with a per-group color
// budget L_g >= max degree.  This is the TPU analogue of cuSPARSE's
// milliseconds-class SpMV analysis phase (reference
// modify_src/cupy-src/cupyx/cusparse.py:1373-1438): the numpy
// greedy+repair rounds cost 1-4 s at 1M nnz, this sequential Koenig
// construction colors the same graphs in tens of milliseconds.
//
// Algorithm (Koenig's constructive proof, always succeeds when every
// node's capacity >= its degree): insert edges one at a time; give each
// the lowest color free at both endpoints; when none exists, pick color
// `a` free at the left endpoint and `b` free at the right endpoint and
// swap a<->b along the maximal ab-alternating chain from the right
// endpoint (the chain cannot reach the left endpoint, so `a` becomes
// free at both).  Free-lane lookups ride per-node bitsets (one AND +
// ctz per 64 lanes); occupant edge ids live in a CSR-offset table for
// the chain walks.  Fixed input order => deterministic output.
//
// Exposed via ctypes (no pybind11 in this image); built by
// native/build.sh or lazily by spmm_tpu/ops/kernels/_native_planner.py.

#include <cstdint>
#include <vector>

namespace {

inline int find_first_bit(const uint64_t *w, int64_t nwords) {
  for (int64_t k = 0; k < nwords; ++k)
    if (w[k]) return int(k * 64 + __builtin_ctzll(w[k]));
  return -1;
}

// Circular scan from a (hashed) start bit: first-fit-lowest keeps every
// node saturated at the low lanes, so near-tight budgets (slots/nnz
// ~1.1) made almost every insertion conflict and Kempe-repair — 55 s at
// 32M nnz.  A per-edge deterministic start spreads occupancy uniformly;
// conflicts then scale with the load factor and the same graphs color
// in linear time.  Any free lane is a valid color, so wrapping the scan
// preserves correctness (and determinism: the start is a pure function
// of the edge index).
inline int find_common_from(const uint64_t *wa, const uint64_t *wb,
                            int64_t nwords, int start) {
  const int64_t k0 = start / 64;
  uint64_t x = (wa[k0] & wb[k0]) & (~uint64_t(0) << (start % 64));
  if (x) return int(k0 * 64 + __builtin_ctzll(x));
  for (int64_t k = k0 + 1; k < nwords; ++k) {
    x = wa[k] & wb[k];
    if (x) return int(k * 64 + __builtin_ctzll(x));
  }
  for (int64_t k = 0; k <= k0; ++k) {
    x = wa[k] & wb[k];
    if (x) return int(k * 64 + __builtin_ctzll(x));
  }
  return -1;
}

}  // namespace

extern "C" {

// Color the edges (left[i], right[i]) with per-node budgets capV.
// lane_out[i] receives edge i's color in [0, capV[left[i]]).
// Node ids in [0, NV); capV[left[i]] must equal capV[right[i]] (both
// sides of a group share the budget L_g) and be >= the node degrees.
// Returns 0 on success, negative on invalid input / internal failure
// (callers fall back to the Python path).
int64_t spmm_color_edges(int64_t nnz, const int32_t *left,
                         const int32_t *right, const int32_t *capV,
                         int64_t NV, int32_t *lane_out) {
  if (nnz < 0 || NV <= 0) return -1;
  // CSR-style offsets: occupant table and bitset words per node
  std::vector<int64_t> off(NV + 1), woff(NV + 1);
  off[0] = woff[0] = 0;
  for (int64_t v = 0; v < NV; ++v) {
    int64_t c = capV[v];
    if (c < 0) return -2;
    off[v + 1] = off[v] + c;
    woff[v + 1] = woff[v] + (c + 63) / 64;
  }
  const int64_t total = off[NV], twords = woff[NV];
  if (total > (int64_t(1) << 31)) return -3;  // pathological budget

  std::vector<int32_t> occL(total, -1), occR(total, -1);
  std::vector<uint64_t> freeL(twords), freeR(twords);
  for (int64_t v = 0; v < NV; ++v) {
    int64_t c = capV[v];
    uint64_t *fl = freeL.data() + woff[v];
    uint64_t *fr = freeR.data() + woff[v];
    for (int64_t k = 0; k < (c + 63) / 64; ++k) {
      int64_t lo = k * 64;
      uint64_t w = (c - lo >= 64) ? ~uint64_t(0)
                                  : ((uint64_t(1) << (c - lo)) - 1);
      fl[k] = fr[k] = w;
    }
  }

  auto setL = [&](int32_t v, int c, int32_t e) {
    occL[off[v] + c] = e;
    freeL[woff[v] + c / 64] &= ~(uint64_t(1) << (c % 64));
  };
  auto setR = [&](int32_t v, int c, int32_t e) {
    occR[off[v] + c] = e;
    freeR[woff[v] + c / 64] &= ~(uint64_t(1) << (c % 64));
  };
  auto clearL = [&](int32_t v, int c) {
    occL[off[v] + c] = -1;
    freeL[woff[v] + c / 64] |= uint64_t(1) << (c % 64);
  };
  auto clearR = [&](int32_t v, int c) {
    occR[off[v] + c] = -1;
    freeR[woff[v] + c / 64] |= uint64_t(1) << (c % 64);
  };

  std::vector<int32_t> chain;
  chain.reserve(256);
  for (int64_t e = 0; e < nnz; ++e) {
    const int32_t l = left[e], r = right[e];
    if (l < 0 || l >= NV || r < 0 || r >= NV) return -4;
    const int64_t nw = woff[l + 1] - woff[l];
    const int cap = capV[l];
    // exact-cap equality (not just equal word count): a Kempe swap may
    // otherwise assign a color >= the smaller endpoint's budget, and
    // cap==0 would SIGFPE on the modulo below.
    if (cap != capV[r]) return -5;
    if (cap <= 0) return -2;
    const int start = int((uint64_t(e) * 2654435761u) % uint64_t(cap));
    int c = find_common_from(freeL.data() + woff[l],
                             freeR.data() + woff[r], nw, start);
    if (c >= 0) {
      lane_out[e] = c;
      setL(l, c, int32_t(e));
      setR(r, c, int32_t(e));
      continue;
    }
    const int a = find_first_bit(freeL.data() + woff[l], nw);
    const int b = find_first_bit(freeR.data() + woff[r], nw);
    if (a < 0 || b < 0) return -6;  // node saturated beyond budget
    // maximal ab-alternating chain from r (arrives at left nodes via
    // color a, right nodes via color b after the first hop)
    chain.clear();
    int32_t node = r;
    bool side_right = true;
    int col = a;
    while (true) {
      const int32_t e2 = side_right ? occR[off[node] + col]
                                    : occL[off[node] + col];
      if (e2 < 0) break;
      chain.push_back(e2);
      node = side_right ? left[e2] : right[e2];
      side_right = !side_right;
      col = (col == a) ? b : a;
    }
    // swap a<->b along the chain: remove all, then re-add recolored
    // (mirrors the two-pass numpy Kempe repair — a one-pass update
    // would transiently collide on multi-edges)
    for (int32_t e2 : chain) {
      const int oc = lane_out[e2];
      clearL(left[e2], oc);
      clearR(right[e2], oc);
    }
    for (int32_t e2 : chain) {
      const int nc = (lane_out[e2] == a) ? b : a;
      lane_out[e2] = nc;
      setL(left[e2], nc, e2);
      setR(right[e2], nc, e2);
    }
    if (occL[off[l] + a] >= 0 || occR[off[r] + a] >= 0)
      return -7;  // chain reached l — cannot happen on valid input
    lane_out[e] = a;
    setL(l, a, int32_t(e));
    setR(r, a, int32_t(e));
  }
  return 0;
}

// Grouped cumulative count: seq_out[i] = #{j < i : key[j] == key[i]}.
// Replaces the O(nnz log nnz) argsort-based rank in the plan builder
// (its single biggest numpy cost at 1M nnz) with one O(nnz) pass.
// Returns 0 on success, negative on out-of-range keys.
int64_t spmm_cumcount(int64_t nnz, const int32_t *key, int64_t nkeys,
                      int32_t *seq_out) {
  if (nnz < 0 || nkeys <= 0) return -1;
  std::vector<int32_t> cnt(nkeys, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    const int32_t k = key[i];
    if (k < 0 || k >= nkeys) return -2;
    seq_out[i] = cnt[k]++;
  }
  return 0;
}

}  // extern "C"
