// Native runtime components: .hgr loader and clique-expansion graph
// builder.
//
// TPU-native counterpart of the reference's C++ host-side layer (the
// parsers at cKL.cpp:84-149 / gKL.cu:573-666 and the pair-expansion
// loops at cEIG.cpp:104-121).  The Python layer (eig_kl_tpu.io.native_io)
// binds these via ctypes; a NumPy fallback produces identical results.
//
// Design: single-pass mmap-free tokenizer for .hgr, then a two-phase
// expansion -- (1) exact per-node slot counting, (2) parallel directed
// pair emission -- followed by per-row sort + duplicate merge into the
// final symmetric CSR.  OpenMP over nets/rows mirrors the reference's
// threading but with deterministic output (no omp-critical getline
// nondeterminism like gKL.cu:607-613).
//
// Build: make -C native  (produces libeigkl.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Bumped on ANY exported-signature or layout-contract change (e.g. the
// ekl_build_plan_v2 q_min argument, slot-grid rounding).  io/native_io.py
// refuses a library whose version differs and rebuilds -- a stale .so
// would otherwise silently misinterpret arguments.
int64_t ekl_abi_version(void) { return 5; }

typedef struct {
  int64_t num_nets;
  int64_t num_nodes;
  int64_t num_pins;
  int32_t* pins;         // 0-based node ids, concatenated per net
  int64_t* net_offsets;  // num_nets + 1
  int32_t status;        // 0 ok, nonzero = error code
} EklHgr;

typedef struct {
  int64_t n;
  int64_t nnz;
  int64_t* indptr;   // n + 1
  int32_t* indices;  // nnz, sorted within row
  double* data;      // nnz
  int32_t status;
} EklCsr;

// ---------------------------------------------------------------------
// .hgr loader
// ---------------------------------------------------------------------

EklHgr* ekl_read_hgr(const char* path) {
  EklHgr* out = new EklHgr();
  std::memset(out, 0, sizeof(EklHgr));

  FILE* f = std::fopen(path, "rb");
  if (!f) {
    out->status = 1;
    return out;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf[got] = '\0';

  const char* p = buf.data();
  const char* end = p + got;

  auto skip_ws_inline = [&](const char*& q) {
    while (q < end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
  };
  auto parse_int = [&](const char*& q, int64_t& val) -> bool {
    skip_ws_inline(q);
    if (q >= end || *q < '0' || *q > '9') return false;
    int64_t v = 0;
    while (q < end && *q >= '0' && *q <= '9') v = v * 10 + (*q++ - '0');
    val = v;
    return true;
  };

  int64_t num_nets = 0, num_nodes = 0;
  if (!parse_int(p, num_nets) || !parse_int(p, num_nodes)) {
    out->status = 2;
    return out;
  }
  // advance to end of header line
  while (p < end && *p != '\n') p++;
  if (p < end) p++;

  std::vector<int32_t> pins;
  pins.reserve(static_cast<size_t>(num_nets) * 3);
  std::vector<int64_t> offsets(static_cast<size_t>(num_nets) + 1, 0);

  for (int64_t i = 0; i < num_nets; i++) {
    int64_t v;
    while (true) {
      skip_ws_inline(p);
      if (p >= end || *p == '\n') break;
      if (!parse_int(p, v)) {
        out->status = 3;
        return out;
      }
      if (v < 1 || v > num_nodes) {
        out->status = 4;
        return out;
      }
      pins.push_back(static_cast<int32_t>(v - 1));  // 0-based (cEIG.cpp:99)
    }
    offsets[i + 1] = static_cast<int64_t>(pins.size());
    if (p < end) p++;  // consume newline
  }

  out->num_nets = num_nets;
  out->num_nodes = num_nodes;
  out->num_pins = static_cast<int64_t>(pins.size());
  out->pins = new int32_t[pins.size() ? pins.size() : 1];
  std::memcpy(out->pins, pins.data(), pins.size() * sizeof(int32_t));
  out->net_offsets = new int64_t[num_nets + 1];
  std::memcpy(out->net_offsets, offsets.data(),
              (num_nets + 1) * sizeof(int64_t));
  return out;
}

void ekl_free_hgr(EklHgr* h) {
  if (!h) return;
  delete[] h->pins;
  delete[] h->net_offsets;
  delete h;
}

// ---------------------------------------------------------------------
// Clique expansion -> deduplicated symmetric CSR
// ---------------------------------------------------------------------

// mode 0: w = 2/k (cEIG.cpp:110); mode 1: w = 1/(k-1) (cKL.cpp:117).
EklCsr* ekl_clique_expand(int64_t num_nodes, int64_t num_nets,
                          const int32_t* pins, const int64_t* net_offsets,
                          int32_t mode) {
  EklCsr* out = new EklCsr();
  std::memset(out, 0, sizeof(EklCsr));
  out->n = num_nodes;

  // Phase 1: raw slot count per node (each member of a k-pin net emits
  // k-1 directed entries; nets with k < 2 emit nothing, gKL.cu:622).
  std::vector<int64_t> raw_count(static_cast<size_t>(num_nodes) + 1, 0);
  for (int64_t i = 0; i < num_nets; i++) {
    int64_t k = net_offsets[i + 1] - net_offsets[i];
    if (k < 2) continue;
    for (int64_t j = net_offsets[i]; j < net_offsets[i + 1]; j++)
      raw_count[static_cast<size_t>(pins[j]) + 1] += k - 1;
  }
  for (int64_t i = 0; i < num_nodes; i++) raw_count[i + 1] += raw_count[i];
  const int64_t raw_nnz = raw_count[num_nodes];

  std::vector<int32_t> raw_idx(static_cast<size_t>(raw_nnz));
  std::vector<double> raw_w(static_cast<size_t>(raw_nnz));
  std::vector<std::atomic<int64_t>> cursor(static_cast<size_t>(num_nodes));
  for (int64_t i = 0; i < num_nodes; i++)
    cursor[i].store(raw_count[i], std::memory_order_relaxed);

  // Phase 2: emit directed pairs in parallel; per-slot reservation via
  // atomic cursors keeps this race-free and (modulo within-row order,
  // which the later sort canonicalizes) deterministic.
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < num_nets; i++) {
    int64_t k = net_offsets[i + 1] - net_offsets[i];
    if (k < 2) continue;
    double w = (mode == 0) ? 2.0 / static_cast<double>(k)
                           : 1.0 / static_cast<double>(k - 1);
    for (int64_t a = net_offsets[i]; a < net_offsets[i + 1]; a++) {
      for (int64_t b = a + 1; b < net_offsets[i + 1]; b++) {
        int32_t u = pins[a], v = pins[b];
        if (u == v) {
          // Repeated pin within one net: drop (matches the Python
          // path; well-formed circuits never hit this).  Both slots
          // were counted, so park zero-weight self entries that the
          // merge phase drops.
        }
        int64_t su = cursor[u].fetch_add(1, std::memory_order_relaxed);
        int64_t sv = cursor[v].fetch_add(1, std::memory_order_relaxed);
        raw_idx[su] = v;
        raw_w[su] = (u == v) ? 0.0 : w;
        raw_idx[sv] = u;
        raw_w[sv] = (u == v) ? 0.0 : w;
      }
    }
  }

  // Phase 3: per-row sort + duplicate merge.
  std::vector<int64_t> row_nnz(static_cast<size_t>(num_nodes), 0);
#pragma omp parallel
  {
    std::vector<std::pair<int32_t, double>> scratch;
#pragma omp for schedule(dynamic, 256)
    for (int64_t r = 0; r < num_nodes; r++) {
      int64_t lo = raw_count[r], hi = raw_count[r + 1];
      scratch.clear();
      for (int64_t j = lo; j < hi; j++) {
        if (raw_idx[j] == r) continue;  // drop self-loops
        scratch.emplace_back(raw_idx[j], raw_w[j]);
      }
      // Weight as tie-breaker: duplicate (u,v) entries from different
      // nets arrive in thread-scheduling order; sorting on (idx, w)
      // makes the merge summation order -- hence the fp result --
      // fully run-to-run deterministic.
      std::sort(scratch.begin(), scratch.end());
      int64_t m = 0;
      for (size_t j = 0; j < scratch.size(); j++) {
        if (m > 0 && scratch[m - 1].first == scratch[j].first) {
          scratch[m - 1].second += scratch[j].second;
        } else {
          scratch[m++] = scratch[j];
        }
      }
      // Compact merged row back into the raw arrays (prefix of the row).
      for (int64_t j = 0; j < m; j++) {
        raw_idx[lo + j] = scratch[j].first;
        raw_w[lo + j] = scratch[j].second;
      }
      row_nnz[r] = m;
    }
  }

  out->indptr = new int64_t[num_nodes + 1];
  out->indptr[0] = 0;
  for (int64_t r = 0; r < num_nodes; r++)
    out->indptr[r + 1] = out->indptr[r] + row_nnz[r];
  out->nnz = out->indptr[num_nodes];
  out->indices = new int32_t[out->nnz ? out->nnz : 1];
  out->data = new double[out->nnz ? out->nnz : 1];
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < num_nodes; r++) {
    int64_t src = raw_count[r], dst = out->indptr[r];
    std::memcpy(out->indices + dst, raw_idx.data() + src,
                row_nnz[r] * sizeof(int32_t));
    std::memcpy(out->data + dst, raw_w.data() + src,
                row_nnz[r] * sizeof(double));
  }
  return out;
}

void ekl_free_csr(EklCsr* c) {
  if (!c) return;
  delete[] c->indptr;
  delete[] c->indices;
  delete[] c->data;
  delete c;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------
// SpMV chunk-plan builders (host planners for the Pallas kernels).
//
// The Python planners (eig_kl_tpu/ops/spmv_pallas.py) are a chain of
// NumPy passes (lexsort / unique / fancy indexing) that cost tens of
// seconds at 2M+ nnz on this host's single core.  These native
// builders exploit two facts: (1) entries arrive in CSR order, i.e.
// already sorted by (row, col), and (2) bucket keys are small dense
// integers -- so a *stable counting sort* by bucket preserves the
// required row-order within each bucket and the whole plan fills in
// O(nnz + buckets) single-threaded passes.
// ---------------------------------------------------------------------

static const int64_t KW = 1024;   // x-window / column block
static const int64_t KRB = 512;   // v2 y-window rows
static const int64_t KCH = 512;   // slots per chunk

static inline int64_t round_up_i64(int64_t x, int64_t m) {
  return (x + m - 1) / m * m;
}

typedef struct {
  // v1 arrays
  int32_t* cw8;        // [C]
  int32_t* rw8;        // [C]
  int16_t* col_local;  // [C*512]
  int16_t* row_local;  // [C*512]
  float* weights;      // [C*512]
  int16_t* route_src;  // [C*1024]
  int64_t num_chunks;
  int64_t padded_nodes;
  int32_t status;
} EklPlanV1;

typedef struct {
  int16_t* col_local;  // [S1]
  float* weights;      // [S1]
  int16_t* rl_t;       // [C2p*512]
  int32_t* rb_of;      // [C2p]
  int64_t s1;
  int64_t c2p;
  int64_t q;
  int64_t n_cb;
  int64_t n_rbp;
  int64_t g1;
  int64_t g2;
  int64_t padded_nodes;
  // bucket-overflow tail as COO (handled by a v1 plan on the Python side)
  int64_t tail_nnz;
  int32_t* tail_rows;
  int32_t* tail_cols;
  float* tail_w;
  int32_t status;
} EklPlanV2;

EklPlanV1* ekl_build_plan_v1(int64_t n, int64_t nnz, const int32_t* rows,
                             const int32_t* cols, const double* w) {
  EklPlanV1* out = new EklPlanV1();
  std::memset(out, 0, sizeof(EklPlanV1));
  int64_t P = round_up_i64(n > 0 ? n : 1, KW);
  out->padded_nodes = P;
  int64_t n_cb = P / KW;
  int64_t nrw = P / KW;
  int64_t nkeys = n_cb * nrw;

  // Pass 1: counts per (stripe, aligned+clamped row window).
  std::vector<int64_t> counts(nkeys, 0);
  std::vector<int64_t> keybuf(nnz);
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t rwb = rows[i] / KW * KW;
    if (rwb > P - KW) rwb = P - KW;
    int64_t k = (int64_t)(cols[i] / KW) * nrw + rwb / KW;
    keybuf[i] = k;
    counts[k]++;
  }
  // Chunk layout per key group.
  std::vector<int64_t> chunk0(nkeys + 1, 0);  // first chunk id of group
  int64_t C = 0;
  for (int64_t k = 0; k < nkeys; ++k) {
    chunk0[k] = C;
    if (counts[k]) C += (counts[k] + KCH - 1) / KCH;
  }
  chunk0[nkeys] = C;
  out->num_chunks = C;
  out->cw8 = new int32_t[C];
  out->rw8 = new int32_t[C];
  out->col_local = new int16_t[C * KCH]();
  out->row_local = new int16_t[C * KCH]();
  out->weights = new float[C * KCH]();
  out->route_src = new int16_t[C * KW];
  std::fill(out->route_src, out->route_src + C * KW, (int16_t)-1);

  // Pass 2: stable fill in CSR order (row-sorted within each group).
  std::vector<int64_t> cursor(nkeys, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t k = keybuf[i];
    int64_t pos = cursor[k]++;
    int64_t c = chunk0[k] + pos / KCH;
    int64_t p = pos % KCH;
    int64_t stripe = k / nrw;
    int64_t rwb = (k % nrw) * KW;
    out->cw8[c] = (int32_t)(stripe * (KW / 128));
    out->rw8[c] = (int32_t)(rwb / 128);
    out->col_local[c * KCH + p] = (int16_t)(cols[i] - stripe * KW);
    out->row_local[c * KCH + p] = (int16_t)(rows[i] - rwb);
    out->weights[c * KCH + p] = (float)w[i];
  }
  // Pass 3: pad row_local beyond each chunk's fill with the last real
  // value, and mark segment-last positions in the routing map.
  for (int64_t k = 0; k < nkeys; ++k) {
    int64_t cnt = counts[k];
    if (!cnt) continue;
    int64_t nch = (cnt + KCH - 1) / KCH;
    for (int64_t j = 0; j < nch; ++j) {
      int64_t c = chunk0[k] + j;
      int64_t fill = (j == nch - 1) ? (cnt - j * KCH) : KCH;
      int16_t last = out->row_local[c * KCH + fill - 1];
      for (int64_t p = fill; p < KCH; ++p)
        out->row_local[c * KCH + p] = last;
      for (int64_t p = 0; p < KCH; ++p) {
        int16_t rl = out->row_local[c * KCH + p];
        if (p == KCH - 1 || out->row_local[c * KCH + p + 1] != rl)
          out->route_src[c * KW + rl] = (int16_t)p;
      }
    }
  }
  return out;
}

EklPlanV2* ekl_build_plan_v2(int64_t n, int64_t nnz, const int32_t* rows,
                             const int32_t* cols, const double* w,
                             int64_t q_min, int64_t rblock,
                             int64_t q_force) {
  // q_min: lower bound on the bucket quantum (0 = automatic).  Callers
  // raise it when the overflow tail comes back pathologically large
  // (clique-structured rows at multi-million-node scale overflow the
  // lam-derived Q, and a huge tail blows the v1 plan's SMEM arrays).
  // rblock: y-window rows per row-block (0 = the historical 512); the
  // caller coarsens it at multi-million-node scale so the dense bucket
  // grid stays ~nnz-sized (see ops/spmv_pallas.py build_plan_v2).
  // q_force: exact bucket quantum (0 = the lam*1.5 rule below).  The
  // caller's exact-spill geometry search (build_plan_v2 in Python)
  // picks (rblock, Q) from the true bucket histogram; the rule here
  // snaps Q to >= 1.5x the MEAN occupancy, which at coarse row-blocks
  // wastes ~2x slot padding the search can avoid.  q_min still wins
  // over q_force (the pathological-tail retry loop doubles q_min).
  if (rblock <= 0) rblock = KRB;
  EklPlanV2* out = new EklPlanV2();
  std::memset(out, 0, sizeof(EklPlanV2));
  int64_t P = round_up_i64(n > 0 ? n : 1, KW);
  out->padded_nodes = P;
  int64_t n_cb = P / KW;
  // ceil: P is a KW multiple but not necessarily an rblock multiple;
  // a floor here lets rows/rblock index one past the bucket grid.
  int64_t n_rb = (P + rblock - 1) / rblock;
  double lam = nnz > 0 ? (double)nnz / (double)(n_cb * n_rb) : 1.0;
  if (lam < 1.0) lam = 1.0;
  int64_t Q = 4;
  if (q_force >= 4 && q_force <= 512 && (q_force & (q_force - 1)) == 0) {
    Q = q_force;
  } else {
    while (Q < 512 && (double)Q < lam * 1.5) Q *= 2;
  }
  while (Q < q_min && Q < 512) Q *= 2;
  int64_t per = KCH / Q > 0 ? KCH / Q : 1;
  // g1/128 must be a whole number of 16-row tiles so the gather pass
  // can emit (16,128)-tiled bf16 blocks (also satisfies the 8-row f32
  // granularity).
  int64_t rb_round = per > 2048 / Q ? per : 2048 / Q;
  int64_t n_rbp = round_up_i64(n_rb, rb_round);
  int64_t g1 = n_rbp * Q;
  int64_t g2 = round_up_i64(n_cb * Q, KCH);
  int64_t S1 = n_cb * g1;
  int64_t C2 = n_rbp * g2 / KCH;
  int64_t C2p = round_up_i64(C2, 64);  // 8 sub-chunks x GB2=8 grid batch
  out->q = Q;
  out->n_cb = n_cb;
  out->n_rbp = n_rbp;
  out->g1 = g1;
  out->g2 = g2;
  out->s1 = S1;
  out->c2p = C2p;

  out->col_local = new int16_t[S1]();
  out->weights = new float[S1]();
  out->rl_t = new int16_t[C2p * KCH];
  std::fill(out->rl_t, out->rl_t + C2p * KCH, (int16_t)-1);
  out->rb_of = new int32_t[C2p]();
  for (int64_t c = 0; c < C2; ++c)
    out->rb_of[c] = (int32_t)(c / (g2 / KCH));

  // Bucket ranks in one stable pass over CSR order (row-sorted within
  // each bucket by construction).
  std::vector<int32_t> rank(n_cb * n_rb, 0);
  std::vector<int32_t> trow, tcol;
  std::vector<float> tw;
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t cb = cols[i] / KW;
    int64_t rb = rows[i] / rblock;
    int32_t r = rank[cb * n_rb + rb]++;
    if (r < Q) {
      int64_t slot = cb * g1 + rb * Q + r;
      out->col_local[slot] = (int16_t)(cols[i] - cb * KW);
      out->weights[slot] = (float)w[i];
      // transposed pass-2 position: (rb, cb*Q + r) with row stride g2
      out->rl_t[rb * g2 + cb * Q + r] = (int16_t)(rows[i] - rb * rblock);
    } else {
      trow.push_back(rows[i]);
      tcol.push_back(cols[i]);
      tw.push_back((float)w[i]);
    }
  }
  out->tail_nnz = (int64_t)trow.size();
  if (out->tail_nnz) {
    out->tail_rows = new int32_t[out->tail_nnz];
    out->tail_cols = new int32_t[out->tail_nnz];
    out->tail_w = new float[out->tail_nnz];
    std::memcpy(out->tail_rows, trow.data(), trow.size() * 4);
    std::memcpy(out->tail_cols, tcol.data(), tcol.size() * 4);
    std::memcpy(out->tail_w, tw.data(), tw.size() * 4);
  }
  return out;
}

void ekl_free_plan_v1(EklPlanV1* p) {
  if (!p) return;
  delete[] p->cw8;
  delete[] p->rw8;
  delete[] p->col_local;
  delete[] p->row_local;
  delete[] p->weights;
  delete[] p->route_src;
  delete p;
}

void ekl_free_plan_v2(EklPlanV2* p) {
  if (!p) return;
  delete[] p->col_local;
  delete[] p->weights;
  delete[] p->rl_t;
  delete[] p->rb_of;
  delete[] p->tail_rows;
  delete[] p->tail_cols;
  delete[] p->tail_w;
  delete p;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------
// Benes network routing.
//
// A Benes network on N = 2^m elements realizes ANY permutation with
// 2m-1 stages of 2:2 switches; stage s has distance d_s (N/2, N/4,
// ..., 2, 1, 2, ..., N/2) and swaps positions p and p^d_s where the
// stage's per-position bit is set (bits are set on BOTH partners of a
// swapped pair, so a kernel only tests its own position).  The SpMV
// v3 pipeline uses it to move gathered edge values from column-sorted
// to row-sorted order entirely with vector shifts + selects -- the
// one data movement a sparse matvec cannot window away.
//
// ekl_benes_route computes switch bits for the SCATTER semantics
//   out[dest[j]] = in[j]
// by the classic recursive 2-coloring of constraint cycles (iterative
// over levels).  masks: (2m-1) rows of N/32 little-endian uint32
// words, caller-allocated and zeroed.
// ---------------------------------------------------------------------

static inline void set_bit(uint32_t* bits, int64_t p) {
  bits[p >> 5] |= 1u << (p & 31);
}

// Route one sub-block of size M = 2*half starting at absolute
// position `base`.  dest: block-relative destinations (size M),
// overwritten garbage; dest_out: the two half-size sub-permutations
// (top at [0,half), bottom at [half,M)).
static void benes_block(int64_t base, int64_t half, const int32_t* dest,
                        int32_t* dest_out, int32_t* color, int32_t* inv,
                        uint32_t* first_bits, uint32_t* last_bits) {
  const int64_t M = 2 * half;
  for (int64_t j = 0; j < M; ++j) inv[dest[j]] = (int32_t)j;
  std::fill(color, color + M, -1);
  for (int64_t start = 0; start < M; ++start) {
    if (color[start] != -1) continue;
    int64_t j = start;
    while (color[j] == -1) {
      color[j] = 0;
      int64_t jp = j ^ half;          // input partner -> other subnet
      color[jp] = 1;
      // jp's output-switch mate must route through subnet 0.
      j = inv[dest[jp] ^ half];
    }
  }
  for (int64_t j = 0; j < M; ++j) {
    int32_t c = color[j];
    int64_t d = dest[j];
    // Sub-permutation: enters subnet c at (j % half), must exit at
    // (d % half).
    dest_out[(int64_t)c * half + (j % half)] = (int32_t)(d % half);
    if (j < half && c == 1) {
      // First stage: slot j routed to the bottom subnet -> swap.
      set_bit(first_bits, base + j);
      set_bit(first_bits, base + j + half);
    }
    // Last stage: top subnet exits to output (d%half) when unswapped;
    // swap needed iff the element's subnet disagrees with its output
    // half.
    if ((d >= half) == (c == 0)) {
      set_bit(last_bits, base + (d % half));
      // both partners (idempotent under the constraint pairing)
      set_bit(last_bits, base + (d % half) + half);
    }
  }
}

int32_t ekl_benes_route(int64_t N, const int32_t* dest, uint32_t* masks) {
  int64_t m = 0;
  while ((1LL << m) < N) ++m;
  if ((1LL << m) != N || N < 2) return 1;
  const int64_t stages = 2 * m - 1;
  const int64_t words = N / 32;
  std::vector<int32_t> cur(dest, dest + N), nxt(N);
  std::vector<int32_t> color(N), inv(N);
  for (int64_t lev = 0; lev < m - 1; ++lev) {
    const int64_t M = N >> lev;
    const int64_t half = M / 2;
    uint32_t* fb = masks + lev * words;
    uint32_t* lb = masks + (stages - 1 - lev) * words;
    for (int64_t b = 0; b < (1LL << lev); ++b) {
      benes_block(b * M, half, cur.data() + b * M, nxt.data() + b * M,
                  color.data(), inv.data(), fb, lb);
    }
    std::swap(cur, nxt);
  }
  // Middle stage: blocks of size 2; swap iff the pair is crossed.
  uint32_t* mb = masks + (m - 1) * words;
  for (int64_t p = 0; p < N; p += 2) {
    if (cur[p] == 1) {
      set_bit(mb, p);
      set_bit(mb, p + 1);
    }
  }
  return 0;
}

}  // extern "C"
