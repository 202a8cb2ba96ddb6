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
