#!/bin/bash
# Round-4 batch 2: grow the ibm10-random reference sample to N=30
# (balances ours N=30).  Runs 26-30, ~100 min/run uncontended; this
# batch runs niced under a shared single-CPU box, so the recorded
# seconds are CONTENDED (flagged in the JSON) — only best_cut /
# initial_cut / iterations feed the equal-samples distribution rows.
#
# Robustness (ADVICE r3 #2): every grepped field is validated non-empty
# before emitting, failures log the captured output to stderr, and all
# values reach python via environment variables — nothing is spliced
# into source text.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BIN="$REPO/benchmarks/ref_build/cKL"
OUT="$REPO/benchmarks/parity_results/ref_runs.jsonl"
if [ ! -x "$BIN" ]; then
  mkdir -p "$REPO/benchmarks/ref_build"
  g++ -std=c++17 -O3 -fopenmp /root/reference/cKL.cpp -o "$BIN" || exit 1
fi
run_one() {
  local circ="$1" mode="$2" tag="$3"
  local wd; wd="$(mktemp -d)"; cd "$wd" || return 1
  ln -sf /root/reference/pre_saved_EIG pre_saved_EIG; mkdir -p results
  local args=("$circ"); [ "$mode" = "eig" ] && args+=("-EIG")
  local t0 t1 out
  t0=$(date +%s.%N); out="$("$BIN" "${args[@]}" 2>&1)"; t1=$(date +%s.%N)
  local init best iters
  init=$(echo "$out" | grep -m1 "Initial cut size" | awk -F': ' '{print $2}')
  best=$(echo "$out" | grep -m1 "Best cut size achieved" | awk -F': ' '{print $2}')
  iters=$(echo "$out" | grep -m1 "Total iterations" | awk -F': ' '{print $2}')
  if [ -z "$init" ] || [ -z "$best" ] || [ -z "$iters" ]; then
    echo "run_ref_parity8: run $tag produced unparseable output:" >&2
    echo "$out" | tail -20 >&2
    cd / && rm -rf "$wd"
    return 1
  fi
  CIRC="$circ" MODE="$mode" TAG="$tag" INIT="$init" BEST="$best" \
  ITERS="$iters" T0="$t0" T1="$t1" python3 -c '
import json, os
e = os.environ
print(json.dumps({
    "impl": "reference-cKL",
    "circuit": os.path.basename(e["CIRC"]).split(".")[0],
    "init": e["MODE"],
    "run": int(e["TAG"]),
    "initial_cut": float(e["INIT"]),
    "best_cut": float(e["BEST"]),
    "iterations": int(e["ITERS"]),
    "seconds": round(float(e["T1"]) - float(e["T0"]), 2),
    "contended": True,
}))' >> "$OUT"
  cd / && rm -rf "$wd"
}
for i in 26 27 28 29 30; do
  run_one /root/reference/circuit/ibm10.hgr random "$i" || true
done
