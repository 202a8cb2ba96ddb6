#!/bin/bash
# Round-3 tail batch: continue growing the ibm10-random reference
# sample set (runs 16-19; ~100 min/run single-threaded-dominant).
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
  python3 -c "import json,sys,os;print(json.dumps({'impl':'reference-cKL','circuit':os.path.basename('$circ').split('.')[0],'init':'$mode','run':int('$tag'),'initial_cut':float('$init'),'best_cut':float('$best'),'iterations':int('$iters'),'seconds':round(float('$t1')-float('$t0'),2)}))" >> "$OUT"
  cd / && rm -rf "$wd"
}
for i in 16 17 18 19; do
  run_one /root/reference/circuit/ibm10.hgr random "$i"
done
