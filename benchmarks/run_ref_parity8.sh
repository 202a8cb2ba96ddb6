#!/bin/bash
# Round-4 batch: grow the ibm10-random reference sample set to N>=24
# (runs 18-25; ~70-130 min/run).  Hardened per ADVICE r3: grep results
# are validated before the JSON emit (a format drift or crash logs an
# error to stderr instead of silently dropping a ~2 h run), and values
# reach python via the environment instead of source-text splicing.
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
    cd / && rm -rf "$wd"; return 1
  fi
  RP_CIRC="$circ" RP_MODE="$mode" RP_TAG="$tag" RP_INIT="$init" \
  RP_BEST="$best" RP_ITERS="$iters" RP_T0="$t0" RP_T1="$t1" \
  python3 - >> "$OUT" <<'PY'
import json, os
e = os.environ
print(json.dumps({
    "impl": "reference-cKL",
    "circuit": os.path.basename(e["RP_CIRC"]).split(".")[0],
    "init": e["RP_MODE"],
    "run": int(e["RP_TAG"]),
    "initial_cut": float(e["RP_INIT"]),
    "best_cut": float(e["RP_BEST"]),
    "iterations": int(e["RP_ITERS"]),
    "seconds": round(float(e["RP_T1"]) - float(e["RP_T0"]), 2),
}))
PY
  cd / && rm -rf "$wd"
}
for i in 18 19 20 21 22 23 24 25; do
  run_one /root/reference/circuit/ibm10.hgr random "$i" || true
done
