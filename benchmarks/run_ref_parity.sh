#!/bin/bash
# Run the reference CPU KL binary (cKL.cpp, built with plain g++ -fopenmp)
# on the shipped benchmark circuits and append one JSON line per run to
# benchmarks/parity_results/ref_runs.jsonl.  Random-init runs use the
# binary's own random_device RNG (cKL.cpp:178-180 -- not externally
# seedable), so each invocation is an independent sample; EIG-init runs
# are deterministic (init read from pre_saved_EIG, cKL.cpp:155-174) and
# need one run each.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BIN="$REPO/benchmarks/ref_build/cKL"
OUT="$REPO/benchmarks/parity_results/ref_runs.jsonl"
mkdir -p "$REPO/benchmarks/parity_results"

if [ ! -x "$BIN" ]; then
  g++ -std=c++17 -O3 -fopenmp /root/reference/cKL.cpp -o "$BIN" || exit 1
fi

run_one() {  # circuit_path mode(run#)
  local circ="$1" mode="$2" tag="$3"
  local wd; wd="$(mktemp -d)"
  cd "$wd" || return 1
  ln -sf /root/reference/pre_saved_EIG pre_saved_EIG
  mkdir -p results
  local args=("$circ")
  [ "$mode" = "eig" ] && args+=("-EIG")
  local t0 t1 out
  t0=$(date +%s.%N)
  out="$("$BIN" "${args[@]}" 2>&1)"
  t1=$(date +%s.%N)
  local init best iters
  init=$(echo "$out" | grep -m1 "Initial cut size" | awk -F': ' '{print $2}')
  best=$(echo "$out" | grep -m1 "Best cut size achieved" | awk -F': ' '{print $2}')
  iters=$(echo "$out" | grep -m1 "Total iterations" | awk -F': ' '{print $2}')
  python3 - "$circ" "$mode" "$tag" "$init" "$best" "$iters" "$t0" "$t1" <<'EOF' >> "$OUT"
import json, sys, os
c, m, tag, init, best, iters, t0, t1 = sys.argv[1:]
print(json.dumps({
    "impl": "reference-cKL", "circuit": os.path.basename(c).split(".")[0],
    "init": m, "run": int(tag),
    "initial_cut": float(init), "best_cut": float(best),
    "iterations": int(iters), "seconds": round(float(t1) - float(t0), 2),
}))
EOF
  cd / && rm -rf "$wd"
}

C=/root/reference/circuit
for i in $(seq 0 9); do run_one "$C/fract.hgr" random "$i"; done
run_one "$C/fract.hgr" eig 0
run_one "$C/ibm01.hgr" eig 0
run_one "$C/industry2.hgr" eig 0
for i in $(seq 0 2); do run_one "$C/ibm01.hgr" random "$i"; done
for i in $(seq 0 2); do run_one "$C/industry2.hgr" random "$i"; done
run_one "$C/ibm10.hgr" eig 0
echo "done" >> "$OUT.status"
