#!/bin/bash
# Follow-up batch: more random-init reference samples (waits for the
# first batch to finish so the single core isn't shared).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
while [ ! -f "$REPO/benchmarks/parity_results/ref_runs.jsonl.status" ]; do sleep 60; done
run_one() {
  local circ="$1" mode="$2" tag="$3"
  local wd; wd="$(mktemp -d)"; cd "$wd" || return 1
  ln -sf /root/reference/pre_saved_EIG pre_saved_EIG; mkdir -p results
  local args=("$circ"); [ "$mode" = "eig" ] && args+=("-EIG")
  local t0 t1 out
  t0=$(date +%s.%N); out="$("$REPO/benchmarks/ref_build/cKL" "${args[@]}" 2>&1)"; t1=$(date +%s.%N)
  local init best iters
  init=$(echo "$out" | grep -m1 "Initial cut size" | awk -F': ' '{print $2}')
  best=$(echo "$out" | grep -m1 "Best cut size achieved" | awk -F': ' '{print $2}')
  iters=$(echo "$out" | grep -m1 "Total iterations" | awk -F': ' '{print $2}')
  python3 -c "import json,sys,os;print(json.dumps({'impl':'reference-cKL','circuit':os.path.basename('$circ').split('.')[0],'init':'$mode','run':int('$tag'),'initial_cut':float('$init'),'best_cut':float('$best'),'iterations':int('$iters'),'seconds':round(float('$t1')-float('$t0'),2)}))" >> "$REPO/benchmarks/parity_results/ref_runs.jsonl"
  cd / && rm -rf "$wd"
}
C=/root/reference/circuit
for i in $(seq 3 9); do run_one "$C/ibm01.hgr" random "$i"; done
for i in $(seq 3 9); do run_one "$C/industry2.hgr" random "$i"; done
run_one "$C/ibm10.hgr" random 0
echo done >> "$REPO/benchmarks/parity_results/ref_runs2.status"
