#!/bin/bash
# Round-3 batch #2: push the ibm10-random reference sample set from
# N=14 toward the N=30 protocol used everywhere else (~72 min/run on
# this host's single core). cKL runs niced so the batch yields to
# interactive work.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/benchmarks/parity_results/ref_runs.jsonl"
FAIL="$REPO/benchmarks/parity_results/ref_runs_failures.log"
run_one() {
  local circ="$1" mode="$2" tag="$3"
  local wd; wd="$(mktemp -d)"; cd "$wd" || return 1
  ln -sf /root/reference/pre_saved_EIG pre_saved_EIG; mkdir -p results
  local args=("$circ"); [ "$mode" = "eig" ] && args+=("-EIG")
  local t0 t1 out
  t0=$(date +%s.%N); out="$(nice -n 19 "$REPO/benchmarks/ref_build/cKL" "${args[@]}" 2>&1)"; t1=$(date +%s.%N)
  local init best iters
  init=$(echo "$out" | grep -m1 "Initial cut size" | awk -F': ' '{print $2}')
  best=$(echo "$out" | grep -m1 "Best cut size achieved" | awk -F': ' '{print $2}')
  iters=$(echo "$out" | grep -m1 "Total iterations" | awk -F': ' '{print $2}')
  if [ -z "$init" ] || [ -z "$best" ] || [ -z "$iters" ]; then
    # Record the failure instead of crashing float('') and silently
    # losing a ~72-minute run from the sample set.
    {
      echo "==== $(date -Is) $circ $mode run=$tag FAILED to parse; output:"
      echo "$out" | tail -20
    } >> "$FAIL"
    cd / && rm -rf "$wd"; return 1
  fi
  python3 -c "import json,sys,os;print(json.dumps({'impl':'reference-cKL','circuit':os.path.basename('$circ').split('.')[0],'init':'$mode','run':int('$tag'),'initial_cut':float('$init'),'best_cut':float('$best'),'iterations':int('$iters'),'seconds':round(float('$t1')-float('$t0'),2)}))" >> "$OUT"
  cd / && rm -rf "$wd"
}
for i in $(seq 15 30); do
  run_one /root/reference/circuit/ibm10.hgr random "$i"
done
