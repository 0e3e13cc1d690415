#!/bin/bash
# Round-5 measurement campaign — decision-critical stages first so a
# tunnel loss mid-campaign still leaves the promotion decisions made.
# Each stage logs separately under docs/campaign_r05/.
set -u
cd "$(dirname "$0")/.."
LOG=docs/campaign_r05
mkdir -p "$LOG"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "    rc=$? tail: $(tail -1 "$LOG/$name.log")"
}

# 1. the K=60 emission-fold promotion decision (headline + viterbi)
run ab_msv_k60 1800 python tools/ab_lab.py msv_k60
run ab_viterbi 1800 python tools/ab_lab.py viterbi
# 2. the r5 posterior block-gating result
run ab_posterior 1200 python tools/ab_lab.py posterior
# 3. forward + schedule probes unlocked by K=60
run ab_forward 1200 python tools/ab_lab.py forward
run ab_msv_lanes 1800 python tools/ab_lab.py msv_lanes
run ab_filter2405 1800 python tools/ab_lab.py filter2405
# 4. full validation campaign over the NEW kernels
run validate_r5b 7200 python tools/validate_hw.py
# 5. the full bench (writes bench_detail.json; one compact line on stdout)
run benchfinal 7200 python bench.py
