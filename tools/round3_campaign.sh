#!/bin/bash
# Round-3 on-chip measurement campaign. Run when the TPU tunnel is live.
# Each stage logs to /tmp/r3_<stage>.log; a failed stage does not stop
# the rest (the tunnel can flake mid-campaign).
set -u
cd /root/repo
LOG=/tmp
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 "$@" >"$LOG/r3_${name}.log" 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S))"
}

# 0. wait for the tunnel (gentle: one probe / 10 min — frequent
# SIGTERMs of processes hanging on client init can themselves wedge the
# tunnel). Proceed only on a clean probe.
UP=0
for i in $(seq 1 36); do
  if timeout 180 python -c "import jax,numpy as np; print('PROBE_OK', np.asarray(jax.numpy.ones((8,8)).sum()))" 2>/dev/null; then
    UP=1; break
  fi
  echo "tunnel down, probe $i ($(date +%H:%M:%S))"
  sleep 480
done
if [ "$UP" != 1 ]; then echo "TUNNEL_NEVER_CAME_BACK"; exit 1; fi

# 1. lazy exact Viterbi: eager baseline + lazy K sweep (headline M=1400)
run chain1400 python tools/chain_lab.py --m 1400 --lazy 5,6,7 --windows 4 --reps 5
# 1b. schedule tuning at the chosen K: lane width x unroll
run chain1400w1024 python tools/chain_lab.py --m 1400 --lazy 5 --windows 4 --widest 1024 --reps 3 --skip-exact
run chain1400u8 python tools/chain_lab.py --m 1400 --lazy 5 --windows '' --unroll 8 --reps 3 --skip-exact
run chain1400u16 python tools/chain_lab.py --m 1400 --lazy 5 --windows '' --unroll 16 --reps 3 --skip-exact
# 2. other profile sizes at the auto-picked K (0 = pick_lazy_window)
run chain2405 python tools/chain_lab.py --m 2405 --lazy 4,5,6 --windows 4 --reps 3
run chain100 python tools/chain_lab.py --m 100 --lazy 3,4,5 --windows 4 --reps 3
# 3. posterior decode lab (bench shape + headline-L)
run post python tools/post_lab.py --reps 5
run post3500 python tools/post_lab.py --seq-len 3500 --batch 128 --reps 3
# 3b. truncated prob-space chain A/B (forward + posterior)
run fwdab python tools/fwd_chain_ab.py --reps 5
# 4. hardware parity campaign (24 profiles, lazy-vs-eager bitwise)
run validate python tools/validate_hw.py
# 5. full default bench -> the round's JSON artifact
run bench python bench.py

echo "CAMPAIGN_DONE"
