#!/bin/bash
# Round-4 real-chip measurement runbook (see PARITY.md "Round-4 real-chip
# measurements"). Run ONCE, sequentially, as soon as the axon tunnel is back:
#
#   bash scripts/run_r4_chip_runbook.sh [outdir]
#
# Rules encoded here (hard-won, CLAUDE.md):
#  - strictly sequential — the remote compile server serializes jobs, and a
#    killed client does NOT cancel its server-side compile;
#  - generous timeouts sized to measured compile times (full-Wolfe 2level512
#    ~6-7 min, lab demo ~5 bucket compiles x ~8 min);
#  - every harness syncs by scalar fetch and excludes compiles from its
#    timed window (implemented inside each harness, not here);
#  - after any timeout-kill, later numbers are suspect — the log marks it.
set -u
OUT=${1:-/tmp/r4_runbook}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

log() { echo "[runbook $(date -u +%H:%M:%S)] $*" | tee -a "$OUT/runbook.log"; }

run_step() {
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  if [ -n "${RUNBOOK_DRY:-}" ]; then
    log "DRY   $name (skipped: RUNBOOK_DRY set)"
    return 0
  fi
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"; then
    log "DONE  $name in $((SECONDS - t0))s"
  else
    local rc=$?
    log "FAIL  $name rc=$rc after $((SECONDS - t0))s (124 = timeout; the"
    log "      server may keep compiling — waiting 300s before the next step)"
    sleep 300
  fi
}

# 1. Headline bench (3level1024 Adam bf16, r4 timed-window protocol).
run_step bench_headline 1800 python bench.py

# 2. Online batching A/B: 4 concurrent 1level256 Adam jobs,
#    semaphore executor vs online batching executor (VERDICT #1, >=3x).
run_step online_serving 3600 python scripts/exp_online_serving.py --jobs 4 --iters 200

# 3. Wall-clock to converged image at 512 (VERDICT #2).
run_step time_to_target 5400 python scripts/time_to_target.py --size 512 --out "$OUT/ttt512.json"

# 4. Full 20-pair lab demo product drive (VERDICT #7). --retries 1
#    (passed through to astt-lab) re-runs a bucket once if a transient
#    TPU-worker crash kills it mid-drive (they recover in ~20s).
run_step lab_demo 9000 python scripts/drive_lab_demo.py --metrics "$OUT/lab_metrics.jsonl" -- --retries 1

# 5. Optional re-rows under the r4 protocol.
run_step bench_lbfgs1024 2700 env ASTT_BENCH_CONFIG=lbfgs3level1024bf16 python bench.py
run_step bench_batch8 1800 env ASTT_BENCH_CONFIG=batch8x2level512bf16 python bench.py

log "ALL STEPS ATTEMPTED — results in $OUT (bench_headline.out has the JSON line)"
