#!/bin/bash
# Round-5 session F: stop-rule data on the PRODUCTION kernel path + the two
# remaining VERDICT items that need chip time.
#
# Phase order is value-first (the tunnel can die mid-session):
#   [1] per-iteration trajectory, benzene/cc-pVDZ, fused-E1 cap 512
#       (huckel + sad) -> the data the round-5 stop rule is designed from.
#   [2] naphthalene/cc-pVDZ pair mode (VERDICT r4 item 5) with the
#       pair/direct precompiler fix (647d64d) and compile logging.
#   [3] cold-start A/B: 8 compile workers under fused-E1 (VERDICT item 3).
#   [4] trajectory again at cap 1024 (huckel) -> cross-validate the rule
#       against the slightly different numerics (r5e: 49 vs 74 iters).
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5f}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1
export QCHEM_PL_FUSEDE=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] trajectory benzene/cc-pVDZ fused cap512 (huckel+sad)" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=4 timeout 1800 python tools/trajectory.py \
  benzene cc-pVDZ 80 huckel sad \
  > "$LOGDIR/trajectory_cap512.json" 2> "$LOGDIR/trajectory_cap512.log"
echo "$(stamp) [1] rc=$? lines=$(grep -c . "$LOGDIR/trajectory_cap512.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] naphthalene pair (precompile fix, lean host loop)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  QCHEM_BENCH_BUDGET=2200 timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [2] rc=$? $(tail -c 600 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] cold A/B: 8 compile workers, fused cap512" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=8 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_w8.json" 2> "$LOGDIR/bench_w8.log"
echo "$(stamp) [3] rc=$? $(tail -c 600 "$LOGDIR/bench_w8.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] trajectory cap1024 (huckel)" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE_CAP=1024 QCHEM_COMPILE_WORKERS=4 timeout 1500 python tools/trajectory.py \
  benzene cc-pVDZ 80 huckel \
  > "$LOGDIR/trajectory_cap1024.json" 2> "$LOGDIR/trajectory_cap1024.log"
echo "$(stamp) [4] rc=$? lines=$(grep -c . "$LOGDIR/trajectory_cap1024.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
