#!/bin/bash
# Round-5 session E: corrected fused-E1 A/B (r5d phases 1-2 hit the Mosaic
# BlockSpec divisibility rule on the E1 operand — fixed by leading with the
# grid-sliced ia axis, commit 404f653 — and fell back to f64).
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5e}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] FUSEDE=1 benzene headline (corrected BlockSpec)" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE=1 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_fusede.json" 2> "$LOGDIR/bench_fusede.log"
echo "$(stamp) [1] rc=$? $(tail -c 600 "$LOGDIR/bench_fusede.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] FUSEDE=1 CAP=1024" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE=1 QCHEM_PL_FUSEDE_CAP=1024 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_fusede_cap1024.json" 2> "$LOGDIR/bench_fusede_cap1024.log"
echo "$(stamp) [2] rc=$? $(tail -c 600 "$LOGDIR/bench_fusede_cap1024.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
