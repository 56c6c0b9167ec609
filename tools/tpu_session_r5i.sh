#!/bin/bash
# Round-5 session I: naphthalene lean pair retry with both r5h OOM fixes
# (queue drain after non-fused class programs, 1da2880; three-program lean
# prep capping the transient at 2x the pair matrix, 324fab3), plus the
# next headline lever A/B.
#
#   [1] naphthalene/cc-pVDZ lean pair, QCHEM_MEM_LOG=1 (phase-boundary
#       device memory stats if the backend exposes them)
#   [2] benzene headline A/B at QCHEM_PL_FUSEDE_CAP=2048 (cap 1024 won
#       7.908 s in r5g; does doubling again keep paying?)
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5i}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] naphthalene lean pair (drain + staged prep, mem log)" | tee -a "$LOGDIR/session.log"
QCHEM_MEM_LOG=1 QCHEM_BENCH_ONLY=rhf_naphthalene_pair \
  QCHEM_BENCH_WINDOW=2400 QCHEM_BENCH_BUDGET=2200 \
  timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [1] rc=$? $(tail -c 700 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"
grep "# mem" "$LOGDIR/bench_naph.log" | tail -30 >> "$LOGDIR/session.log" || true

echo "$(stamp) [2] benzene A/B: FUSEDE_CAP=2048" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE_CAP=2048 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 \
  timeout 1600 python bench.py \
  > "$LOGDIR/bench_cap2048.json" 2> "$LOGDIR/bench_cap2048.log"
echo "$(stamp) [2] rc=$? $(tail -c 700 "$LOGDIR/bench_cap2048.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
