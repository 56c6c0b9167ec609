#!/bin/bash
# Round-5 follow-up session: the eri_s lever.
#
# Phase-3 of tpu_session_r5.sh split the 26.3 s warm benzene run into
# eri_s 19.0 s (one-time V2 build) + scf_s 7.1 s (50 iterations) — so the
# SAD/composite iteration cut alone lands ~21.5 s, short of the 14.3 s bar.
# This session measures WHERE the 19 s goes and A/Bs the two cheap knobs:
#   1. bench.py with the new SAD+composite defaults (the round-5 headline —
#      all programs warm in the persistent cache by now if it works, else
#      cold ~700 s)
#   2. class_profile.py benzene cc-pVDZ — per-class seconds + analytic
#      GFLOP/s under the Pallas kernel (where is the time?)
#   3. A/B: QCHEM_PL_VMEM=12MB (taller bricks, fewer grid steps; Mosaic
#      recompiles are ~10 s/program)
#   4. A/B: QCHEM_SEG_UNITS=1.2e9 (fewer, longer scan calls)
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5b}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

stamp() { date -u +%FT%TZ; }
# per-program compile seconds in every child's stderr log (cold-start story)
export QCHEM_COMPILE_LOG=1
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] bench sad+composite headline" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_WINDOW=1500 timeout 1600 python bench.py \
  > "$LOGDIR/bench_headline.json" 2> "$LOGDIR/bench_headline.log"
echo "$(stamp) [1] rc=$? $(tail -c 600 "$LOGDIR/bench_headline.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1b] naphthalene pair retry (mirror_inplace OOM fix)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [1b] rc=$? $(tail -c 600 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] benzene class profile" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=4 timeout 1800 python tools/class_profile.py benzene cc-pVDZ \
  > "$LOGDIR/class_profile_benzene.json" 2> "$LOGDIR/class_profile_benzene.log"
echo "$(stamp) [2] rc=$? $(tail -c 400 "$LOGDIR/class_profile_benzene.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2b] persistent-cache validation (small-program probe)" | tee -a "$LOGDIR/session.log"
timeout 1500 python tools/validate_tpu_cache.py \
  > "$LOGDIR/cache_validate.json" 2> "$LOGDIR/cache_validate.log"
echo "$(stamp) [2b] rc=$? $(tail -c 400 "$LOGDIR/cache_validate.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] A/B PL_VMEM=12MB" | tee -a "$LOGDIR/session.log"
QCHEM_PL_VMEM=12582912 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_vmem12.json" 2> "$LOGDIR/bench_vmem12.log"
echo "$(stamp) [3] rc=$? $(tail -c 600 "$LOGDIR/bench_vmem12.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] A/B SEG_UNITS=1.2e9" | tee -a "$LOGDIR/session.log"
QCHEM_SEG_UNITS=1.2e9 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_seg12.json" 2> "$LOGDIR/bench_seg12.log"
echo "$(stamp) [4] rc=$? $(tail -c 600 "$LOGDIR/bench_seg12.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
