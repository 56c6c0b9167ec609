#!/bin/bash
# Round-5 session H: confirm the shipped defaults + the two remaining
# VERDICT items that need chip time.
#
#   [1] DRIVER REHEARSAL: bare `python bench.py` exactly as the round-end
#       driver runs it — no env overrides. Ships espan:4@5e-7 (from
#       data/calibration.json) + fused-E1 cap 1024. Expect ~7.9 s warm,
#       vs_baseline ~1.8, parseable stdout JSON.
#   [2] naphthalene/cc-pVDZ lean pair mode (VERDICT item 5) with the
#       (hi,lo)-split V2 fix (ef04bb5) — first chip attempt since.
#   [3] QCHEM_PL_MAX_L=12 probe (VERDICT item 8): timed Fe/6-31G* class
#       profile with f-shell classes opted INTO the Mosaic kernel; the
#       open question is the Mosaic compile time of L=9..12 bodies.
#       Best-effort: bounded, per-program compile seconds in the log.
#   [4] spherical water/cc-pVDZ pair-mode on-chip energy check
#       (VERDICT item 6 follow-through on real hardware).
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5h}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] driver rehearsal: bare bench.py (shipped defaults)" | tee -a "$LOGDIR/session.log"
timeout 1700 python bench.py \
  > "$LOGDIR/bench_defaults.json" 2> "$LOGDIR/bench_defaults.log"
echo "$(stamp) [1] rc=$? $(tail -c 700 "$LOGDIR/bench_defaults.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] naphthalene/cc-pVDZ lean pair (hi,lo split)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  QCHEM_BENCH_BUDGET=2200 timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [2] rc=$? $(tail -c 700 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] PL_MAX_L=12 probe: Fe/6-31G* timed class profile" | tee -a "$LOGDIR/session.log"
QCHEM_PL_MAX_L=12 QCHEM_COMPILE_WORKERS=4 timeout 2400 \
  python tools/class_profile.py Fe 6-31G_st \
  > "$LOGDIR/maxl12.log" 2>&1
echo "$(stamp) [3] rc=$? $(grep -c 'compile' "$LOGDIR/maxl12.log" || true) compile lines" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] spherical water/cc-pVDZ pair mode on chip" | tee -a "$LOGDIR/session.log"
timeout 1200 python -m qchem_rs_tpu.cli rhf \
  -b data/basis/cc-pVDZ.json -m data/mol/water.json \
  --spherical --fock-mode pair \
  > "$LOGDIR/sph_pair.log" 2>&1
echo "$(stamp) [4] rc=$? $(grep -E 'hartree fock energy|converged' "$LOGDIR/sph_pair.log" | tr '\n' ' ')" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
