#!/bin/bash
# Round-5 TPU measurement session — headline-first ordering (the pattern
# that survived round 4's flaky tunnel: every phase bounded, logs flushed,
# the BENCH-able number first).
#
#   1. bench.py (SAD + composite@1e-8) — the round-5 headline
#   2. validate_tpu_cache.py           — does the persistent cache hold
#                                        axon executables across processes?
#   3. bench.py (huckel + diag_rms@1e-8) — round-4 parity config, for the
#                                        apples-to-apples iteration/energy row
#   4. naphthalene/cc-pVDZ pair mode   — BASELINE config 5 on the chip
#   5. cold-start A/B: 8 compile workers
#   6. class_profile.py Fe/6-31G*      — the L>8 f64-fallback quantification
#   7. tpu_battery.py                  — microbench diagnostics (nice-to-have)
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1
if [ $? -ne 0 ]; then
  echo "$(stamp) probe FAILED - tunnel wedged, aborting" | tee -a "$LOGDIR/session.log"
  exit 1
fi
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] bench sad+composite (headline)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_WINDOW=1500 timeout 1600 python bench.py \
  > "$LOGDIR/bench_headline.json" 2> "$LOGDIR/bench_headline.log"
echo "$(stamp) [1] rc=$? $(tail -c 500 "$LOGDIR/bench_headline.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] persistent-cache validation" | tee -a "$LOGDIR/session.log"
timeout 1500 python tools/validate_tpu_cache.py \
  > "$LOGDIR/cache_validate.json" 2> "$LOGDIR/cache_validate.log"
echo "$(stamp) [2] rc=$? $(tail -c 400 "$LOGDIR/cache_validate.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] bench huckel+diag_rms (round-4 parity row)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_METRIC=diag_rms QCHEM_BENCH_EPS=1e-8 QCHEM_BENCH_GUESS=huckel \
  QCHEM_BENCH_WINDOW=1500 timeout 1600 python bench.py \
  > "$LOGDIR/bench_diagrms.json" 2> "$LOGDIR/bench_diagrms.log"
echo "$(stamp) [3] rc=$? $(tail -c 500 "$LOGDIR/bench_diagrms.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] naphthalene pair (BASELINE config 5)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [4] rc=$? $(tail -c 500 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [5] cold A/B: 8 compile workers" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=8 QCHEM_BENCH_WINDOW=1500 timeout 1600 python bench.py \
  > "$LOGDIR/bench_w8.json" 2> "$LOGDIR/bench_w8.log"
echo "$(stamp) [5] rc=$? $(tail -c 500 "$LOGDIR/bench_w8.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [6] f-shell fallback profile (Fe/6-31G*)" | tee -a "$LOGDIR/session.log"
timeout 2400 python tools/class_profile.py Fe 6-31G_st \
  > "$LOGDIR/class_profile_fe.json" 2> "$LOGDIR/class_profile_fe.log"
echo "$(stamp) [6] rc=$? $(tail -c 400 "$LOGDIR/class_profile_fe.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [7] battery" | tee -a "$LOGDIR/session.log"
timeout 2400 python tools/tpu_battery.py > "$LOGDIR/battery.log" 2>&1
echo "$(stamp) [7] rc=$?" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
