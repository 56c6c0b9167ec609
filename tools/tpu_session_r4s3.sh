#!/bin/bash
# Round-4 session-3 TPU measurement session — headline-first ordering.
#
# tpu_session.sh runs the 40-min battery before the headline bench; with a
# short wall-clock window and a historically flaky tunnel we want the
# BENCH-able number first. Order here:
#   1. bench.py (diag_rms)   — the headline (benzene/cc-pVDZ, cold+warm+CPU)
#   2. calibrate_diis_err.py — on-device stopping-rule calibration
#   3. bench.py (diis_err)   — headline with the calibrated stopping rule
#   4. naphthalene pair bench (opt-in config)
#   5. tpu_battery.py        — microbench diagnostics (nice-to-have)
# Every phase is timeout-bounded and logs flush as they complete.
set -u
LOGDIR=/tmp/tpu_session_r4s3
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

echo "$(stamp) [1] bench diag_rms" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_WINDOW=1500 timeout 1600 python bench.py \
  > "$LOGDIR/bench_diagrms.json" 2> "$LOGDIR/bench_diagrms.log"
echo "$(stamp) [1] rc=$? $(tail -c 400 "$LOGDIR/bench_diagrms.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] calibrate diis_err (benzene/cc-pVDZ)" | tee -a "$LOGDIR/session.log"
timeout 1500 python tools/calibrate_diis_err.py benzene cc-pVDZ \
  > "$LOGDIR/calibrate.log" 2>&1
echo "$(stamp) [2] rc=$?" | tee -a "$LOGDIR/session.log"
EPS=$(python - "$LOGDIR/calibrate.log" <<'EOF'
import json, sys
eps = ""
for line in open(sys.argv[1]):
    line = line.strip()
    if line.startswith("{"):
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if row.get("recommended"):
            eps = row["recommended"]["epsilon"]
print(eps)
EOF
)
echo "$(stamp) [2] recommended eps=${EPS:-none}" | tee -a "$LOGDIR/session.log"

if [ -n "$EPS" ]; then
  echo "$(stamp) [3] bench diis_err eps=$EPS" | tee -a "$LOGDIR/session.log"
  QCHEM_BENCH_METRIC=diis_err QCHEM_BENCH_EPS="$EPS" QCHEM_BENCH_WINDOW=1500 \
    timeout 1600 python bench.py \
    > "$LOGDIR/bench_diiserr.json" 2> "$LOGDIR/bench_diiserr.log"
  echo "$(stamp) [3] rc=$? $(tail -c 400 "$LOGDIR/bench_diiserr.json")" | tee -a "$LOGDIR/session.log"
fi

echo "$(stamp) [4] naphthalene pair" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [4] rc=$? $(tail -c 400 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [5] battery" | tee -a "$LOGDIR/session.log"
timeout 2400 python tools/tpu_battery.py > "$LOGDIR/battery.log" 2>&1
echo "$(stamp) [5] rc=$?" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
