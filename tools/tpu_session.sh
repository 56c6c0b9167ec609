#!/bin/bash
# Full round-4 TPU measurement session (fire when the tunnel is back).
#
# Runs, in order, each phase bounded and logged to /tmp/tpu_session/:
#   1. tpu_battery.py        — drained microbench + equivalence + headline
#   2. bench.py (diag_rms)   — the default headline config
#   3. calibrate_diis_err.py — on-device stopping-rule calibration
#   4. bench.py (diis_err)   — headline with the calibrated stopping rule
#   5. naphthalene pair bench (opt-in config)
# Every phase tolerates failure of the previous one; the session never
# wedges the caller (all children are `timeout`-bounded). Re-runnable:
# phases append to their logs.
set -u
LOGDIR=/tmp/tpu_session
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

stamp() { date -u +%FT%TZ; }

echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

# phase 0: health probe (fail fast if the tunnel is still wedged)
timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1
if [ $? -ne 0 ]; then
  echo "$(stamp) probe FAILED - tunnel still wedged, aborting" | tee -a "$LOGDIR/session.log"
  exit 1
fi
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] battery" | tee -a "$LOGDIR/session.log"
timeout 2400 python tools/tpu_battery.py > "$LOGDIR/battery.log" 2>&1
echo "$(stamp) [1] rc=$?" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] bench diag_rms" | tee -a "$LOGDIR/session.log"
timeout 2400 python bench.py > "$LOGDIR/bench_diagrms.json" 2> "$LOGDIR/bench_diagrms.log"
echo "$(stamp) [2] rc=$? $(tail -c 300 "$LOGDIR/bench_diagrms.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] calibrate diis_err (benzene/cc-pVDZ)" | tee -a "$LOGDIR/session.log"
timeout 2400 python tools/calibrate_diis_err.py benzene cc-pVDZ \
  > "$LOGDIR/calibrate.log" 2>&1
echo "$(stamp) [3] rc=$?" | tee -a "$LOGDIR/session.log"
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
echo "$(stamp) [3] recommended eps=${EPS:-none}" | tee -a "$LOGDIR/session.log"

if [ -n "$EPS" ]; then
  echo "$(stamp) [4] bench diis_err eps=$EPS" | tee -a "$LOGDIR/session.log"
  QCHEM_BENCH_METRIC=diis_err QCHEM_BENCH_EPS="$EPS" \
    timeout 2400 python bench.py > "$LOGDIR/bench_diiserr.json" 2> "$LOGDIR/bench_diiserr.log"
  echo "$(stamp) [4] rc=$? $(tail -c 300 "$LOGDIR/bench_diiserr.json")" | tee -a "$LOGDIR/session.log"
fi

echo "$(stamp) [5] naphthalene pair" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=3000 \
  timeout 3100 python bench.py > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [5] rc=$? $(tail -c 300 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
