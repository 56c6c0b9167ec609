#!/bin/bash
# Round-5 session D: the fused-E1 kernel A/B — the composed eri_s lever.
#
# r5c phase 1 (TILE_BUDGET=2GB, standard kernel) RESOURCE_EXHAUSTED at run
# time: the (a*S1, c*S2, T1, T2) R2m buffers hit 1.4-2 GB/class and queued
# executions stack them. The fused-E1 kernel removes that tensor entirely
# (bra contraction inside Mosaic), so its classes ride T1 to 128 with
# buffers below today's proven sizes: benzene grid steps 1.05M -> 199k
# AND the lane-starved XLA f64 dot1 disappears.
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5d}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] FUSEDE=1 benzene headline A/B" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE=1 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_fusede.json" 2> "$LOGDIR/bench_fusede.log"
echo "$(stamp) [1] rc=$? $(tail -c 600 "$LOGDIR/bench_fusede.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] FUSEDE=1 CAP=1024 (adds 11_11-tier classes)" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE=1 QCHEM_PL_FUSEDE_CAP=1024 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_fusede_cap1024.json" 2> "$LOGDIR/bench_fusede_cap1024.log"
echo "$(stamp) [2] rc=$? $(tail -c 600 "$LOGDIR/bench_fusede_cap1024.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] FUSEDE=1 class profile (where does the remainder go?)" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE=1 QCHEM_COMPILE_WORKERS=4 timeout 1500 python tools/class_profile.py benzene cc-pVDZ \
  > "$LOGDIR/class_profile_fusede.json" 2> "$LOGDIR/class_profile_fusede.log"
echo "$(stamp) [3] rc=$? $(tail -c 400 "$LOGDIR/class_profile_fusede.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3b] naphthalene retry (lean + host-driven loop: no V2f while-carry)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [3b] rc=$? $(tail -c 600 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] trajectory retry (r5c phase 2 window closed mid-scan-compile)" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=4 timeout 2400 python tools/trajectory.py benzene cc-pVDZ 60 huckel sad \
  > "$LOGDIR/trajectory.json" 2> "$LOGDIR/trajectory.log"
echo "$(stamp) [4] rc=$? $(tail -c 300 "$LOGDIR/trajectory.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
