#!/bin/bash
# Round-5 session C: the eri_s structural lever + stop-rule data.
#
# The r5b class profile measured benzene/cc-pVDZ eri_s 19.6 s spread
# UNIFORMLY at 20-30 analytic GFLOP/s across classes, with the cheap low-L
# classes dominated by Pallas grid-step overhead: grid = (T1/BT1, a, c)
# with BT1 = T1 = 16 gives ~1.05M grid steps/build at ~5 us/step.
# QCHEM_TILE_BUDGET=2 GB raises T1 (and so BT1) 4x -> 286k steps, with
# per-tile XLA f64 dot intermediates still < 1.7 GB.
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5c}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] TILE_BUDGET=2GB benzene A/B (the grid-step lever)" | tee -a "$LOGDIR/session.log"
QCHEM_TILE_BUDGET=2147483648 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=1500 QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_budget2g.json" 2> "$LOGDIR/bench_budget2g.log"
echo "$(stamp) [1] rc=$? $(tail -c 600 "$LOGDIR/bench_budget2g.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1b] repeat of [1]: does the persistent cache collapse cold_s?" | tee -a "$LOGDIR/session.log"
QCHEM_TILE_BUDGET=2147483648 QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz \
  QCHEM_BENCH_WINDOW=900 QCHEM_BENCH_BUDGET=800 timeout 1000 python bench.py \
  > "$LOGDIR/bench_budget2g_repeat.json" 2> "$LOGDIR/bench_budget2g_repeat.log"
echo "$(stamp) [1b] rc=$? $(tail -c 600 "$LOGDIR/bench_budget2g_repeat.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] SCF trajectory (stop-rule data): huckel + sad" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=4 timeout 1500 python tools/trajectory.py benzene cc-pVDZ 60 huckel sad \
  > "$LOGDIR/trajectory.json" 2> "$LOGDIR/trajectory.log"
echo "$(stamp) [2] rc=$? $(tail -c 300 "$LOGDIR/trajectory.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] naphthalene pair retry (LEAN mode: no W matrix)" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_ONLY=rhf_naphthalene_pair QCHEM_BENCH_WINDOW=2400 \
  timeout 2500 python bench.py \
  > "$LOGDIR/bench_naph.json" 2> "$LOGDIR/bench_naph.log"
echo "$(stamp) [3] rc=$? $(tail -c 600 "$LOGDIR/bench_naph.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] dot probe: kernel vs f64-dot split, 5 classes" | tee -a "$LOGDIR/session.log"
timeout 1500 python tools/dot_probe.py benzene cc-pVDZ 8 00_00,00_10,10_10,10_11,11_11 \
  > "$LOGDIR/dot_probe.json" 2> "$LOGDIR/dot_probe.log"
echo "$(stamp) [4] rc=$? $(tail -c 400 "$LOGDIR/dot_probe.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [5] PL_MAX_L=12 Mosaic compile-time probe (one f-shell class)" | tee -a "$LOGDIR/session.log"
QCHEM_PL_MAX_L=12 timeout 1200 python - > "$LOGDIR/plmax.json" 2> "$LOGDIR/plmax.log" <<'EOF'
import json, sys, time
sys.path.insert(0, ".")
import numpy as np
from qchem_rs_tpu import BasisSet, MolecularSystem
from qchem_rs_tpu.utils.system import Atom
from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

basis = BasisSet.load("data/basis/6-31G_st.json")
system = MolecularSystem([Atom(26, np.zeros(3))], basis)
engine = TiledEriEngine(system, 1e-12)
for name, fn, spec in engine.programs():
    if name in ("v2_32_32_pl", "v2_33_33_pl"):
        t0 = time.perf_counter()
        fn.lower(*spec).compile()
        print(json.dumps({"program": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
EOF
echo "$(stamp) [5] rc=$? $(tail -c 300 "$LOGDIR/plmax.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
