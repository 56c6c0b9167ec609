#!/bin/bash
# Round-5 session G: the df Fock matvec on chip + stop-rule/DIIS-window
# follow-ups from the r5f trajectory analysis.
#
#   [0] fock_matvec kernel validation at benzene scale (accuracy + ms/matvec
#       vs the emulated-f64 matmul it replaces)
#   [1] trajectory with wider DIIS windows (2,10 / 2,12) — the r5f data
#       shows DIIS(4,6) limits the convergence RATE (1e-6 at iter 33);
#       a wider window should pull the fixed point under ~25 iterations
#   [2] headline bench: df matvec default + espan:4@5e-7 stop
#   [3] A/B: QCHEM_INCORE_MATVEC=f64 (isolates the matvec gain)
#   [4] A/B: FUSEDE_CAP=1024 under espan (robust-stop cap decision)
set -u
LOGDIR=${LOGDIR:-/tmp/tpu_session_r5g}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
export QCHEM_COMPILE_LOG=1

stamp() { date -u +%FT%TZ; }
echo "$(stamp) session start" | tee -a "$LOGDIR/session.log"

timeout 120 python -c "import jax; print(jax.devices())" \
  >> "$LOGDIR/probe.log" 2>&1 || {
  echo "$(stamp) probe FAILED" | tee -a "$LOGDIR/session.log"; exit 1; }
echo "$(stamp) probe ok" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [0] fock_matvec kernel validation (m=14400)" | tee -a "$LOGDIR/session.log"
timeout 900 python - > "$LOGDIR/matvec_probe.log" 2>&1 <<'EOF'
import time
import numpy as np
import jax.numpy as jnp
from qchem_rs_tpu.ops import fock_matvec as fm

rng = np.random.default_rng(0)
m = 14400  # benzene/cc-pVDZ n^2
T = rng.normal(size=(m, m)) * rng.exponential(1.0, size=(m, m))
T = T + T.T
d = rng.normal(size=(m,))
t0 = time.perf_counter()
th, tl = fm.split_terms(jnp.asarray(T))
th.block_until_ready()
print(f"split_s {time.perf_counter()-t0:.2f}", flush=True)
t0 = time.perf_counter()
g = np.asarray(fm.matvec_df(th, tl, jnp.asarray(d), m))
print(f"first_call_s {time.perf_counter()-t0:.1f}", flush=True)
ref = T @ d
print(f"max_abs_err {np.abs(g - ref).max():.3e}", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    g2 = fm.matvec_df(th, tl, jnp.asarray(d), m)
np.asarray(g2)
print(f"df_matvec_ms {(time.perf_counter()-t0)*100:.1f}", flush=True)
Tj = jnp.asarray(T); dj = jnp.asarray(d)
w = np.asarray(Tj @ dj)  # compile + run once
t0 = time.perf_counter()
for _ in range(3):
    w2 = Tj @ dj
np.asarray(w2)
print(f"f64_matvec_ms {(time.perf_counter()-t0)*1000/3:.1f}", flush=True)
EOF
echo "$(stamp) [0] rc=$? $(tr '\n' ' ' < "$LOGDIR/matvec_probe.log" | tail -c 400)" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [1] trajectory DIIS windows 2,10 / 2,12 (huckel+sad)" | tee -a "$LOGDIR/session.log"
QCHEM_COMPILE_WORKERS=4 timeout 1800 python tools/trajectory.py \
  benzene cc-pVDZ 60 huckel sad --diis "2,10;2,12" \
  > "$LOGDIR/trajectory_diis.json" 2> "$LOGDIR/trajectory_diis.log"
echo "$(stamp) [1] rc=$? lines=$(grep -c . "$LOGDIR/trajectory_diis.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [2] headline: df matvec + espan:4@5e-7" | tee -a "$LOGDIR/session.log"
QCHEM_BENCH_METRIC=espan:4 QCHEM_BENCH_EPS=5e-7 \
  QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz QCHEM_BENCH_WINDOW=1500 \
  QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_espan_df.json" 2> "$LOGDIR/bench_espan_df.log"
echo "$(stamp) [2] rc=$? $(tail -c 600 "$LOGDIR/bench_espan_df.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [3] A/B: matvec f64, same stop" | tee -a "$LOGDIR/session.log"
QCHEM_INCORE_MATVEC=f64 QCHEM_BENCH_METRIC=espan:4 QCHEM_BENCH_EPS=5e-7 \
  QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz QCHEM_BENCH_WINDOW=1500 \
  QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_espan_f64mv.json" 2> "$LOGDIR/bench_espan_f64mv.log"
echo "$(stamp) [3] rc=$? $(tail -c 600 "$LOGDIR/bench_espan_f64mv.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) [4] A/B: CAP=1024 under espan" | tee -a "$LOGDIR/session.log"
QCHEM_PL_FUSEDE_CAP=1024 QCHEM_BENCH_METRIC=espan:4 QCHEM_BENCH_EPS=5e-7 \
  QCHEM_BENCH_ONLY=rhf_benzene_ccpvdz QCHEM_BENCH_WINDOW=1500 \
  QCHEM_BENCH_BUDGET=1300 timeout 1600 python bench.py \
  > "$LOGDIR/bench_espan_cap1024.json" 2> "$LOGDIR/bench_espan_cap1024.log"
echo "$(stamp) [4] rc=$? $(tail -c 600 "$LOGDIR/bench_espan_cap1024.json")" | tee -a "$LOGDIR/session.log"

echo "$(stamp) session done" | tee -a "$LOGDIR/session.log"
