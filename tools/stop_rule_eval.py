"""Offline stop-rule evaluation over recorded SCF trajectories.

Feed it the JSON lines from tools/trajectory.py; for every candidate rule
it reports the stop iteration and the energy deviation (vs the trajectory's
final energy = the deepest fixed-point estimate available), per guess.

    python tools/stop_rule_eval.py /tmp/tpu_session_r5d/trajectory.json

Rules evaluated (mirroring models/scf.py semantics):
  diag_rms@eps     : diag_rms < eps                      (reference quirk)
  diag_rms2@eps    : two consecutive passes below eps    (sustained)
  diis_err2@eps    : two consecutive max|FDS-SDF| < eps  (sustained)
  composite:g@eps  : |dE| < eps twice, gated on diag_rms < g
"""

import json
import sys

import numpy as np


def _stop_plain(v, eps):
    idx = np.nonzero(v < eps)[0]
    return int(idx[0]) if idx.size else None


def _stop_sustained(v, eps):
    hit = v < eps
    idx = np.nonzero(hit[1:] & hit[:-1])[0]
    return int(idx[0] + 1) if idx.size else None


def main() -> int:
    path = sys.argv[1]
    rows = [json.loads(l) for l in open(path) if l.startswith("{")]
    by_guess: dict[str, list] = {}
    for r in rows:
        if r.get("summary"):
            continue
        by_guess.setdefault(r["guess"], []).append(r)

    for guess, rs in by_guess.items():
        rs.sort(key=lambda r: r["i"])
        E = np.array([r["E"] for r in rs])
        diag = np.array([r["diag_rms"] for r in rs])
        derr = np.array([r["diis_err"] for r in rs])
        dE = np.array([r["dE"] for r in rs])
        # the fixed-point estimate: median of the last 5 energies (the
        # emulated-f64 tail fluctuates ~1e-7; the median de-noises it)
        E_fix = float(np.median(E[-5:]))
        print(f"# guess={guess} n={len(rs)} E_fix={E_fix:.9f} "
              f"(tail spread {np.ptp(E[-5:]):.2e})")

        def report(rule, it):
            if it is None:
                print(f"  {rule:24s} NEVER")
            else:
                print(f"  {rule:24s} stop@{it:<3d} dev={abs(E[it]-E_fix):.2e}")

        for eps in (1e-7, 3e-8, 1e-8):
            report(f"diag_rms@{eps:g}", _stop_plain(diag, eps))
            report(f"diag_rms2@{eps:g}", _stop_sustained(diag, eps))
        for eps in (1e-5, 3e-6, 1e-6, 3e-7, 1e-7):
            report(f"diis_err2@{eps:g}", _stop_sustained(derr, eps))
        for eps in (1e-6, 1e-7, 1e-8):
            gated = np.where(diag < 1e-6, dE, np.inf)
            report(f"composite:1e-6@{eps:g}", _stop_sustained(gated, eps))
        # |dE| rungs ABOVE the emulated-f64 noise floor (~1e-7): the round-5
        # insight is that sub-floor rungs never fire but the energy IS at its
        # floor by ~iteration 15-25 — a floor-aware rung should stop there
        for eps in (1e-6, 5e-7, 3e-7, 2e-7):
            gated = np.where(diag < 1e-6, dE, np.inf)
            report(f"composite:1e-6@{eps:g}", _stop_sustained(gated, eps))
        # espan:w@delta — stop when the last w energies span < delta
        # (noise-band detector, insensitive to the sign of the wandering)
        for w in (3, 4, 6):
            for delta in (1e-6, 5e-7, 3e-7):
                span = np.full(len(E), np.inf)
                for i in range(w - 1, len(E)):
                    win = E[i - w + 1 : i + 1]
                    span[i] = np.ptp(win)
                span = np.where(diag < 1e-6, span, np.inf)
                report(f"espan:{w}@{delta:g}", _stop_plain(span, delta))
    return 0


if __name__ == "__main__":
    sys.exit(main())
