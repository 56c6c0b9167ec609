"""On-device diis_err stopping calibration (VERDICT round-3 item 4).

The reference stops on the density-RMS diagonal (rhf.rs:87-88); on emulated
f64 the density wanders at the noise floor and diag_rms 1e-8 costs ~45
iterations where 13 suffice (docs/PROFILE_r03.md). The commutator norm
max|FDS - SDF| observes distance-to-fixed-point directly. This script finds
the diis_err epsilon equivalent to 1e-8 Eh energy stability on the CURRENT
backend.

Ground truth: the TIGHTEST CONVERGED diis_err rung of the ladder itself.
Measured on CPU (docs/PROFILE_r04.md): diis_err@1e-9..1e-11, diag_rms@1e-10
and energy@1e-12 all agree to ~1e-11 Eh, while the reference-quirk
diag_rms@1e-8 can stop 8.3e-8 Eh SHORT of the fixed point (OH/6-31G UHF) —
so neither diag_rms@1e-8 nor an |dE| stop (which can trigger spuriously
EARLY inside the TPU's ~1e-8 energy noise floor) is a safe reference. Both
are still run and printed as context: diag_rms@1e-8's iteration count is
the number the calibrated rule must beat on-device.

Run on the TPU:  python tools/calibrate_diis_err.py [molecule] [basis]
Prints one JSON line per run and a final recommendation line.
"""

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LADDER = (1e-3, 3e-4, 1e-4, 3e-5, 1e-5, 3e-6, 1e-6, 1e-7, 1e-8, 1e-9)


def main():
    mol = sys.argv[1] if len(sys.argv) > 1 else "benzene"
    basis_name = sys.argv[2] if len(sys.argv) > 2 else "cc-pVDZ"

    from qchem_rs_tpu import (
        BasisSet,
        HartreeFockConfig,
        MolecularSystem,
        restricted_hartree_fock,
    )

    basis = BasisSet.load(os.path.join(ROOT, "data", "basis", f"{basis_name}.json"))
    system = MolecularSystem.load(os.path.join(ROOT, "data", "mol", f"{mol}.json"), basis)
    base = HartreeFockConfig(
        epsilon=1e-8, max_iterations=200, convergence_metric="diag_rms"
    )

    def run(metric, eps):
        cfg = dataclasses.replace(base, epsilon=eps, convergence_metric=metric)
        t0 = time.perf_counter()
        out = restricted_hartree_fock(system, cfg)
        return out, time.perf_counter() - t0

    # context: the baseline rule whose on-device iteration count the
    # calibrated rule must beat (45-50 on TPU round 2, 13 on CPU)
    ref_diag, dt = run("diag_rms", 1e-8)
    print(json.dumps({
        "config": f"{mol}/{basis_name}", "metric": "diag_rms", "epsilon": 1e-8,
        "iterations": ref_diag.iterations, "converged": bool(ref_diag.converged),
        "total_energy": round(ref_diag.total_energy(), 10), "run_s": round(dt, 3),
    }), flush=True)

    rows = []
    for eps in LADDER:
        out, dt = run("diis_err", eps)
        row = {
            "metric": "diis_err", "epsilon": eps, "iterations": out.iterations,
            "converged": bool(out.converged),
            "total_energy": round(out.total_energy(), 11), "run_s": round(dt, 3),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    converged = [r for r in rows if r["converged"]]
    if not converged:
        print(json.dumps({"recommended": None, "reason": "no rung converged"}),
              flush=True)
        return
    # Fixed-point reference: the TIGHTEST RUNG'S FINAL ENERGY whether or not
    # its stop triggered — a max_iterations run is the closest fixed-point
    # estimate available. Round-4 TPU measurement showed why "tightest
    # CONVERGED rung" is unsafe: on emulated f64 the commutator norm has a
    # noise floor between 1e-6 and 1e-7 (eps<=1e-7 never triggers), while
    # the eps=1e-6 stop fired on a transient DIIS overshoot 1.6e-3 Eh OFF
    # the fixed point — and agreed with its neighbor rung to 0, so the old
    # logic certified a badly under-converged rule (docs/PROFILE_r04.md).
    e_ref = rows[-1]["total_energy"]
    e_diag = ref_diag.total_energy()
    if abs(e_ref - e_diag) > 1e-5:
        # the two independent estimates disagree: no trustworthy reference
        print(json.dumps({
            "recommended": None,
            "reason": f"reference estimates disagree: tight-rung {e_ref} "
                      f"vs diag_rms {e_diag}",
        }), flush=True)
        return
    best = None
    for r in converged:  # loosest-first
        r["dE_vs_ref"] = float(f"{abs(r['total_energy'] - e_ref):.3e}")
        if best is None and r["dE_vs_ref"] < 1e-8:
            best = r
    print(json.dumps({
        "fixed_point": e_ref,
        "diag_rms_1e8_short_by": float(
            f"{abs(ref_diag.total_energy() - e_ref):.3e}"
        ),
        "recommended": best,
    }), flush=True)

    # persist per-backend so bench.py defaults to the calibrated rule
    # (only when it actually beats the diag_rms baseline's iteration count)
    if best is not None and best["iterations"] <= ref_diag.iterations:
        import jax

        path = os.path.join(ROOT, "data", "calibration.json")
        try:
            with open(path) as f:
                cal = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            cal = {}
        cal[jax.default_backend()] = {
            "metric": "diis_err",
            "epsilon": best["epsilon"],
            "config": f"{mol}/{basis_name}",
            "iterations": best["iterations"],
            "diag_rms_iterations": ref_diag.iterations,
        }
        with open(path, "w") as f:
            json.dump(cal, f, indent=1)
        print(json.dumps({"calibration_written": path}), flush=True)


if __name__ == "__main__":
    main()
