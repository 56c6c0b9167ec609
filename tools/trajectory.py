"""Full-precision SCF trajectory recorder: the data a stopping rule is
designed FROM.

Round-5 state of the stop-rule question (docs/PROFILE_r04/r05): on the
emulated-f64 TPU backend diag_rms@1e-8 wanders (huckel 50 iters, SAD 142 on
benzene/cc-pVDZ), composite |dE| and diis_err rules never trigger inside the
~1e-7 energy noise floor. Every prior calibration ran the full while_loop
per epsilon rung — expensive and observable only at its stop. This tool
instead runs ONE fixed-length `lax.scan` of the identical SCF body and
returns the complete per-iteration series (energy, diag_rms, full-matrix
rms, max|FDS-SDF|) in f64, so rule candidates can be evaluated offline
against the true fixed-point approach.

Usage:
    python tools/trajectory.py [molecule] [basis] [n_iters] [guess ...]
    python tools/trajectory.py benzene cc-pVDZ 60 huckel sad

One JSON line per iteration per guess + a summary. The scan program is one
extra TPU compile (~45 s); each iteration costs the normal ~0.14 s.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    argv = list(sys.argv[1:])
    # one or more windows, ';'-separated: each extra window costs only a
    # fresh ~35 s scan compile (the V2 build/compiles are shared)
    diis_windows = [(4, 6)]  # reference parity (rhf.rs:65)
    if "--diis" in argv:
        i = argv.index("--diis")
        diis_windows = [
            tuple(int(x) for x in spec.split(","))
            for spec in argv[i + 1].split(";")
        ]
        del argv[i : i + 2]
    mol = argv[0] if len(argv) > 0 else "benzene"
    basis_name = argv[1] if len(argv) > 1 else "cc-pVDZ"
    n_iters = int(argv[2]) if len(argv) > 2 else 60
    guesses = argv[3:] or ["huckel", "sad"]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qchem_rs_tpu import BasisSet, HartreeFockConfig, MolecularSystem
    from qchem_rs_tpu.models import scf
    from qchem_rs_tpu.models.diis import diis_apply, diis_init
    from qchem_rs_tpu.models.rhf import _incore_tools

    basis = BasisSet.load(os.path.join(ROOT, "data", "basis", f"{basis_name}.json"))
    system = MolecularSystem.load(
        os.path.join(ROOT, "data", "mol", f"{mol}.json"), basis
    )
    cfg = HartreeFockConfig()
    nocc = system.n_electrons(0) // 2
    n = system.n_basis()

    ones, engine = _incore_tools(system, cfg)
    if os.environ.get("QCHEM_COMPILE_WORKERS", "1") != "1":
        from qchem_rs_tpu.ops.incore import precompile

        engine._compiled = {
            k: v for k, v in precompile(engine.programs()).items()
            if k.startswith("v2_") or k.startswith("finish")
        }
    pos = jnp.asarray(system.positions)
    S = ones["S"](pos)
    H, X = ones["prep"](S, ones["T"](pos), ones["V"](pos))
    t0 = time.perf_counter()
    terms = engine.finish_terms(engine.build())
    terms.block_until_ready()
    print(f"# eri_s {time.perf_counter() - t0:.2f}", file=sys.stderr, flush=True)

    def make_run(diis_min: int, diis_max: int):
        # terms/H/X/S enter as ARGUMENTS: a closure-captured concrete array
        # is a CONSTANT in the jaxpr, and embedding the 1.66 GB terms matrix
        # in the HLO wedged the axon remote compile for 60+ min (r5d phase 4)
        @jax.jit
        def run(terms, H, X, S, D0):
            def body(carry, _):
                D, diis, prev_e = carry
                G = (terms @ D.reshape(-1)).reshape(n, n)
                F = H + G
                err = F @ D @ S - S @ D @ F
                F, diis = diis_apply(diis, err, F, diis_min)
                C, w = scf.solve_fock(F, X)
                D_new = scf.density_from_coeffs(C, nocc, scale=2.0)
                d_change = D_new - D
                D = D_new
                energy = 0.5 * jnp.sum(D * (2.0 * H + G))
                diag = jnp.diagonal(d_change)
                rec = (
                    energy,
                    jnp.sqrt(jnp.mean(diag * diag)),        # diag_rms (rhf.rs:87-88)
                    jnp.sqrt(jnp.mean(d_change * d_change)),  # full-matrix rms
                    jnp.max(jnp.abs(err)),                    # diis_err
                    jnp.abs(energy - prev_e),                 # |dE|
                )
                return (D, diis, energy), rec

            init = (D0, diis_init(diis_max, n), jnp.zeros(()))
            _, recs = jax.lax.scan(body, init, None, length=n_iters)
            return recs

        return run

    for diis_w in diis_windows:
        diis_min, diis_max = diis_w
        run = make_run(diis_min, diis_max)
        print(f"# compiling the scan program (diis {diis_w})",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        _ = jax.tree.map(lambda x: x.block_until_ready(),
                         run(terms, H, X, S, jnp.zeros((n, n))))  # compile once
        print(f"# scan compile+run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

        for guess in guesses:
            if guess == "huckel":
                D0 = scf.huckel_guess(H, S, X, nocc, scale=2.0)
            elif guess == "sad":
                from qchem_rs_tpu.models.sad import sad_guess

                D0 = jnp.asarray(sad_guess(system, 0))
            else:
                raise SystemExit(f"unknown guess {guess!r}")
            t0 = time.perf_counter()
            recs = [np.asarray(r) for r in run(terms, H, X, S, D0)]
            dt = time.perf_counter() - t0
            E, diag, full, derr, dE = recs
            label = f"{guess}:d{diis_min},{diis_max}" \
                if diis_w != (4, 6) else guess
            for i in range(n_iters):
                print(json.dumps({
                    "guess": label, "i": i, "E": float(E[i]),
                    "diag_rms": float(diag[i]), "full_rms": float(full[i]),
                    "diis_err": float(derr[i]), "dE": float(dE[i]),
                }), flush=True)
            print(json.dumps({
                "summary": True, "guess": label, "mol": mol,
                "basis": basis_name,
                "backend": jax.default_backend(), "n_iters": n_iters,
                "diis": list(diis_w),
                "run_s": round(dt, 2), "final_E": float(E[-1]),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
