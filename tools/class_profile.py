"""Per-class-pair V2 build timing: which classes cost what, and how much of
the build runs on the XLA-f64 fallback path vs the Pallas kernel.

VERDICT round 4, item 8: class pairs with total L > _PL_MAX_L (8) silently
fall back from Pallas to XLA f64 (ops/eri_tiled.py). Among the BUNDLED data
f shells exist only for transition metals (6-31G*/6-31G** Sc-Ni, def2-SV(P)
lanthanides) — no bundled molecule contains one — so the fallback question
is quantified here on an Fe atom in 6-31G* (s/p/d/f classes, L_tot up to 12).

Usage:
    python tools/class_profile.py [molecule_or_element] [basis]
    python tools/class_profile.py Fe 6-31G_st        # default
    python tools/class_profile.py benzene cc-pVDZ
    python tools/class_profile.py Fe 6-31G_st --flops-only

--flops-only: no compilation or device execution — prints each task's tile
count and analytic FLOPs plus the f64-fallback FLOP fraction. Pair with
QCHEM_KERNEL=pallas on any backend to reproduce the TPU kernel-selection
mix (the L > QCHEM_PL_MAX_L fallback) without a chip: the round-5 TPU
session's timed Fe profile starved in precompile (the f-shell programs
alone exceed 40 min of axon remote compiles), so the FLOP share is the
honest quantification available per unit cost.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# element symbol -> Z for the single-atom mode
_SYMBOLS = {"H": 1, "C": 6, "N": 7, "O": 8, "Cl": 17, "Sc": 21, "Ti": 22,
            "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28}


def _task_kernel(name: str) -> str:
    return (
        "f32" if name.endswith("_f32")
        else "df" if name.endswith("_df")
        else "pallas_e1" if name.endswith("_ple")
        else "pallas" if name.endswith("_pl")
        else "f64"
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flops_only = "--flops-only" in sys.argv
    what = args[0] if args else "Fe"
    basis_name = args[1] if len(args) > 1 else "6-31G_st"

    import numpy as np

    from qchem_rs_tpu import BasisSet, MolecularSystem
    from qchem_rs_tpu.utils.system import Atom
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine, _tile_flops, _tile_shapes

    basis = BasisSet.load(os.path.join(ROOT, "data", "basis", f"{basis_name}.json"))
    if what in _SYMBOLS:
        system = MolecularSystem([Atom(_SYMBOLS[what], np.zeros(3))], basis)
    else:
        system = MolecularSystem.load(
            os.path.join(ROOT, "data", "mol", f"{what}.json"), basis
        )

    import jax.numpy as jnp

    engine = TiledEriEngine(system, 1e-12)

    if flops_only:
        metas = engine.layout.metas
        rows = []
        for name, _fn, segments, (i1, i2, _okind) in engine._tasks:
            m1, m2 = metas[i1], metas[i2]
            T1, T2 = _tile_shapes(m1, m2, fused=name.endswith("_ple"))
            ntiles = sum(len(xs[0]) for xs in segments)
            rows.append({
                "class": name, "kernel": _task_kernel(name),
                "L_total": m1.la + m1.lb + m2.la + m2.lb,
                "tiles": ntiles,
                "gflops": round(_tile_flops(m1, m2, T1, T2) * ntiles / 1e9, 3),
            })
            print(json.dumps(rows[-1]), flush=True)
        total = sum(r["gflops"] for r in rows)
        fallback = sum(r["gflops"] for r in rows if r["kernel"] == "f64")
        print(json.dumps({
            "summary": True, "flops_only": True,
            "system": what, "basis": basis_name, "nao": system.n_basis(),
            "kernel_mode_env": os.environ.get("QCHEM_KERNEL"),
            "build_gflops": round(total, 3),
            "f64_fallback_gflops": round(fallback, 3),
            "f64_fallback_flop_fraction": (
                round(fallback / total, 4) if total else None
            ),
            "n_classes": len(rows),
        }), flush=True)
        return 0
    from qchem_rs_tpu.models.rhf import precompile_rhf  # noqa: F401 (docs)
    from qchem_rs_tpu.ops.incore import precompile

    t0 = time.perf_counter()
    compiled = precompile(engine.programs())
    engine._compiled = {
        k: v for k, v in compiled.items()
        if k.startswith("v2_") or k.startswith("finish")
    }
    compile_s = time.perf_counter() - t0

    # one warm-up build (first execution includes transfers)
    engine.build().block_until_ready()

    metas = engine.layout.metas
    M = engine.layout.M
    rows = []
    V2 = jnp.zeros((M, M), dtype=jnp.float64)
    for name, fn, segments, ospec in engine._tasks:
        i1, i2, okind = ospec
        m1, m2 = metas[i1], metas[i2]
        f = engine._compiled.get(name, fn)
        operands = engine.operand_arrays(*ospec)
        t0 = time.perf_counter()
        for xs in segments:
            V2 = f(V2, xs, *operands)
        V2.block_until_ready()
        dt = time.perf_counter() - t0
        ntiles = sum(len(xs[0]) for xs in segments)
        T1, T2 = _tile_shapes(m1, m2, fused=name.endswith("_ple"))
        gflops = _tile_flops(m1, m2, T1, T2) * ntiles / 1e9
        kernel = _task_kernel(name)
        L = m1.la + m1.lb + m2.la + m2.lb
        rows.append({
            "class": name, "kernel": kernel, "L_total": L,
            "tiles": ntiles, "seconds": round(dt, 4),
            "gflops_per_s": round(gflops / dt, 2) if dt > 0 else None,
        })
        print(json.dumps(rows[-1]), flush=True)

    total = sum(r["seconds"] for r in rows)
    fallback = sum(r["seconds"] for r in rows if r["kernel"] == "f64")
    import jax

    print(json.dumps({
        "summary": True,
        "system": what, "basis": basis_name, "nao": system.n_basis(),
        "backend": jax.default_backend(),
        "compile_s": round(compile_s, 1),
        "build_s": round(total, 3),
        "f64_fallback_s": round(fallback, 3),
        "f64_fallback_fraction": round(fallback / total, 4) if total else None,
        "n_classes": len(rows),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
