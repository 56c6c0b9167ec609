"""Split one class-pair tile's cost: Pallas elementwise kernel vs the two
XLA f64 Hermite->Cartesian contractions.

The round-5 question: benzene/cc-pVDZ eri_s is 19 s under the Pallas
kernel, and per-class battery wins over f64 are only 1.2-1.4x (pd 0.88x).
Two stories fit: (a) the XLA f64 dots now dominate (they contract to tiny
output dims A,C = 9..36 — lane-starved on the MXU — in emulated f64), or
(b) the Mosaic kernel itself is slow. This times, per class pair, on the
real backend:

  kernel_s : r2m_tiles_pallas alone (the Mosaic kernel + R2m output)
  dots_s   : the two dot_generals + f32->f64 convert on a PRECOMPUTED R2m
  full_s   : tile_vals_pallas end to end (sanity: ~= kernel + dots)

Usage:
    python tools/dot_probe.py [molecule] [basis] [reps] [class,class,...]
The optional 4th arg limits probing to named class pairs (e.g.
"00_00,00_10,10_10,10_11,11_11") — each probed class costs 3-4 extra TPU
program compiles, so bound the list on the axon backend.
Prints one JSON line per class pair + a summary with the dot share.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    mol = sys.argv[1] if len(sys.argv) > 1 else "benzene"
    basis_name = sys.argv[2] if len(sys.argv) > 2 else "cc-pVDZ"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qchem_rs_tpu import BasisSet, MolecularSystem
    from qchem_rs_tpu.ops.eri_pallas import r2m_tiles_pallas, tile_vals_pallas
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine, _tile_flops, _tile_shapes
    from qchem_rs_tpu.ops.mcmurchie import nhermite

    basis = BasisSet.load(os.path.join(ROOT, "data", "basis", f"{basis_name}.json"))
    system = MolecularSystem.load(
        os.path.join(ROOT, "data", "mol", f"{mol}.json"), basis
    )
    eng = TiledEriEngine(system, 1e-12)
    metas = eng.layout.metas

    def timed(fn, *args):
        out = fn(*args)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def dots_only(R2m, E1, E2):
        T1, a, A, S1 = E1.shape
        T2, c, C, S2 = E2.shape
        E1m = E1.transpose(1, 3, 2, 0).reshape(a * S1, A, T1)
        E2m = E2.transpose(1, 3, 2, 0).reshape(c * S2, C, T2)
        t1 = jax.lax.dot_general(
            R2m, E1m, (((0,), (0,)), ((2,), (2,))),
            preferred_element_type=R2m.dtype,
        )
        out = jax.lax.dot_general(
            t1, E2m, (((1,), (0,)), ((2,), (2,))),
            preferred_element_type=R2m.dtype,
        )
        return out.transpose(1, 2, 0, 3).reshape(T1 * A, T2 * C)

    @jax.jit
    def convert(Rhi, Rlo):
        return Rhi.astype(jnp.float64) + Rlo.astype(jnp.float64)

    rows = []
    seen = set()
    for name, _fn, segments, (i1, i2, okind) in eng._tasks:
        if okind != "df" or (i1, i2) in seen:
            continue
        if only is not None and not any(o in name for o in only):
            continue
        seen.add((i1, i2))
        m1, m2 = metas[i1], metas[i2]
        T1, T2 = _tile_shapes(m1, m2)
        Lb, Lk = m1.la + m1.lb, m2.la + m2.lb
        E1, p1h, p1l, P1h, P1l = eng._padded_df[i1]
        E2, p2h, p2l, P2h, P2l = eng._padded_df[i2]
        sl1 = lambda x: x[:T1]
        sl2 = lambda x: x[:T2]
        a1 = (sl1(E1), (sl1(p1h), sl1(p1l)), (sl1(P1h), sl1(P1l)))
        a2 = (sl2(E2), (sl2(p2h), sl2(p2l)), (sl2(P2h), sl2(P2l)))

        kernel_s = timed(
            lambda: r2m_tiles_pallas(Lb, Lk, a1[1], a1[2], a2[1], a2[2])
        )
        Rhi, Rlo = r2m_tiles_pallas(Lb, Lk, a1[1], a1[2], a2[1], a2[2])
        conv_s = timed(convert, Rhi, Rlo)
        R2m = convert(Rhi, Rlo)
        dots_s = timed(dots_only, R2m, a1[0], a2[0])
        full_s = timed(
            lambda: tile_vals_pallas(Lb, Lk, *a1, *a2)
        )
        ntiles = sum(len(xs[0]) for xs in segments)
        row = {
            "class": name, "T1xT2": f"{T1}x{T2}", "tiles": ntiles,
            "kernel_ms": round(kernel_s * 1e3, 2),
            "convert_ms": round(conv_s * 1e3, 2),
            "dots_ms": round(dots_s * 1e3, 2),
            "full_ms": round(full_s * 1e3, 2),
            "dot_share": round((conv_s + dots_s) / max(full_s, 1e-12), 3),
            "est_class_s": round(full_s * ntiles, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    tot = sum(r["full_ms"] * r["tiles"] for r in rows) / 1e3
    dot = sum((r["dots_ms"] + r["convert_ms"]) * r["tiles"] for r in rows) / 1e3
    print(json.dumps({
        "summary": True, "mol": mol, "basis": basis_name,
        "backend": jax.default_backend(),
        "est_build_s": round(tot, 2),
        "est_dot_s": round(dot, 2),
        "dot_share": round(dot / tot, 3) if tot else None,
        "n_classes": len(rows),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
