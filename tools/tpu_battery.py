"""TPU measurement battery (run when the tunnel is back).

Phases, each printed with flush so partial logs survive kills:
 1. health probe
 2. drained pallas-vs-f64 tile microbench (np.asarray drains, n>=10)
 3. water/STO-3G + water/cc-pVDZ engine equivalence (pallas vs f64)
 4. benzene/cc-pVDZ V2 build timing pallas vs f64 (cold + warm, drained)
 5. benzene/cc-pVDZ full RHF (incore pallas) — the headline
 6. SCF rms trajectory at eps=1e-8 (verbose) for iteration diagnostics
"""
import os, sys, time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import qchem_rs_tpu
from qchem_rs_tpu.utils.basis import BasisSet
from qchem_rs_tpu.utils.system import MolecularSystem

data = __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))), "data")
print("backend", jax.default_backend(), flush=True)
t0 = time.time()
np.asarray(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
print(f"[1] health ok {time.time()-t0:.1f}s", flush=True)

# --- [2] drained tile microbench ------------------------------------------
from qchem_rs_tpu.ops import dfloat as dfl
from qchem_rs_tpu.ops.eri_tiled import _tile_vals
from qchem_rs_tpu.ops.eri_pallas import tile_vals_pallas
from qchem_rs_tpu.ops.mcmurchie import nhermite

rng = np.random.default_rng(0)
cases = [
    ("ss", 0, 0, 9, 9, 1, 1, 128, 128),
    ("sp", 1, 1, 9, 9, 3, 3, 128, 128),
    ("pp", 2, 2, 9, 9, 9, 9, 128, 128),
    ("pd", 3, 3, 4, 4, 18, 18, 64, 128),
    ("dd", 4, 4, 1, 1, 36, 36, 64, 128),
]
for name, Lb, Lk, a, c, A, C, T1, T2 in cases:
    S1, S2 = nhermite(Lb), nhermite(Lk)
    E1 = jnp.asarray(rng.standard_normal((T1, a, A, S1)))
    E2 = jnp.asarray(rng.standard_normal((T2, c, C, S2)))
    p1 = rng.uniform(0.3, 8.0, (T1, a)); p2 = rng.uniform(0.3, 8.0, (T2, c))
    P1 = rng.standard_normal((T1, a, 3)) * 1.5; P2 = rng.standard_normal((T2, c, 3)) * 1.5
    f64 = jax.jit(lambda *xs: _tile_vals(Lb, Lk, *xs))
    ref_args = (E1, jnp.asarray(p1), jnp.asarray(P1), E2, jnp.asarray(p2), jnp.asarray(P2))
    pal_args = (E1, dfl.split_f64(jnp.asarray(p1)), dfl.split_f64(jnp.asarray(P1)),
                E2, dfl.split_f64(jnp.asarray(p2)), dfl.split_f64(jnp.asarray(P2)))
    pal = jax.jit(lambda E1, p1, P1, E2, p2, P2: tile_vals_pallas(Lb, Lk, E1, p1, P1, E2, p2, P2))
    r = np.asarray(f64(*ref_args)); q = np.asarray(pal(*pal_args))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f64(*ref_args)
    np.asarray(out); t_ref = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pal(*pal_args)
    np.asarray(out); t_pal = (time.perf_counter() - t0) / reps
    err = np.abs(q - r).max() / np.abs(r).max()
    print(f"[2] {name}: f64 {t_ref*1e3:7.2f} ms  pallas {t_pal*1e3:7.2f} ms  "
          f"x{t_ref/max(t_pal,1e-9):4.2f}  err {err:.1e}", flush=True)

# --- [3] engine equivalence ------------------------------------------------
def engine(s, mode, thr=1e-12):
    os.environ["QCHEM_KERNEL"] = mode
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine
    try:
        return TiledEriEngine(s, thr)
    finally:
        os.environ.pop("QCHEM_KERNEL", None)

for basis, mol in [("STO-3G", "water"), ("cc-pVDZ", "water")]:
    b = BasisSet.load(f"{data}/basis/{basis}.json")
    s = MolecularSystem.load(f"{data}/mol/{mol}.json", b)
    t0 = time.time(); Vp = np.asarray(engine(s, "pallas").build()); tp = time.time()-t0
    t0 = time.time(); Vf = np.asarray(engine(s, "f64").build()); tf = time.time()-t0
    print(f"[3] {mol}/{basis}: rel err {np.abs(Vp-Vf).max()/np.abs(Vf).max():.2e} "
          f"(pallas cold {tp:.0f}s, f64 cold {tf:.0f}s)", flush=True)

# --- [4] benzene V2 build --------------------------------------------------
bcc = BasisSet.load(f"{data}/basis/cc-pVDZ.json")
sb = MolecularSystem.load(f"{data}/mol/benzene.json", bcc)
for mode in ("pallas", "f64"):
    ep = engine(sb, mode)
    t0 = time.time(); V = ep.build(); V = np.asarray(V); t_cold = time.time()-t0
    t0 = time.time(); V = ep.build(); V = np.asarray(V); t_warm = time.time()-t0
    print(f"[4] benzene V2 {mode}: cold {t_cold:.1f}s warm {t_warm:.1f}s", flush=True)

# --- [5] full benzene RHF (pallas default on TPU) --------------------------
from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.models.rhf import precompile_rhf

cfg = HartreeFockConfig(epsilon=1e-8, max_iterations=150)
t0 = time.time(); precompile_rhf(sb, cfg); t_pre = time.time()-t0
t0 = time.time(); out = restricted_hartree_fock(sb, cfg); t_cold = time.time()-t0
t0 = time.time(); out = restricted_hartree_fock(sb, cfg); t_warm = time.time()-t0
print(f"[5] benzene RHF: precompile {t_pre:.0f}s cold {t_cold:.1f}s warm {t_warm:.1f}s "
      f"E {out.total_energy():.8f} iters {out.iterations} conv {out.converged} "
      f"timings {out.timings}", flush=True)

# --- [6] rms trajectory -----------------------------------------------------
import dataclasses
cfgv = dataclasses.replace(cfg, verbose=True)
out = restricted_hartree_fock(sb, cfgv)
print(f"[6] trajectory run done: iters {out.iterations}", flush=True)
print("DONE", flush=True)
