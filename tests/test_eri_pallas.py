"""Pallas df ERI tile kernel (ops/eri_pallas.py) vs the XLA f64 tile path.

These tests run ONLY on a real TPU: Mosaic is TPU-only, and Pallas
interpret mode on XLA:CPU recreates the pathological df-graph compile the
kernel exists to avoid (measured round 3: >4 min for an L=0 brick). The
CPU suite (conftest forces the cpu backend) therefore skips them; the TPU
bench path exercises the kernel on every benchmark run since it is the
default tile kernel on TPU (eri_tiled._kernel_mode).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic kernels need a TPU; interpret mode hits the XLA:CPU "
    "df-graph compile pathology",
)


@pytest.mark.parametrize(
    "Lb,Lk,a,c,T1,T2",
    [(0, 0, 9, 9, 16, 32), (1, 1, 4, 4, 8, 16), (2, 2, 2, 2, 8, 8), (4, 4, 1, 1, 8, 8)],
)
def test_tile_vals_pallas_matches_f64(Lb, Lk, a, c, T1, T2):
    import jax.numpy as jnp

    from qchem_rs_tpu.ops import dfloat as dfl
    from qchem_rs_tpu.ops.eri_pallas import tile_vals_pallas
    from qchem_rs_tpu.ops.eri_tiled import _tile_vals
    from qchem_rs_tpu.ops.mcmurchie import nhermite
    from qchem_rs_tpu.ops.angular import ncart

    A, C = ncart(Lb) ** 1, ncart(Lk) ** 1  # any contraction-layout works
    S1, S2 = nhermite(Lb), nhermite(Lk)
    rng = np.random.default_rng(7)
    E1 = jnp.asarray(rng.standard_normal((T1, a, A, S1)))
    E2 = jnp.asarray(rng.standard_normal((T2, c, C, S2)))
    p1 = rng.uniform(0.3, 8.0, (T1, a))
    p2 = rng.uniform(0.3, 8.0, (T2, c))
    P1 = rng.standard_normal((T1, a, 3)) * 1.5
    P2 = rng.standard_normal((T2, c, 3)) * 1.5
    ref = np.asarray(
        _tile_vals(Lb, Lk, E1, jnp.asarray(p1), jnp.asarray(P1),
                   E2, jnp.asarray(p2), jnp.asarray(P2))
    )
    out = np.asarray(
        tile_vals_pallas(
            Lb, Lk,
            E1, dfl.split_f64(jnp.asarray(p1)), dfl.split_f64(jnp.asarray(P1)),
            E2, dfl.split_f64(jnp.asarray(p2)), dfl.split_f64(jnp.asarray(P2)),
        )
    )
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-12


def test_engine_pallas_matches_f64_water():
    import os

    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine
    from qchem_rs_tpu.utils.basis import BasisSet
    from qchem_rs_tpu.utils.system import MolecularSystem

    data = os.path.join(os.path.dirname(__file__), "..", "data")
    b = BasisSet.load(os.path.join(data, "basis", "STO-3G.json"))
    s = MolecularSystem.load(os.path.join(data, "mol", "water.json"), b)
    os.environ["QCHEM_KERNEL"] = "pallas"
    try:
        Vp = np.asarray(TiledEriEngine(s, 1e-12).build())
    finally:
        os.environ.pop("QCHEM_KERNEL")
    os.environ["QCHEM_KERNEL"] = "f64"
    try:
        Vf = np.asarray(TiledEriEngine(s, 1e-12).build())
    finally:
        os.environ.pop("QCHEM_KERNEL")
    scale = np.abs(Vf).max()
    assert np.abs(Vp - Vf).max() / scale < 1e-12


@pytest.mark.parametrize(
    "Lb,Lk,a,c,T1,T2",
    [(0, 0, 9, 9, 16, 32), (1, 1, 4, 4, 8, 16), (1, 2, 4, 2, 8, 8)],
)
def test_tile_vals_pallas_e1_matches(Lb, Lk, a, c, T1, T2):
    """Fused-E1 kernel (bra contraction inside Mosaic, df accumulation over
    the ia grid dim) vs the standard kernel + XLA f64 dot1."""
    import jax.numpy as jnp

    from qchem_rs_tpu.ops import dfloat as dfl
    from qchem_rs_tpu.ops.angular import ncart
    from qchem_rs_tpu.ops.eri_pallas import tile_vals_pallas, tile_vals_pallas_e1
    from qchem_rs_tpu.ops.mcmurchie import nhermite

    A, C = ncart(Lb), ncart(Lk)
    S1, S2 = nhermite(Lb), nhermite(Lk)
    rng = np.random.default_rng(11)
    E1 = jnp.asarray(rng.standard_normal((T1, a, A, S1)))
    E2 = jnp.asarray(rng.standard_normal((T2, c, C, S2)))
    p1 = dfl.split_f64(jnp.asarray(rng.uniform(0.3, 8.0, (T1, a))))
    p2 = dfl.split_f64(jnp.asarray(rng.uniform(0.3, 8.0, (T2, c))))
    P1 = dfl.split_f64(jnp.asarray(rng.standard_normal((T1, a, 3)) * 1.5))
    P2 = dfl.split_f64(jnp.asarray(rng.standard_normal((T2, c, 3)) * 1.5))
    ref = np.asarray(tile_vals_pallas(Lb, Lk, E1, p1, P1, E2, p2, P2))
    E1df = dfl.split_f64(E1.reshape(T1, a, A * S1))
    out = np.asarray(
        tile_vals_pallas_e1(Lb, Lk, E1df, p1, P1, E2, p2, P2)
    )
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-12


def test_engine_fused_e1_matches_standard_water():
    import os

    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine
    from qchem_rs_tpu.utils.basis import BasisSet
    from qchem_rs_tpu.utils.system import MolecularSystem

    data = os.path.join(os.path.dirname(__file__), "..", "data")
    b = BasisSet.load(os.path.join(data, "basis", "6-31G.json"))
    s = MolecularSystem.load(os.path.join(data, "mol", "water.json"), b)
    os.environ["QCHEM_KERNEL"] = "pallas"
    try:
        os.environ["QCHEM_PL_FUSEDE"] = "0"  # fused is the default now
        try:
            Vp = np.asarray(TiledEriEngine(s, 1e-12).build())
        finally:
            os.environ.pop("QCHEM_PL_FUSEDE")
        os.environ["QCHEM_PL_FUSEDE"] = "1"
        try:
            eng = TiledEriEngine(s, 1e-12)
            assert any(n.endswith("_ple") for n, *_ in eng._tasks)
            Ve = np.asarray(eng.build())
        finally:
            os.environ.pop("QCHEM_PL_FUSEDE")
    finally:
        os.environ.pop("QCHEM_KERNEL")
    scale = np.abs(Vp).max()
    assert np.abs(Ve - Vp).max() / scale < 1e-12
