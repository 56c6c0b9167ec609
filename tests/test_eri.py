"""ERI engine (McMurchie-Davidson, JAX) vs the independent Obara-Saika numpy
oracle, closed-form values, and symmetry properties."""

import numpy as np
import pytest

from qchem_rs_tpu.ops.eri import eri
from tests.helpers import load_reference_system, make_synthetic_system
from tests.reference.os_integrals import eri_np, prim_eri


def test_ssss_closed_form():
    # (ss|ss) for four unit-exponent s primitives at the same center:
    # (00|00) = 2 pi^{5/2} / (p q sqrt(p+q)) with p=q=2 -> F_0(0)=1
    v = prim_eri(
        1.0, (0, 0, 0), [0, 0, 0],
        1.0, (0, 0, 0), [0, 0, 0],
        1.0, (0, 0, 0), [0, 0, 0],
        1.0, (0, 0, 0), [0, 0, 0],
    )
    want = 2.0 * np.pi**2.5 / (2.0 * 2.0 * np.sqrt(4.0))
    np.testing.assert_allclose(v, want, rtol=1e-14)


@pytest.mark.parametrize("lmax,seed", [(1, 1), (2, 2), (3, 3)], ids=["sp", "spd", "spdf"])
def test_eri_vs_os(lmax, seed):
    system = make_synthetic_system(lmax=lmax, seed=seed)
    got = np.asarray(eri(system))
    want = eri_np(system)
    np.testing.assert_allclose(got, want, atol=1e-11, rtol=1e-9)


def test_eri_8fold_symmetry_water():
    system = load_reference_system("water", "STO-3G")
    E = np.asarray(eri(system))
    assert E.shape == (7, 7, 7, 7)
    np.testing.assert_allclose(E, E.transpose(1, 0, 2, 3), atol=1e-12)
    np.testing.assert_allclose(E, E.transpose(0, 1, 3, 2), atol=1e-12)
    np.testing.assert_allclose(E, E.transpose(2, 3, 0, 1), atol=1e-12)
    # (ii|ii) are positive (Coulomb self-repulsion)
    assert (np.einsum("iiii->i", E) > 0).all()


def test_eri_water_vs_os():
    system = load_reference_system("water", "STO-3G")
    got = np.asarray(eri(system))
    want = eri_np(system)
    np.testing.assert_allclose(got, want, atol=1e-11, rtol=1e-9)


def test_eri_screened_sorted_mixed_precision_vs_os(monkeypatch):
    # screening_threshold > 0 activates Schwarz-bound pair sorting; forcing
    # F32_TILE_BOUND also exercises the opt-in f32 low-bound tile path
    # (default off — see ops/eri_tiled.py). Each f32 integral must stay
    # within ~rel-1e-6 x bound of the oracle.
    from qchem_rs_tpu.ops import eri_tiled

    monkeypatch.setattr(eri_tiled, "F32_TILE_BOUND", 1e-6)
    system = load_reference_system("ethylene", "STO-3G")
    got = np.asarray(eri(system, screening_threshold=1e-12))
    want = eri_np(system)
    np.testing.assert_allclose(got, want, atol=1e-11, rtol=1e-9)
