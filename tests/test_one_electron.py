"""One-electron integrals (McMurchie-Davidson, JAX) vs the independent
Obara-Saika numpy oracle, plus analytic spot checks."""

import numpy as np
import pytest

from qchem_rs_tpu.ops.one_electron import kinetic, nuclear, overlap
from tests.helpers import load_reference_system, make_synthetic_system
from tests.reference.os_integrals import kinetic_np, nuclear_np, overlap_np


@pytest.fixture(scope="module", params=[1, 2, 3], ids=["p", "d", "f"])
def synthetic(request):
    return make_synthetic_system(lmax=request.param, seed=request.param)


def test_overlap_vs_os(synthetic):
    got = np.asarray(overlap(synthetic))
    want = overlap_np(synthetic)
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-10)
    # unit-normalized AOs: exact unit diagonal
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-12)
    np.testing.assert_allclose(got, got.T, atol=1e-13)


def test_kinetic_vs_os(synthetic):
    got = np.asarray(kinetic(synthetic))
    want = kinetic_np(synthetic)
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-10)


def test_nuclear_vs_os(synthetic):
    got = np.asarray(nuclear(synthetic))
    want = nuclear_np(synthetic)
    np.testing.assert_allclose(got, want, atol=1e-11, rtol=1e-9)


def test_water_sto3g_shapes_and_symmetry():
    system = load_reference_system("water", "STO-3G")
    assert system.n_basis() == 7  # O: 2s+1p(3), H: 1s each
    S = np.asarray(overlap(system))
    T = np.asarray(kinetic(system))
    V = np.asarray(nuclear(system))
    for M in (S, T, V):
        np.testing.assert_allclose(M, M.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-12)
    assert (np.linalg.eigvalsh(S) > 1e-8).all()
    assert np.all(np.diag(T) > 0)
    assert np.all(np.diag(V) < 0)


def test_hydrogen_sto3g_analytic_overlap():
    # H2 at 1.4 Bohr: the textbook STO-3G overlap between the two 1s AOs
    # is ~0.6593 (Szabo & Ostlund table 3.5)
    system = load_reference_system("hydrogen", "STO-3G")
    S = np.asarray(overlap(system))
    assert abs(S[0, 1] - 0.6593) < 2e-4
