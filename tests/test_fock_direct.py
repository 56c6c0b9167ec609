"""The streaming integral-direct J/K builder must match the dense-ERI
contraction (the product's fock_mode="direct" path, ops/fock_stream.py)."""

import numpy as np
import pytest

from qchem_rs_tpu.ops.eri import eri
from qchem_rs_tpu.ops.fock_stream import StreamingFockBuilder
from tests.helpers import load_reference_system, make_synthetic_system


def _dense_jk(system, D):
    E = np.asarray(eri(system))
    J = np.einsum("ijkl,kl->ij", E, D)
    K = np.einsum("ikjl,kl->ij", E, D)
    return J, K


@pytest.mark.parametrize(
    "maker",
    [
        lambda: load_reference_system("water", "STO-3G"),
        lambda: make_synthetic_system(lmax=2, seed=5),
    ],
    ids=["water-sto3g", "synthetic-spd"],
)
def test_streaming_jk_matches_dense(maker):
    system = maker()
    n = system.n_basis()
    rng = np.random.default_rng(42)
    D = rng.standard_normal((n, n))
    D = D + D.T  # density-like symmetric matrix
    Jd, Kd = _dense_jk(system, D)
    builder = StreamingFockBuilder(system, threshold=0.0)
    J, K = builder.jk(D)
    np.testing.assert_allclose(np.asarray(J), Jd, atol=1e-10, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(K), Kd, atol=1e-10, rtol=1e-9)


def test_screening_drops_nothing_significant():
    system = load_reference_system("water", "STO-3G")
    n = system.n_basis()
    rng = np.random.default_rng(0)
    D = rng.standard_normal((n, n))
    D = D + D.T
    tight = StreamingFockBuilder(system, threshold=0.0)
    screened = StreamingFockBuilder(system, threshold=1e-10)
    J0, K0 = tight.jk(D)
    J1, K1 = screened.jk(D)
    np.testing.assert_allclose(np.asarray(J0), np.asarray(J1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(K0), np.asarray(K1), atol=1e-8)
