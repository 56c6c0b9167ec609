"""Memory-lean antisymmetrized terms tensor vs the two-tensor construction."""

import numpy as np
import pytest

from qchem_rs_tpu.ops.eri import eri
from qchem_rs_tpu.ops.fock import eri_terms
from tests.helpers import load_reference_system, make_synthetic_system


@pytest.mark.parametrize(
    "maker",
    [
        lambda: load_reference_system("water", "STO-3G"),
        lambda: make_synthetic_system(lmax=2, seed=7),
    ],
    ids=["water", "synthetic-spd"],
)
def test_terms_matches_reference_construction(maker):
    system = maker()
    E4 = np.asarray(eri(system))
    want = E4 - 0.5 * E4.transpose(0, 2, 1, 3)
    got = np.asarray(eri_terms(system))
    np.testing.assert_allclose(got, want, atol=1e-11, rtol=1e-9)


def test_terms_screened_close_to_exact():
    system = load_reference_system("water", "STO-3G")
    exact = np.asarray(eri_terms(system))
    screened = np.asarray(eri_terms(system, screening_threshold=1e-10))
    np.testing.assert_allclose(screened, exact, atol=1e-8)
