"""Pair-space analytic gradient vs the dense-operator gradient and finite
differences (models/gradients_pair.py)."""

import os

import numpy as np
import pytest

from qchem_rs_tpu import BasisSet, HartreeFockConfig, MolecularSystem, restricted_hartree_fock
from qchem_rs_tpu.models.gradients import rhf_gradient
from qchem_rs_tpu.models.gradients_pair import rhf_gradient_pair

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _load(mol, basis):
    b = BasisSet.load(os.path.join(DATA, "basis", f"{basis}.json"))
    return MolecularSystem.load(os.path.join(DATA, "mol", f"{mol}.json"), b)


@pytest.mark.parametrize("mol,basis", [("water", "STO-3G"), ("water", "6-31G")])
def test_pair_gradient_matches_dense(mol, basis):
    system = _load(mol, basis)
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=300, fock_mode="pair",
        screening_threshold=1e-13,
    )
    out = restricted_hartree_fock(system, cfg)
    assert out.converged
    g_pair = rhf_gradient_pair(system, cfg, output=out)
    cfg_dense = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    out_d = restricted_hartree_fock(system, cfg_dense)
    g_dense = rhf_gradient(system, cfg_dense, output=out_d)
    np.testing.assert_allclose(g_pair, g_dense, atol=5e-9)


def test_pair_gradient_matches_fd():
    system = _load("water", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-12, max_iterations=300, fock_mode="pair",
        screening_threshold=0.0,
    )
    out = restricted_hartree_fock(system, cfg)
    g = rhf_gradient_pair(system, cfg, output=out)
    # central finite difference on one representative coordinate
    k, h = 2, 2e-4
    x0 = np.asarray(system.positions, dtype=np.float64).reshape(-1)
    es = []
    for sgn in (+1.0, -1.0):
        x = x0.copy()
        x[k] += sgn * h
        s = system.with_positions(x.reshape(-1, 3))
        es.append(restricted_hartree_fock(s, cfg).total_energy())
    fd = (es[0] - es[1]) / (2 * h)
    assert g.reshape(-1)[k] == pytest.approx(fd, abs=5e-7)


def test_pair_gradient_translation_invariance():
    system = _load("water", "6-31G")
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=300, fock_mode="pair",
        screening_threshold=1e-13,
    )
    g = rhf_gradient_pair(system, cfg)
    # net force vanishes (translation invariance of the energy)
    np.testing.assert_allclose(g.sum(axis=0), np.zeros(3), atol=1e-8)


def test_uhf_pair_gradient_matches_dense():
    """Open-shell pair-space gradient == dense uhf_gradient (OH radical):
    same frozen-coefficient functional, no n^4 tensor; and the net force
    is translation-invariant."""
    import numpy as np

    from qchem_rs_tpu.config import HartreeFockConfig
    from qchem_rs_tpu.models.gradients import uhf_gradient
    from qchem_rs_tpu.models.gradients_pair import uhf_gradient_pair
    from tests.helpers import load_reference_system

    system = load_reference_system("hydroxyl", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=300, spin_multiplicity=2
    )
    g_dense = uhf_gradient(system, cfg)
    g_pair = uhf_gradient_pair(system, cfg)
    assert np.abs(g_pair - g_dense).max() < 5e-9
    assert np.abs(g_pair.sum(axis=0)).max() < 1e-8


def test_rhf_pair_gradient_unchanged_by_spin_stacking():
    """The closed-shell entry still matches the dense gradient after the
    per-spin density refactor (D_a = D_b = D_t/2 reduction)."""
    import numpy as np

    from qchem_rs_tpu.config import HartreeFockConfig
    from qchem_rs_tpu.models.gradients import rhf_gradient
    from qchem_rs_tpu.models.gradients_pair import rhf_gradient_pair
    from tests.helpers import load_reference_system

    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=200)
    g_dense = rhf_gradient(system, cfg)
    g_pair = rhf_gradient_pair(system, cfg)
    assert np.abs(g_pair - g_dense).max() < 5e-9
