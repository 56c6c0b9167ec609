"""Dipole moments + Mulliken charges from the converged density."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.models.properties import (
    AU_TO_DEBYE,
    dipole_moment,
    mulliken_charges,
)
from tests.helpers import load_reference_system


def test_h2_dipole_zero():
    system = load_reference_system("hydrogen", "STO-3G")
    out = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-10))
    mu = dipole_moment(system, out.density)
    assert np.abs(mu).max() < 1e-8


def test_water_dipole_translation_invariant_and_physical():
    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = restricted_hartree_fock(system, cfg)
    mu = dipole_moment(system, out.density)
    # translated copy of the NEUTRAL molecule: same dipole
    shifted = system.with_positions(np.asarray(system.positions) + 3.7)
    out2 = restricted_hartree_fock(shifted, cfg)
    mu2 = dipole_moment(shifted, out2.density)
    assert np.abs(mu - mu2).max() < 1e-6
    # water HF/STO-3G dipole ~1.7 D (minimal-basis literature ballpark)
    d = np.linalg.norm(mu) * AU_TO_DEBYE
    assert 1.2 < d < 2.2, d


def test_mulliken_charges_water():
    system = load_reference_system("water", "STO-3G")
    out = restricted_hartree_fock(
        system, HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    )
    q = mulliken_charges(system, out.density)
    assert abs(q.sum()) < 1e-8  # neutral molecule
    # oxygen (first atom in water.json) carries the negative charge
    assert q[0] < -0.1
    assert (q[1:] > 0.05).all()


def test_spin_expectation_closed_shell_pure():
    """A closed-shell UHF solution is spin-pure: <S^2> = 0 to ~1e-8."""
    import qchem_rs_tpu
    from qchem_rs_tpu.models.properties import spin_expectation

    system = load_reference_system("water", "STO-3G")
    cfg = qchem_rs_tpu.HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = qchem_rs_tpu.unrestricted_hartree_fock(system, cfg)
    assert out.converged
    s2, excess = spin_expectation(system, out.coefficients, 5, 5)
    assert abs(s2) < 1e-8
    assert abs(excess) < 1e-8


def test_spin_expectation_doublet_contamination():
    """OH radical: <S^2> slightly above the exact 0.75, by a small positive
    contamination (UHF always overshoots)."""
    import qchem_rs_tpu
    from qchem_rs_tpu.models.properties import spin_expectation

    system = load_reference_system("hydroxyl", "STO-3G")
    cfg = qchem_rs_tpu.HartreeFockConfig(
        epsilon=1e-9, max_iterations=300, spin_multiplicity=2
    )
    out = qchem_rs_tpu.unrestricted_hartree_fock(system, cfg)
    assert out.converged
    s2, excess = spin_expectation(system, out.coefficients, 5, 4)
    assert 0.75 <= s2 < 0.80
    assert 0.0 <= excess < 0.05
