"""UHF: closed-shell equivalence with RHF, open-shell behavior, charge/spin
support the reference lacks (main.rs:111-117 drops the flags)."""

import numpy as np
import pytest

from qchem_rs_tpu import (
    HartreeFockConfig,
    restricted_hartree_fock,
    unrestricted_hartree_fock,
)
from tests.helpers import load_reference_system

TIGHT = HartreeFockConfig(epsilon=1e-10, max_iterations=300)


def test_uhf_equals_rhf_closed_shell():
    system = load_reference_system("water", "STO-3G")
    r = restricted_hartree_fock(system, TIGHT)
    u = unrestricted_hartree_fock(system, TIGHT)
    assert u.converged
    assert abs(r.total_energy() - u.total_energy()) < 1e-8
    np.testing.assert_allclose(
        u.orbital_energies_alpha, u.orbital_energies_beta, atol=1e-8
    )
    np.testing.assert_allclose(
        r.orbital_energies, u.orbital_energies_alpha, atol=1e-6
    )


def test_uhf_hydrogen_molecule():
    system = load_reference_system("hydrogen", "STO-3G")
    u = unrestricted_hartree_fock(system, TIGHT)
    assert u.converged
    assert abs(u.total_energy() - (-1.1167)) < 1e-4


def test_uhf_triplet_o2_like():
    # O atom pair at H2 geometry is unphysical; use water with multiplicity 3
    # (an excited configuration): must converge and lie above the singlet.
    system = load_reference_system("water", "STO-3G")
    singlet = unrestricted_hartree_fock(system, TIGHT)
    triplet = unrestricted_hartree_fock(
        system,
        HartreeFockConfig(epsilon=1e-10, max_iterations=300, spin_multiplicity=3),
    )
    assert triplet.converged
    assert triplet.total_energy() > singlet.total_energy()
    # alpha/beta orbitals must split for an open shell
    assert (
        np.abs(
            triplet.orbital_energies_alpha - triplet.orbital_energies_beta
        ).max()
        > 1e-3
    )


def test_uhf_doublet_oh_radical():
    # water with charge +1 -> 9 electrons, doublet (needs real charge/spin
    # support, which the reference stubs out)
    system = load_reference_system("water", "STO-3G")
    dbl = unrestricted_hartree_fock(
        system,
        HartreeFockConfig(
            epsilon=1e-10, max_iterations=300, charge=1, spin_multiplicity=2
        ),
    )
    assert dbl.converged
    assert dbl.total_energy() > -76.0
