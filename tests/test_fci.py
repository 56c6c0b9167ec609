"""Determinant FCI vs a brute-force second-quantization oracle.

Chain of trust for the correlation tier: tests/reference/second_quant.py
builds H by literally applying creation/annihilation operators with
explicit fermionic signs (zero shared code with the product module);
models/fci.py must reproduce it element-by-element — validating every
Slater-Condon rule and phase — and FCI's orbital invariance then validates
the MO-transform plumbing end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.fci import (
    _build_hamiltonian,
    _transform_full,
    fci,
    fci_from_integrals,
)
from tests.helpers import load_reference_system
from tests.reference.second_quant import brute_force_hamiltonian, random_integrals


def test_bruteforce_match_random_closed_shell():
    h, g = random_integrals(4, seed=1)
    H_ref = brute_force_hamiltonian(h, g, 2, 2)
    H, dim = _build_hamiltonian(h, g, 2, 2)
    assert dim == 36
    np.testing.assert_allclose(H, H_ref, atol=1e-11)
    np.testing.assert_allclose(H, H.T, atol=1e-11)


def test_bruteforce_match_random_open_shell():
    h, g = random_integrals(5, seed=2)
    H_ref = brute_force_hamiltonian(h, g, 2, 1)
    H, dim = _build_hamiltonian(h, g, 2, 1)
    assert dim == 50
    np.testing.assert_allclose(H, H_ref, atol=1e-11)


def test_bruteforce_match_h2_631g():
    """Real molecular integrals (H2/6-31G, n=4): brute-force H, structured H,
    and the end-to-end fci() driver all agree."""
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    out = restricted_hartree_fock(system, config)
    assert out.converged
    C = jnp.asarray(out.coefficients)
    ones, engine = _incore_tools(system, config)
    pos = jnp.asarray(system.positions)
    h_mo = np.asarray(C.T @ (ones["T"](pos) + ones["V"](pos)) @ C)
    g_mo = np.asarray(_transform_full(engine.finish_eri(engine.build()), C))

    H_ref = brute_force_hamiltonian(h_mo, g_mo, 1, 1)
    H, dim = _build_hamiltonian(h_mo, g_mo, 1, 1)
    assert dim == 16
    np.testing.assert_allclose(H, H_ref, atol=1e-11)

    e_nuc = float(system.nuclear_repulsion())
    w, _ = fci_from_integrals(h_mo, g_mo, 1, 1, e_nuc)
    res = fci(system, config)
    assert res.scf_total_energy == pytest.approx(out.total_energy(), abs=1e-12)
    assert res.total_energy() == pytest.approx(float(w[0]), abs=1e-12)
    # correlation lowers the energy
    assert res.total_energy() < out.total_energy() - 1e-3


def test_fci_orbital_invariance():
    """Full CI is invariant under the orthonormal single-particle basis:
    converged RHF orbitals and Loewdin-orthogonalized AOs give identical
    eigenvalues — a sharp end-to-end check of every phase and transform."""
    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    a = fci(system, config, nroots=3, orbitals="rhf")
    b = fci(system, config, nroots=3, orbitals="lowdin")
    np.testing.assert_allclose(a.total_energies, b.total_energies, atol=1e-9)
    assert b.scf_total_energy is None
    assert np.all(np.diff(a.total_energies) >= 0)


def test_fci_water_sto3g_bounds():
    """Water/STO-3G (dim 441): FCI sits below MP2, which sits below RHF."""
    from qchem_rs_tpu.models.mp2 import mp2

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    res = fci(system, config)
    assert res.dimension == 441
    m = mp2(system, config)
    assert res.scf_total_energy == pytest.approx(m.scf_total_energy, abs=1e-9)
    # FCI correlation is more negative than MP2's at this tier
    assert res.correlation_energy() < m.correlation_energy < 0.0


def test_fci_open_shell_hydroxyl():
    """OH radical (9 electrons, STO-3G, dim 90) through Loewdin orbitals:
    below the UHF energy, auto mode picks lowdin for the open shell."""
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    system = load_reference_system("hydroxyl", "STO-3G")
    config = HartreeFockConfig(
        epsilon=1e-9, max_iterations=300, spin_multiplicity=2
    )
    res = fci(system, config)
    assert (res.n_alpha, res.n_beta) == (5, 4)
    assert res.dimension == 90
    uhf = unrestricted_hartree_fock(system, config)
    assert uhf.converged
    assert res.total_energy() < uhf.total_energy() - 1e-4


def test_fci_dimension_cap():
    h, g = random_integrals(8, seed=3)
    with pytest.raises(ValueError, match="max_dim"):
        fci_from_integrals(h, g, 4, 4, max_dim=100)
