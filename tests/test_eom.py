"""EOM-CCSD (determinant-space) against FCI, CCSD, and CIS anchors."""

import numpy as np
import pytest

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.eom import eom_ccsd
from qchem_rs_tpu.models.fci import fci
from tests.helpers import load_reference_system


def test_h2_eom_equals_fci_spectrum():
    """Two electrons: the rank<=2 space IS the full space and CCSD is
    exact, so every EOM-CCSD excitation equals the FCI gap to ~1e-9."""
    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    res = eom_ccsd(system, config, nstates=5)
    ref = fci(system, config, nroots=6)
    assert res.dimension == res.fci_dimension  # full space at 2 electrons
    gaps = ref.total_energies[1:] - ref.total_energies[0]
    np.testing.assert_allclose(res.excitation_energies, gaps[:5], atol=1e-9)
    assert res.ccsd_total_energy == pytest.approx(
        float(ref.total_energies[0]), abs=1e-9
    )


def test_water_eom_anchors():
    """Water/STO-3G: <Phi0|Hbar|Phi0> reproduces E_CCSD (validates the
    T-operator expansion + exp series end to end — the amplitude equations
    re-emerge as a vanishing Hbar column), and the lowest excitations land
    within a few mEh of FCI, beating CIS."""
    from qchem_rs_tpu.models.cc import ccsd
    from qchem_rs_tpu.models.cis import cis

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    res = eom_ccsd(system, config, nstates=3)
    cc = ccsd(system, config, cc_epsilon=1e-10, formulation="spinorbital")
    assert res.ccsd_total_energy == pytest.approx(cc.total_energy(), abs=1e-8)
    assert res.amplitude_residual < 1e-8
    assert res.dimension < res.fci_dimension  # genuine truncation here

    ref = fci(system, config, nroots=4)
    fci_gaps = ref.total_energies[1:] - ref.total_energies[0]
    # EOM-CCSD within a few mEh of FCI on the lowest roots
    assert abs(res.excitation_energies[0] - fci_gaps[0]) < 5e-3
    # and better than CIS (singlet + triplet spectrum union vs FCI gap)
    ci = cis(system, config, nstates=3, triplet=True)
    cis_err = abs(ci.excitation_energies[0] - fci_gaps[0])
    eom_err = abs(res.excitation_energies[0] - fci_gaps[0])
    assert eom_err < cis_err


def test_open_shell_rejected():
    system = load_reference_system("hydroxyl", "STO-3G")
    config = HartreeFockConfig(
        epsilon=1e-9, max_iterations=200, spin_multiplicity=2
    )
    with pytest.raises(ValueError, match="closed-shell"):
        eom_ccsd(system, config)


def test_h2_ip_exact():
    """H2 IP channel: the (N-1) sector is one electron, where the
    projected space is complete and the cation energy is just the lowest
    eigenvalue of h_MO + E_nuc — IP-EOM must hit it exactly."""
    import jax.numpy as jnp

    from qchem_rs_tpu.models.cc import ccsd
    from qchem_rs_tpu.models.eom import ip_eom_ccsd
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    res = ip_eom_ccsd(system, config, nstates=2)
    out = restricted_hartree_fock(system, config)
    C = jnp.asarray(out.coefficients)
    ones, _ = _incore_tools(system, config)
    pos = jnp.asarray(system.positions)
    h_mo = np.asarray(C.T @ (ones["T"](pos) + ones["V"](pos)) @ C)
    e_ion = float(np.linalg.eigvalsh(h_mo)[0]) + float(system.nuclear_repulsion())
    cc = ccsd(system, config, cc_epsilon=1e-10)
    ip_exact = e_ion - cc.total_energy()
    assert res.energies[0] == pytest.approx(ip_exact, abs=1e-8)
    assert res.ccsd_total_energy == pytest.approx(cc.total_energy(), abs=1e-8)
    assert res.energies[0] > 0.5  # H2 IP ~ 0.6 Eh


def test_water_ip_ea_vs_fci():
    """Water/STO-3G: IP/EA-EOM-CCSD within 10 mEh of the exact (FCI)
    electron-removal/attachment energies; Koopmans is the worse estimate
    for the IP."""
    from qchem_rs_tpu.models.eom import ea_eom_ccsd, ip_eom_ccsd

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    neutral = fci(system, config)
    cation = fci(
        system,
        HartreeFockConfig(
            epsilon=1e-10, max_iterations=100, charge=1, spin_multiplicity=2
        ),
        orbitals="lowdin",
    )
    anion = fci(
        system,
        HartreeFockConfig(
            epsilon=1e-10, max_iterations=100, charge=-1, spin_multiplicity=2
        ),
        orbitals="lowdin",
    )
    ip_exact = cation.total_energy() - neutral.total_energy()
    ea_exact = anion.total_energy() - neutral.total_energy()

    ip = ip_eom_ccsd(system, config, nstates=2)
    ea = ea_eom_ccsd(system, config, nstates=2)
    assert abs(ip.energies[0] - ip_exact) < 1e-2
    assert abs(ea.energies[0] - ea_exact) < 1e-2
    # EOM beats Koopmans for the first IP
    assert abs(ip.energies[0] - ip_exact) < abs(ip.koopmans - ip_exact)
    # STO-3G water anion is unbound: attachment costs energy
    assert ea.energies[0] > 0


def test_matrix_free_eom_matches_determinant_space():
    """Production EOM (Davidson over jvp sigma vectors — zero transcribed
    diagrams) reproduces the exact determinant-space roots: spinorbital
    finds all Ms=0 roots, spatial finds the singlet subset."""
    from qchem_rs_tpu.models.eom import eom_ccsd_davidson

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    ref = eom_ccsd(system, config, nstates=6, cc_epsilon=1e-11)
    mf = eom_ccsd_davidson(
        system, config, nstates=4, tol=1e-7, cc_epsilon=1e-11
    )
    np.testing.assert_allclose(
        mf.excitation_energies,
        ref.excitation_energies[:4],
        atol=1e-6,
    )
    # spatial formulation: singlet roots only, each present in the full set
    sp = eom_ccsd_davidson(
        system, config, nstates=2, formulation="spatial",
        tol=1e-7, cc_epsilon=1e-11,
    )
    for w in sp.excitation_energies:
        assert np.min(np.abs(ref.excitation_energies - w)) < 1e-6
    # the lowest root of water CIS-like spectra is a triplet: the spatial
    # (singlet-only) lowest root must lie ABOVE the spinorbital lowest
    assert sp.excitation_energies[0] > mf.excitation_energies[0] - 1e-8
