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


def test_h2_eom_oscillator_strengths_equal_fci():
    """Two electrons: EOM-CCSD is exact, so the biorthogonal transition
    strengths must reproduce Hermitian FCI oscillator strengths. Degenerate
    clusters are compared by their summed strength (individual states mix
    arbitrarily inside a multiplet)."""
    from qchem_rs_tpu.models.eom import (
        _build_hamiltonian,
        _one_body_matrix,
        _strings,
        eom_ccsd_properties,
    )
    from qchem_rs_tpu.models.rhf import restricted_hartree_fock
    from qchem_rs_tpu.models.fci import _transform_full
    from qchem_rs_tpu.models.rhf import _incore_tools
    from qchem_rs_tpu.ops import one_electron

    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    res = eom_ccsd_properties(system, config, nstates=5)

    # independent FCI oscillator strengths from the dense H + dipole
    out = restricted_hartree_fock(system, config)
    C = np.asarray(out.coefficients)
    ones, engine = _incore_tools(system, config)
    import jax.numpy as jnp

    pos = jnp.asarray(system.positions)
    h_mo = np.asarray(C.T @ np.asarray(ones["T"](pos) + ones["V"](pos)) @ C)
    e4 = engine.finish_eri(engine.build())
    g_mo = np.asarray(_transform_full(e4, jnp.asarray(C)))
    H, dim = _build_hamiltonian(h_mo, g_mo, 1, 1)
    n = C.shape[1]
    sa, sb = _strings(n, 1), _strings(n, 1)
    dets = [a | (b << n) for a in sa for b in sb]
    index = {m: i for i, m in enumerate(dets)}
    mu_ao = np.asarray(one_electron.dipole_integrals(system))
    Md = [
        _one_body_matrix(-(C.T @ mu_ao[d] @ C), n, dets, index)
        for d in range(3)
    ]
    w, V = np.linalg.eigh(H)
    om = w[1:] - w[0]
    f_fci = np.array([
        (2.0 / 3.0) * om[k] * sum(
            float(V[:, 0] @ Md[d] @ V[:, k + 1]) ** 2 for d in range(3)
        )
        for k in range(5)
    ])
    np.testing.assert_allclose(res.excitation_energies, om[:5], atol=1e-9)
    # cluster-summed comparison over degenerate multiplets
    k = 0
    while k < 5:
        j = k
        while j + 1 < 5 and abs(om[j + 1] - om[k]) < 1e-8:
            j += 1
        np.testing.assert_allclose(
            res.oscillator_strengths[k : j + 1].sum(),
            f_fci[k : j + 1].sum(),
            atol=1e-8,
        )
        k = j + 1
    # H2 has at least one dipole-allowed excitation with substantial f
    assert res.oscillator_strengths.max() > 0.1


def test_water_eom_ground_state_dipole_matches_lambda():
    """The biorthogonal <L0|mubar|R0> ground-state row of the EOM property
    machinery must equal the Lambda-equation analytic unrelaxed CCSD
    dipole — two completely different implementations of the same
    (1+Lambda) e^{-T} mu e^{T} expectation."""
    from qchem_rs_tpu.models.cc_lambda import ccsd_dipole
    from qchem_rs_tpu.models.eom import eom_ccsd_properties

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    res = eom_ccsd_properties(system, config, nstates=2)
    lam = ccsd_dipole(system, config)
    np.testing.assert_allclose(
        res.ground_state_dipole, lam.ccsd_dipole, atol=1e-7
    )
    assert res.ccsd_total_energy == pytest.approx(
        lam.ccsd_total_energy, abs=1e-8
    )


def test_matrix_free_left_eigenvalues_match_right():
    """left=True: the vjp (transpose) Davidson must find the same spectrum
    as the jvp Davidson — one Hbar, two eigenbases. Both formulations."""
    from qchem_rs_tpu.models.eom import eom_ccsd_davidson

    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    for formulation in ("spinorbital", "spatial"):
        res = eom_ccsd_davidson(
            system, config, nstates=3, formulation=formulation,
            tol=1e-8, left=True,
        )
        assert res.left_excitation_energies is not None
        np.testing.assert_allclose(
            res.left_excitation_energies,
            res.excitation_energies,
            atol=1e-7,
        )


def test_production_transition_moments_match_determinant_tier():
    """eom_ccsd_transition_moments (matrix-free AD tier, incl. the
    closed-form disconnected doubles piece) reproduces the EXACT
    determinant-space biorthogonal strengths root by root, and its
    ground-state dipole row equals the Lambda dipole."""
    from qchem_rs_tpu.models.eom import (
        eom_ccsd_properties,
        eom_ccsd_transition_moments,
    )

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    ref = eom_ccsd_properties(system, config, nstates=4, cc_epsilon=1e-11)
    prod = eom_ccsd_transition_moments(
        system, config, nstates=4, tol=1e-8, cc_epsilon=1e-11
    )
    np.testing.assert_allclose(
        prod.excitation_energies, ref.excitation_energies[:4], atol=1e-6
    )
    # per-state summed strengths (directions can mix under degeneracy)
    np.testing.assert_allclose(
        prod.transition_strengths.sum(axis=1),
        ref.transition_strengths[:4].sum(axis=1),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        prod.oscillator_strengths, ref.oscillator_strengths[:4], atol=1e-5
    )
    np.testing.assert_allclose(
        prod.ground_state_dipole, ref.ground_state_dipole, atol=1e-6
    )
