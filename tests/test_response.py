"""Finite-field SCF + CPHF static polarizability, cross-validated.

The external electric field (config.electric_field) and the analytic
response formula are independent code paths that must agree:
  * dE/dF = -mu pins the field-coupling sign convention against the
    already-tested dipole_moment (tests/test_properties.py);
  * alpha_CPHF == d(mu)/dF (finite difference) pins the 4 d (A+B)^{-1} d
    prefactor and the whole (A, B) assembly.
"""

import dataclasses

import numpy as np

from qchem_rs_tpu import (
    HartreeFockConfig,
    dipole_moment,
    restricted_hartree_fock,
)
from qchem_rs_tpu.models.response import static_polarizability
from tests.helpers import load_reference_system

CFG = HartreeFockConfig(epsilon=1e-11, max_iterations=300)


def _run_field(system, field):
    cfg = dataclasses.replace(CFG, electric_field=tuple(field))
    out = restricted_hartree_fock(system, cfg)
    assert out.converged
    return out


def test_field_energy_derivative_is_minus_dipole():
    """dE/dF_d (finite difference) == -mu_d at F=0, all three components."""
    system = load_reference_system("water", "STO-3G")
    out0 = restricted_hartree_fock(system, CFG)
    mu0 = dipole_moment(system, out0.density)
    h = 2e-4
    for d in range(3):
        f = np.zeros(3)
        f[d] = h
        ep = _run_field(system, f).total_energy()
        em = _run_field(system, -f).total_energy()
        assert abs((ep - em) / (2 * h) + mu0[d]) < 1e-6, d


def test_cphf_polarizability_matches_finite_field():
    """alpha from one (A+B) solve == d(mu)/dF from field-perturbed SCF."""
    system = load_reference_system("water", "STO-3G")
    alpha = static_polarizability(system, CFG)
    h = 1e-3
    fd = np.zeros((3, 3))
    for d in range(3):
        f = np.zeros(3)
        f[d] = h
        op = _run_field(system, f)
        om = _run_field(system, -f)
        mup = dipole_moment(system, op.density)
        mum = dipole_moment(system, om.density)
        fd[:, d] = (mup - mum) / (2 * h)
    assert np.abs(alpha - fd).max() < 1e-4, (alpha, fd)
    # physical invariants: symmetric, positive definite
    assert np.abs(alpha - alpha.T).max() < 1e-8
    assert np.all(np.linalg.eigvalsh(alpha) > 0)


def test_dynamic_polarizability():
    """alpha(0) == static; alpha(omega) grows toward the first pole and
    diverges consistently with the lowest TDHF excitation energy."""
    from qchem_rs_tpu.models.cis import cis
    from qchem_rs_tpu.models.response import dynamic_polarizability

    system = load_reference_system("water", "STO-3G")
    from qchem_rs_tpu import restricted_hartree_fock

    out = restricted_hartree_fock(system, CFG)
    a0 = static_polarizability(system, CFG, output=out)
    d0 = dynamic_polarizability(system, CFG, omega=0.0, output=out)
    np.testing.assert_allclose(d0, a0, atol=1e-9)

    w1 = cis(system, CFG, nstates=1, tdhf=True, output=out).excitation_energies[0]
    below = dynamic_polarizability(system, CFG, omega=0.9 * w1, output=out)
    # dispersion: every diagonal element grows as omega approaches the pole
    assert (np.diag(below) > np.diag(a0) - 1e-12).all()
    near = dynamic_polarizability(system, CFG, omega=0.999 * w1, output=out)
    # the component coupled to the first pole diverges (water: the
    # in-plane-perpendicular axis); compare per element, not across axes
    assert (np.diag(near) / np.diag(a0)).max() > 10


def test_field_runs_in_pair_mode():
    """The field term applies identically on the pair-space path."""
    system = load_reference_system("water", "STO-3G")
    f = (0.0, 1e-3, -2e-3)
    dense = _run_field(system, f)
    pair_cfg = dataclasses.replace(
        CFG, electric_field=f, fock_mode="pair"
    )
    pair = restricted_hartree_fock(system, pair_cfg)
    assert pair.converged
    assert abs(pair.total_energy() - dense.total_energy()) < 1e-9
