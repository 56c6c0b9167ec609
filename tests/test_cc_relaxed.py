"""Orbital-relaxed CCSD dipole (models/cc_relaxed.py, z-vector method).

Anchor: the relaxed dipole IS the derivative of the full field-dependent
SCF+CCSD energy — central finite differences with the SCF re-converged at
each field (config.electric_field) therefore include the orbital response
and must match the z-vector result; the unrelaxed Lambda expectation must
NOT (the difference is the relaxation)."""

import dataclasses

import numpy as np

from qchem_rs_tpu import HartreeFockConfig
from tests.helpers import load_reference_system


def _cc_total_with_field(system, cfg, field):
    from qchem_rs_tpu.models.cc import ccsd

    res = ccsd(system, dataclasses.replace(cfg, electric_field=field))
    return res.total_energy()


def test_relaxed_dipole_matches_finite_field():
    from qchem_rs_tpu.models.cc_relaxed import ccsd_relaxed_dipole

    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    res = ccsd_relaxed_dipole(system, cfg, cc_epsilon=1e-11)

    h = 2e-4
    for d in (0, 2):  # x and z (y is zero by symmetry at this geometry)
        f = [0.0, 0.0, 0.0]
        f[d] = h
        ep = _cc_total_with_field(system, cfg, tuple(f))
        f[d] = -h
        em = _cc_total_with_field(system, cfg, tuple(f))
        mu_fd = -(ep - em) / (2 * h)
        assert abs(res.ccsd_dipole[d] - mu_fd) < 5e-7, (
            d, res.ccsd_dipole[d], mu_fd,
        )

    # the relaxation is a real, nonzero correction
    assert np.max(np.abs(res.ccsd_dipole - res.ccsd_dipole_unrelaxed)) > 1e-5
    # sanity: all three dipoles agree to ~0.1 a.u. (same molecule!)
    assert np.max(np.abs(res.ccsd_dipole - res.scf_dipole)) < 0.1


def test_relaxed_dipole_translation_invariance():
    """Shifting the molecule must shift nothing: the dipole of a NEUTRAL
    molecule is origin-independent, and the z machinery must respect it."""
    from qchem_rs_tpu.models.cc_relaxed import ccsd_relaxed_dipole
    from qchem_rs_tpu.utils.basis import BasisSet
    from qchem_rs_tpu.utils.system import Atom, MolecularSystem

    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    base = load_reference_system("hydrogen", "6-31G")
    shift = np.array([0.7, -0.3, 1.1])
    moved = MolecularSystem(
        [Atom(a.ordinal, np.asarray(a.position) + shift) for a in base.atoms],
        base.basis,
    )
    r0 = ccsd_relaxed_dipole(base, cfg, cc_epsilon=1e-11)
    r1 = ccsd_relaxed_dipole(moved, cfg, cc_epsilon=1e-11)
    np.testing.assert_allclose(r0.ccsd_dipole, r1.ccsd_dipole, atol=1e-7)
