"""Analytic nuclear gradients vs central finite differences of the SCF
energy — the fully re-converged energy, so the test checks the Pulay
(overlap-response) term, not just Hellmann-Feynman."""

import numpy as np
import pytest

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.models.gradients import rhf_gradient, uhf_gradient
from tests.helpers import load_reference_system


def _fd_energy(system, cfg, runner, atom, axis, h=2e-4):
    pos = np.array(system.positions)
    pos_p = pos.copy(); pos_p[atom, axis] += h
    pos_m = pos.copy(); pos_m[atom, axis] -= h
    ep = runner(system.with_positions(pos_p), cfg).total_energy()
    em = runner(system.with_positions(pos_m), cfg).total_energy()
    return (ep - em) / (2 * h)


def test_rhf_gradient_matches_fd():
    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    g = rhf_gradient(system, cfg)
    assert g.shape == (len(system.atoms), 3)
    for atom, axis in [(0, 2), (1, 0)]:
        fd = _fd_energy(system, cfg, restricted_hartree_fock, atom, axis)
        assert abs(g[atom, axis] - fd) < 5e-7, (atom, axis, g[atom, axis], fd)


def test_rhf_gradient_translational_invariance():
    """Sum of forces vanishes (no net translation force)."""
    system = load_reference_system("water", "STO-3G")
    g = rhf_gradient(system, HartreeFockConfig(epsilon=1e-11, max_iterations=300))
    assert np.abs(g.sum(axis=0)).max() < 1e-7


def test_uhf_gradient_matches_rhf_closed_shell():
    """Closed-shell UHF gradient == RHF gradient."""
    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    gr = rhf_gradient(system, cfg)
    gu = uhf_gradient(system, cfg)
    assert np.abs(gr - gu).max() < 1e-6
