"""Geometry optimization on analytic gradients."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig
from qchem_rs_tpu.models.optimize import optimize_geometry
from tests.helpers import load_reference_system


def test_h2_bond_length():
    """RHF/STO-3G H2 equilibrium bond: 1.346 Bohr (textbook; start 1.4)."""
    system = load_reference_system("hydrogen", "STO-3G")
    res = optimize_geometry(
        system, HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    )
    assert res.converged
    bond = np.linalg.norm(res.positions[1] - res.positions[0])
    assert abs(bond - 1.346) < 0.01, bond
    # energy decreased and the trace is (weakly) monotone at the ends
    assert res.energy <= res.energies[0] + 1e-12
    assert res.gradient_norm < 3e-4


def test_oh_radical_open_shell_optimization():
    """UHF/STO-3G OH radical: optimize routes through uhf_gradient (odd
    electron count -> open shell) and shortens the gradient norm."""
    system = load_reference_system("hydroxyl", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=400, spin_multiplicity=2
    )
    res = optimize_geometry(system, cfg, gtol=1e-4, max_steps=25)
    assert res.converged
    assert res.energy <= res.energies[0] + 1e-12
    bond = np.linalg.norm(res.positions[1] - res.positions[0])
    assert 1.5 < bond < 2.2, bond  # O-H near ~1.8 Bohr at UHF/STO-3G
