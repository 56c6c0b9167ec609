"""Level shifting: same fixed point, shifted virtuals."""

from qchem_rs_tpu import (
    HartreeFockConfig,
    restricted_hartree_fock,
    unrestricted_hartree_fock,
)
from tests.helpers import load_reference_system


def test_level_shift_same_energy():
    system = load_reference_system("water", "STO-3G")
    plain = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-10, max_iterations=200))
    shifted = restricted_hartree_fock(
        system,
        HartreeFockConfig(epsilon=1e-10, max_iterations=300, level_shift=0.5),
    )
    assert shifted.converged
    assert abs(shifted.total_energy() - plain.total_energy()) < 1e-8


def test_uhf_level_shift_same_energy():
    """The UHF loop must HONOR level_shift (the reference accepts-and-drops
    CLI flags, main.rs:111-117 — the defect class we refuse to reproduce)."""
    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    plain = unrestricted_hartree_fock(system, cfg)
    shifted = unrestricted_hartree_fock(
        system,
        HartreeFockConfig(epsilon=1e-10, max_iterations=300, level_shift=0.4),
    )
    assert shifted.converged
    assert abs(shifted.total_energy() - plain.total_energy()) < 1e-8
