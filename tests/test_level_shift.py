"""Level shifting: same fixed point, shifted virtuals."""

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
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
