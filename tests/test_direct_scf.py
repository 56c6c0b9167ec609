"""Integral-direct RHF (fock_mode='direct') must match the in-core path."""

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from tests.helpers import load_reference_system


def test_direct_rhf_matches_incore():
    system = load_reference_system("water", "STO-3G")
    cfg_in = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    cfg_dir = HartreeFockConfig(
        epsilon=1e-10, max_iterations=200, fock_mode="direct",
        screening_threshold=1e-14,
    )
    incore = restricted_hartree_fock(system, cfg_in)
    direct = restricted_hartree_fock(system, cfg_dir)
    assert direct.converged
    assert abs(direct.total_energy() - incore.total_energy()) < 1e-9
