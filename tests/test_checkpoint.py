"""Checkpoint dump/resume and warm-started SCF."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.utils.checkpoint import ScfCheckpoint, from_rhf_output
from tests.helpers import load_reference_system


def test_checkpoint_roundtrip(tmp_path):
    system = load_reference_system("hydrogen", "STO-3G")
    out = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-10))
    ck = from_rhf_output(out, system)
    path = tmp_path / "scf.npz"
    ck.save(path)
    ck2 = ScfCheckpoint.load(path)
    np.testing.assert_allclose(ck2.density, out.density)
    assert ck2.kind == "rhf"
    assert ck2.electronic_energy == out.electronic_energy


def test_warm_start_converges_faster(tmp_path):
    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    cold = restricted_hartree_fock(system, cfg)
    warm = restricted_hartree_fock(system, cfg, density_guess=cold.density)
    assert warm.converged
    assert abs(warm.total_energy() - cold.total_energy()) < 1e-9
    assert warm.iterations <= cold.iterations
