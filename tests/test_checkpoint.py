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


def test_warm_start_reuses_precompiled_executable(monkeypatch):
    """A warm-started run must execute the SAME precompiled SCF program as a
    cold run (the guess is an operand selected by a traced flag) — it must
    never fall back to a fresh jit trace, which costs a full TPU compile
    (~45 s/program) on every --resume / chained-sweep step."""
    from qchem_rs_tpu.models import rhf as rhf_mod
    from qchem_rs_tpu.models.rhf import precompile_rhf

    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    precompile_rhf(system, cfg)
    cold = restricted_hartree_fock(system, cfg)

    def boom(*a, **k):
        raise AssertionError("warm start re-traced _rhf_scf")

    monkeypatch.setattr(rhf_mod, "_rhf_scf", boom)
    warm = restricted_hartree_fock(system, cfg, density_guess=cold.density)
    assert warm.converged
    assert abs(warm.total_energy() - cold.total_energy()) < 1e-9


def test_chained_sweep_single_compile():
    """chained_sweep warm-starts each conformer through ONE traced program."""
    from qchem_rs_tpu.parallel.sweep import chained_sweep

    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    geoms = np.stack(
        [system.positions, system.positions * 1.002, system.positions]
    )
    energies, converged = chained_sweep(system, geoms, cfg)
    assert converged.all()
    ref = restricted_hartree_fock(system, cfg).total_energy()
    assert abs(energies[0] - ref) < 1e-9
    assert abs(energies[2] - ref) < 1e-9
    # the perturbed middle geometry has a genuinely different energy
    assert abs(energies[1] - energies[0]) > 1e-6
