"""SAD initial guess (models/sad.py) and the composite noise-aware stop
(models/scf.py convergence_value/converged_flag): both are round-5 iteration
levers on the emulated-f64 TPU backend (VERDICT round 4, item 2)."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.models.sad import _fractional_occupations, sad_guess
from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock
from tests.helpers import load_reference_system


def test_fractional_occupations_degenerate_sharing():
    # 6 electrons over [-1, 3x -0.5, 0.2]: core gets 2, the degenerate triple
    # shares the remaining 4 equally, the high orbital stays empty
    w = np.array([-1.0, -0.5, -0.5, -0.5, 0.2])
    occ = _fractional_occupations(w, 6)
    np.testing.assert_allclose(occ, [2.0, 4 / 3, 4 / 3, 4 / 3, 0.0], atol=1e-12)
    assert abs(occ.sum() - 6) < 1e-12


def test_fractional_occupations_full_and_empty():
    occ = _fractional_occupations(np.array([-2.0, -1.0]), 4)
    np.testing.assert_allclose(occ, [2.0, 2.0])
    occ = _fractional_occupations(np.array([-2.0, -1.0, 0.0]), 0)
    np.testing.assert_allclose(occ, [0.0, 0.0, 0.0])


def test_sad_guess_electron_count_water():
    # Tr[D S] of the neutral SAD block assembly = total electron count
    system = load_reference_system("water", "STO-3G")
    D = sad_guess(system)
    from qchem_rs_tpu.ops import one_electron

    S = np.asarray(one_electron.overlap(system))
    assert abs(np.sum(D * S) - 10.0) < 1e-6


def test_sad_rhf_same_fixed_point_fewer_iterations():
    system = load_reference_system("water", "6-31G")
    base = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out_h = restricted_hartree_fock(system, base)
    import dataclasses

    out_s = restricted_hartree_fock(
        system, dataclasses.replace(base, initial_guess="sad")
    )
    assert out_h.converged and out_s.converged
    assert abs(out_h.total_energy() - out_s.total_energy()) < 1e-8
    # the entire point of SAD: it must not be SLOWER than Hückel here
    assert out_s.iterations <= out_h.iterations
    assert "guess_s" in out_s.timings


def test_sad_uhf_radical():
    system = load_reference_system("hydroxyl", "6-31G")
    import dataclasses

    base = HartreeFockConfig(
        epsilon=1e-9, max_iterations=200, spin_multiplicity=2, charge=0
    )
    out_h = unrestricted_hartree_fock(system, base)
    out_s = unrestricted_hartree_fock(
        system, dataclasses.replace(base, initial_guess="sad")
    )
    assert out_h.converged and out_s.converged
    assert abs(out_h.total_energy() - out_s.total_energy()) < 1e-7


def test_composite_stop_matches_fixed_point():
    # composite@1e-8: |dE| below epsilon on two consecutive passes, gated on
    # the diag guard — must land within 1e-7 Eh of the tight fixed point
    system = load_reference_system("water", "6-31G")
    tight = restricted_hartree_fock(
        system, HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    )
    comp = restricted_hartree_fock(
        system,
        HartreeFockConfig(
            epsilon=1e-8, max_iterations=200, convergence_metric="composite"
        ),
    )
    assert comp.converged
    assert abs(comp.total_energy() - tight.total_energy()) < 1e-7


def test_composite_sad_together():
    # the round-5 bench configuration: SAD guess + composite stop
    system = load_reference_system("water", "cc-pVDZ")
    tight = restricted_hartree_fock(
        system, HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    )
    out = restricted_hartree_fock(
        system,
        HartreeFockConfig(
            epsilon=1e-8,
            max_iterations=200,
            convergence_metric="composite",
            initial_guess="sad",
        ),
    )
    assert out.converged
    assert abs(out.total_energy() - tight.total_energy()) < 1e-7
    assert out.iterations < tight.iterations


def test_composite_guard_parses():
    from qchem_rs_tpu.models.scf import composite_guard

    assert composite_guard("composite") == 1e-6
    assert composite_guard("composite:1e-5") == 1e-5


def test_composite_uhf_radical_matches_fixed_point():
    system = load_reference_system("hydroxyl", "6-31G")
    import dataclasses

    base = HartreeFockConfig(
        epsilon=1e-10, max_iterations=300, spin_multiplicity=2
    )
    tight = unrestricted_hartree_fock(system, base)
    comp = unrestricted_hartree_fock(
        system,
        dataclasses.replace(
            base, epsilon=1e-8, convergence_metric="composite",
            initial_guess="sad",
        ),
    )
    assert comp.converged
    assert abs(comp.total_energy() - tight.total_energy()) < 1e-7


def test_sad_subprocess_path_matches_inprocess(tmp_path, monkeypatch):
    """The axon-locked fallback (no cpu backend in-process -> batched child
    with JAX_PLATFORMS=cpu) must produce the same densities as the
    in-process solver. This is the path the TPU bench exercises."""
    from qchem_rs_tpu.models import sad as sad_mod
    from qchem_rs_tpu.utils.basis import BasisSet

    monkeypatch.setenv("QCHEM_SAD_CACHE", str(tmp_path))
    basis = BasisSet.load("/root/repo/data/basis/STO-3G.json")
    inproc = sad_mod.compute_atomic_density(basis, 8, False)
    sub = sad_mod._solve_in_subprocess(basis, [1, 8], False)
    assert set(sub) == {1, 8}
    np.testing.assert_allclose(sub[8], inproc, atol=1e-9)


def test_sad_disk_cache_round_trip(tmp_path, monkeypatch):
    from qchem_rs_tpu.models import sad as sad_mod
    from qchem_rs_tpu.utils.basis import BasisSet

    monkeypatch.setenv("QCHEM_SAD_CACHE", str(tmp_path))
    basis = BasisSet.load("/root/repo/data/basis/STO-3G.json")
    first = sad_mod._atomic_densities(basis, [1], False)
    import os

    assert len(os.listdir(tmp_path)) == 1
    # second call must be a pure disk hit: poison the solvers
    monkeypatch.setattr(sad_mod, "compute_atomic_density",
                        lambda *a: (_ for _ in ()).throw(AssertionError))
    monkeypatch.setattr(sad_mod, "_solve_in_subprocess",
                        lambda *a: (_ for _ in ()).throw(AssertionError))
    again = sad_mod._atomic_densities(basis, [1], False)
    np.testing.assert_array_equal(first[1], again[1])
