"""Determinism + numerical-hygiene tests (SURVEY.md §5: the TPU-native
analogue of race detection/sanitizers — XLA determinism and NaN checks)."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.ops.eri import eri
from qchem_rs_tpu.ops.one_electron import kinetic, nuclear, overlap
from tests.helpers import load_reference_system


def test_bitwise_deterministic_integrals():
    system = load_reference_system("water", "STO-3G")
    a = np.asarray(eri(system))
    b = np.asarray(eri(system))
    assert (a == b).all()  # bitwise, not approx
    s1, s2 = np.asarray(overlap(system)), np.asarray(overlap(system))
    assert (s1 == s2).all()


def test_bitwise_deterministic_scf():
    system = load_reference_system("hydrogen", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10)
    o1 = restricted_hartree_fock(system, cfg)
    o2 = restricted_hartree_fock(system, cfg)
    assert o1.electronic_energy == o2.electronic_energy
    assert (o1.density == o2.density).all()


def test_no_nans_anywhere():
    system = load_reference_system("water", "STO-3G")
    for M in (overlap(system), kinetic(system), nuclear(system)):
        assert np.isfinite(np.asarray(M)).all()
    assert np.isfinite(np.asarray(eri(system))).all()
    out = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-10))
    assert np.isfinite(out.density).all()
    assert np.isfinite(out.orbital_energies).all()
