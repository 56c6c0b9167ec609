"""RHF end-to-end: literature values, independent-numpy cross-validation,
and reference-parity behaviors."""

import numpy as np
import pytest

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from tests.helpers import load_reference_system, make_synthetic_system
from tests.reference.np_scf import rhf_np

TIGHT = HartreeFockConfig(epsilon=1e-10, max_iterations=200)


def test_h2_sto3g_szabo_ostlund():
    # H2 at R = 1.4 Bohr / STO-3G: E_HF = -1.1167 Eh (Szabo & Ostlund §3.5.2)
    system = load_reference_system("hydrogen", "STO-3G")
    out = restricted_hartree_fock(system, TIGHT)
    assert out.converged
    assert abs(out.total_energy() - (-1.1167)) < 1e-4
    # nuclear repulsion 1*1/1.4
    np.testing.assert_allclose(out.nuclear_repulsion, 1.0 / 1.4, rtol=1e-12)


def test_water_sto3g_vs_independent_numpy_scf():
    system = load_reference_system("water", "STO-3G")
    out = restricted_hartree_fock(system, TIGHT)
    assert out.converged
    e_np, w_np = rhf_np(system)
    assert abs(out.total_energy() - e_np) < 1e-8
    np.testing.assert_allclose(out.orbital_energies, w_np, atol=1e-7)


def test_methane_631g_literature():
    # CH4 RHF/6-31G (BASELINE config "methane/6-31G RHF+DIIS"):
    # literature E_HF = -40.1805 Eh at the standard geometry.
    system = load_reference_system("methane", "6-31G")
    out = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-8, max_iterations=200))
    assert out.converged
    assert abs(out.total_energy() - (-40.1805)) < 1e-3


def test_energy_stability_under_epsilon():
    # tightening convergence must not change the converged energy (fixed point)
    system = load_reference_system("hydrogen", "STO-3G")
    e1 = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-8)).total_energy()
    e2 = restricted_hartree_fock(system, HartreeFockConfig(epsilon=1e-12, max_iterations=300)).total_energy()
    assert abs(e1 - e2) < 1e-9


def test_rotation_translation_invariance():
    system = load_reference_system("water", "STO-3G")
    out0 = restricted_hartree_fock(system, TIGHT)
    # rotate + translate the geometry
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ]
    )
    pos = system.positions @ R.T + np.array([1.5, -2.0, 0.3])
    out1 = restricted_hartree_fock(system.with_positions(pos), TIGHT)
    assert abs(out0.total_energy() - out1.total_energy()) < 1e-9


def test_charge_support():
    # the reference ignores charge (rhf.rs:36); we honor it: OH- has 10 e-
    system = load_reference_system("water", "STO-3G")
    neutral = restricted_hartree_fock(system, TIGHT)
    cation = restricted_hartree_fock(
        system, HartreeFockConfig(epsilon=1e-10, max_iterations=200, charge=2)
    )
    assert neutral.converged and cation.converged
    assert neutral.total_energy() < cation.total_energy()


def test_nonconvergence_reported():
    system = load_reference_system("water", "STO-3G")
    out = restricted_hartree_fock(
        system, HartreeFockConfig(max_iterations=1, epsilon=1e-14)
    )
    assert not out.converged


def test_sustained_metrics_converge(data_dir):
    """The "2"-suffixed metrics (two consecutive passes below epsilon —
    DIIS-transient-proof variants for the noisy emulated-f64 backend)
    reach the same fixed point as their plain forms."""
    from qchem_rs_tpu import (
        BasisSet,
        HartreeFockConfig,
        MolecularSystem,
        restricted_hartree_fock,
    )

    b = BasisSet.load(f"{data_dir}/basis/6-31G.json")
    s = MolecularSystem.load(f"{data_dir}/mol/water.json", b)
    ref = restricted_hartree_fock(
        s, HartreeFockConfig(epsilon=1e-9, convergence_metric="diag_rms")
    )
    for metric in ("diis_err2", "diag_rms2"):
        out = restricted_hartree_fock(
            s, HartreeFockConfig(epsilon=1e-8, convergence_metric=metric)
        )
        assert out.converged, metric
        assert abs(out.total_energy() - ref.total_energy()) < 1e-7, metric
        # the sustained form needs at least one extra observing pass
        assert out.iterations >= 2
