"""RRHO thermochemistry: textbook anchors and exact identities."""

import numpy as np
import pytest

from qchem_rs_tpu.models.thermo import R_GAS, thermochemistry
from qchem_rs_tpu.utils.basis import BasisSet, ShellSpec
from qchem_rs_tpu.utils.system import Atom, MolecularSystem
from tests.helpers import load_reference_system


def _atom_system(z: int) -> MolecularSystem:
    basis = BasisSet(
        "dummy", {z: [ShellSpec(l=0, exponents=np.array([1.0]),
                                coefficients=np.array([1.0]))]}
    )
    return MolecularSystem([Atom(z, np.zeros(3))], basis)


def test_argon_sackur_tetrode():
    """S_trans(Ar, 298.15 K, 1 bar) = 154.85 J/(mol K) — the textbook
    Sackur-Tetrode value (standard state = 1 bar; 1 atm sits R ln 1.01325
    = 0.11 lower) — and an atom has no rotational entropy."""
    res = thermochemistry(_atom_system(18), [], pressure=1.0e5)
    assert res.entropy_parts["rot"] == 0.0
    assert res.entropy_parts["vib"] == 0.0
    assert res.entropy == pytest.approx(154.85, abs=0.05)
    assert res.n_vibrations == 0
    # monatomic ideal gas: U = 3/2 RT, H = U + RT
    assert res.thermal_enthalpy == pytest.approx(
        res.thermal_energy * (5.0 / 3.0), rel=1e-12
    )


def test_h2_rotational_temperature_and_identities():
    system = load_reference_system("hydrogen", "STO-3G")
    res = thermochemistry(
        system, [4401.2], symmetry_number=2
    )
    assert res.linear
    assert res.n_vibrations == 1
    # H2 bond ~1.4 Bohr -> Theta_rot ~ 87.5 K
    assert 80.0 < float(res.rotational_temperatures[0]) < 95.0
    # exact identities (all in Hartree / J/mol consistent units)
    from qchem_rs_tpu.models.thermo import HARTREE_J, NA

    h_j = res.thermal_enthalpy * HARTREE_J * NA
    g_j = res.thermal_gibbs * HARTREE_J * NA
    u_j = res.thermal_energy * HARTREE_J * NA
    assert g_j == pytest.approx(h_j - res.temperature * res.entropy, abs=1e-6)
    assert h_j == pytest.approx(u_j + R_GAS * res.temperature, abs=1e-6)
    # ZPE of a 4401.2 cm^-1 mode is ~0.01003 Hartree
    assert res.zpe == pytest.approx(0.010026, abs=1e-5)


def test_water_nonlinear_and_zero_mode_filter():
    system = load_reference_system("water", "STO-3G")
    # full 3N list with translation/rotation junk below the 50 cm^-1 gate
    freqs = [-12.0, 0.5, 3.0, 8.0, 20.0, 31.0, 1700.0, 3800.0, 3900.0]
    res = thermochemistry(system, freqs, symmetry_number=2)
    assert not res.linear
    assert res.n_vibrations == 3
    assert res.rotational_temperatures.shape == (3,)
    assert res.entropy_parts["trans"] > res.entropy_parts["rot"] > 0


def test_vibrational_low_temperature_limit():
    """As T -> 0+: S_vib -> 0 and the thermal energy collapses onto ZPE."""
    system = load_reference_system("hydrogen", "STO-3G")
    res = thermochemistry(system, [4401.2], temperature=5.0, symmetry_number=2)
    assert res.entropy_parts["vib"] == pytest.approx(0.0, abs=1e-12)
    # U(5 K) = ZPE + (3/2 + 1) R T in Hartree
    from qchem_rs_tpu.models.thermo import HARTREE_J, NA

    extra = (res.thermal_energy - res.zpe) * HARTREE_J * NA
    assert extra == pytest.approx(2.5 * R_GAS * 5.0, rel=1e-10)


def test_electronic_spin_entropy():
    res1 = thermochemistry(_atom_system(18), [])
    res2 = thermochemistry(_atom_system(18), [], spin_multiplicity=2)
    assert res2.entropy - res1.entropy == pytest.approx(
        R_GAS * np.log(2.0), rel=1e-12
    )
