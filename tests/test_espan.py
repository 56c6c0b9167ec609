"""The espan:<w>[:<guard>] stop rule (energy-span noise-band detector,
models/scf.espan_params): stops at the fixed point on a clean-f64 backend
and matches the tight diag_rms answer."""

import numpy as np
import pytest

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.models import scf
from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock
from tests.helpers import load_reference_system


def test_espan_params_parsing():
    assert scf.espan_params("espan:4") == (4, 1e-6)
    assert scf.espan_params("espan:6:1e-5") == (6, 1e-5)
    with pytest.raises(ValueError):
        scf.espan_params("espan:99")


def test_espan_incore_stops_at_fixed_point():
    system = load_reference_system("water", "STO-3G")
    ref = restricted_hartree_fock(
        system, HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    )
    out = restricted_hartree_fock(
        system,
        HartreeFockConfig(
            epsilon=1e-9, convergence_metric="espan:4", max_iterations=200
        ),
    )
    assert out.converged
    # four consecutive energies within 1e-9 -> at the fixed point on CPU
    assert abs(out.total_energy() - ref.total_energy()) < 1e-8
    assert out.iterations <= ref.iterations + 4


def test_espan_pair_mode_agrees():
    system = load_reference_system("water", "STO-3G")
    out = restricted_hartree_fock(
        system,
        HartreeFockConfig(
            epsilon=1e-9, convergence_metric="espan:4", max_iterations=200,
            fock_mode="pair",
        ),
    )
    assert out.converged
    assert abs(out.total_energy() - (-74.963)) < 1e-3


def test_espan_rejected_for_uhf():
    system = load_reference_system("water", "STO-3G")
    with pytest.raises(ValueError, match="espan"):
        unrestricted_hartree_fock(
            system, HartreeFockConfig(convergence_metric="espan:4")
        )
