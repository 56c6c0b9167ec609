"""Harmonic frequencies from the semi-numerical Hessian (H2)."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig
from qchem_rs_tpu.models.hessian import harmonic_frequencies
from qchem_rs_tpu.models.optimize import optimize_geometry
from tests.helpers import load_reference_system


def test_h2_harmonic_frequency():
    system = load_reference_system("hydrogen", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    opt = optimize_geometry(system, cfg)
    assert opt.converged
    res = harmonic_frequencies(system.with_positions(opt.positions), cfg)
    freqs = res.frequencies_cm1
    # 3N-5 = 5 near-zero modes at a converged diatomic minimum
    assert res.n_zero_modes == 5, freqs
    # one real stretch; RHF/STO-3G H2 harmonic frequency ~5480 cm^-1
    stretch = freqs[-1]
    assert 5000.0 < stretch < 6000.0, stretch
