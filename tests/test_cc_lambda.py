"""CC Lambda / analytic unrelaxed properties: FCI, FD, and stationarity
anchors (no density diagrams anywhere — everything is AD through the
verified residual, so the tests attack the three places errors could
hide: the general-f step, the lambda solve, and the Lagrangian assembly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.cc_lambda import (
    _mo_blocks,
    _setup,
    _solve_lambda,
    ccsd_dipole,
    ccsd_expectation,
)
from tests.helpers import load_reference_system


def _fixed_orbital_cc_energy(ctx, f, cc_epsilon=1e-11):
    """Converge CCSD with the general one-electron blocks f at fixed
    orbitals; returns the correlation+perturbation energy."""
    from qchem_rs_tpu.models.cc import _cc_loop, _ccsd_step

    W, eps_o, eps_v = ctx["W"], ctx["eps_o"], ctx["eps_v"]
    no = ctx["no"]
    D2 = (
        eps_o[:, None, None, None]
        + eps_o[None, :, None, None]
        - eps_v[None, None, :, None]
        - eps_v[None, None, None, :]
    )
    t1 = jnp.zeros_like(ctx["t"][0])
    t2 = W[:no, :no, no:, no:] / D2
    step = lambda a, b: _ccsd_step(a, b, eps_o, eps_v, no, W, f)
    t1, t2, e, iters, conv = _cc_loop(step, t1, t2, 0.0, 300, cc_epsilon)
    assert conv
    return e


def test_general_f_ccsd_equals_fci_two_electrons():
    """H2 with a RANDOM symmetric one-electron perturbation at fixed
    orbitals: CCSD is exact for 2 electrons, so the general-f step must
    reproduce FCI of the perturbed integrals to ~1e-9."""
    from qchem_rs_tpu.models.fci import _transform_full, fci_from_integrals
    from qchem_rs_tpu.models.rhf import _incore_tools

    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    ctx = _setup(system, config, 1e-11)
    C = ctx["C"]
    n = C.shape[1]
    rng = np.random.default_rng(3)
    R_ao = rng.standard_normal((n, n)) * 0.05
    R_ao = R_ao + R_ao.T
    f = _mo_blocks(ctx, R_ao)

    e_pert = _fixed_orbital_cc_energy(ctx, f)
    e_cc_total = ctx["out"].total_energy() + float(e_pert) + float(
        jnp.sum(jnp.asarray(ctx["out"].density) * R_ao)
    )

    # FCI with h_mo + R_mo over the same orbitals
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    g_mo = np.asarray(_transform_full(e4, C))
    pos = jnp.asarray(system.positions)
    from qchem_rs_tpu.models.rhf import _incore_tools as _it

    ones, _ = _it(system, config)
    h_mo = np.asarray(C.T @ (ones["T"](pos) + ones["V"](pos) + R_ao) @ C)
    w, _ = fci_from_integrals(h_mo, g_mo, 1, 1, float(system.nuclear_repulsion()))
    assert e_cc_total == pytest.approx(float(w[0]), abs=1e-9)


def test_lambda_stationarity_and_fd_expectation():
    """Water/STO-3G: (a) the Lagrangian is stationary in t along random
    directions (lambda really solves the transposed system); (b) the
    analytic expectation of the dipole-z operator equals the central FD of
    the fixed-orbital CC energy."""
    from qchem_rs_tpu.ops import one_electron

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    ctx = _setup(system, config, 1e-11)
    lam, res = _solve_lambda(ctx)
    G, E, t = ctx["G"], ctx["E"], ctx["t"]

    # (a) stationarity: d/de [E(t+e d) + lam . G(t+e d)] = 0
    rng = np.random.default_rng(5)
    d = (
        jnp.asarray(rng.standard_normal(t[0].shape)),
        jnp.asarray(rng.standard_normal(t[1].shape)),
    )
    lagr = lambda ts: E(ts) + sum(
        jnp.vdot(l, g).real for l, g in zip(jax.tree.leaves(lam), jax.tree.leaves(G(ts)))
    )
    _, dL = jax.jvp(lagr, (t,), (d,))
    scale = float(
        sum(jnp.vdot(x, x).real for x in jax.tree.leaves(d)) ** 0.5
    )
    assert abs(float(dL)) / scale < 1e-7

    # (b) FD of the fixed-orbital CC energy vs the analytic expectation
    d_ao = np.asarray(one_electron.dipole_integrals(system))[2]
    D_hf = np.asarray(ctx["out"].density)
    analytic = ccsd_expectation(ctx, lam, d_ao, D_hf)
    h = 2e-4
    es = []
    for s in (+1.0, -1.0):
        f = _mo_blocks(ctx, s * h * d_ao)
        e_corr = _fixed_orbital_cc_energy(ctx, f)
        e_ref = float(np.sum(D_hf * (s * h * d_ao)))
        es.append(float(e_corr) + e_ref)
    fd = (es[0] - es[1]) / (2 * h)
    assert analytic == pytest.approx(fd, abs=5e-7)


def test_water_ccsd_dipole():
    """Unrelaxed CCSD dipole of water: correlation shrinks the SCF dipole
    (the well-known overestimation) by a few percent, along z only (C2v)."""
    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    res = ccsd_dipole(system, config)
    scf = np.linalg.norm(res.scf_dipole)
    cc = np.linalg.norm(res.ccsd_dipole)
    assert 0.3 < cc < scf  # correlation reduces the HF dipole
    assert (scf - cc) / scf < 0.15
    # symmetry: components perpendicular to the C2 axis stay ~0
    axis = np.argmax(np.abs(res.ccsd_dipole))
    for k in range(3):
        if k != axis:
            assert abs(res.ccsd_dipole[k]) < 1e-8
