"""CCSD Lambda equations and analytic one-electron properties via AD.

The CC Lagrangian L(t, lam; theta) = E(t; theta) + lam . G(t; theta) is
stationary in t and lam, so first-order properties need NO density
diagrams:

    dE/dtheta = dE/dtheta|_t + lam . dG/dtheta|_t,

with lam from ONE linear solve   J^T lam = -dE/dt   (J = dG/dt). Every
piece is automatic differentiation through the verified CCSD residual:
J^T via jax.vjp, dE/dt via jax.grad, dG/dtheta via jax.jvp over the
general one-electron blocks the amplitude step accepts (models/cc.py,
``f=(foo, fov, fvv)``). GMRES with the orbital-energy-difference diagonal
as preconditioner solves the lambda system in ~CC-iteration-count steps.

These are UNRELAXED properties (fixed HF orbitals — the standard CC
expectation value; orbital relaxation/z-vector is the documented next
rung). Anchors (tests/test_cc_lambda.py): with a random general f the
2-electron CCSD still equals FCI of the perturbed integrals exactly; the
analytic expectation equals the central finite difference of the
fixed-orbital CC energy to ~1e-7; lam itself makes the Lagrangian
stationary (directional FD in t vanishes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.utils.system import MolecularSystem


@dataclasses.dataclass
class CcPropertyOutput:
    scf_total_energy: float
    ccsd_total_energy: float
    scf_dipole: np.ndarray  # (3,) a.u.
    ccsd_dipole: np.ndarray  # (3,) a.u., unrelaxed
    lambda_iterations: int


def _setup(system, config, cc_epsilon):
    """Converged spinorbital amplitudes + residual/energy closures."""
    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.cc import (
        _cc_loop,
        _ccsd_step,
        _spinorbital_setup,
    )
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    n_el = system.n_electrons(config.charge)
    na, nb = scf_mod.electron_counts(n_el, config.spin_multiplicity)
    if na != nb:
        raise ValueError("cc properties require a closed-shell RHF reference")
    out = restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged")
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    W, eps_o, eps_v, no, nv = _spinorbital_setup(e4, C, C, eps, eps, na, nb, 0)
    D1 = eps_o[:, None] - eps_v[None, :]
    D2 = (
        eps_o[:, None, None, None]
        + eps_o[None, :, None, None]
        - eps_v[None, None, :, None]
        - eps_v[None, None, None, :]
    )
    Woovv = W[:no, :no, no:, no:]
    t1 = jnp.zeros((no, nv))
    t2 = Woovv / D2
    e_mp2 = float(0.25 * jnp.einsum("ijab,ijab->", Woovv, t2))
    step = lambda a, b: _ccsd_step(a, b, eps_o, eps_v, no, W)
    t1, t2, e_corr, iters, converged = _cc_loop(
        step, t1, t2, e_mp2, 200, cc_epsilon
    )
    if not converged:
        raise RuntimeError("CCSD amplitudes not converged")

    def G(ts, f=None):
        a, b = ts
        t1n, t2n, _ = _ccsd_step(a, b, eps_o, eps_v, no, W, f)
        return (D1 * (t1n - a), D2 * (t2n - b))

    def E_corr_fn(ts, f=None):
        a, b = ts
        e = 0.25 * jnp.einsum("ijab,ijab->", Woovv, b) + 0.5 * jnp.einsum(
            "ijab,ia,jb->", Woovv, a, a
        )
        if f is not None:
            e = e + jnp.einsum("ia,ia->", f[1], a)
        return e

    return {
        "out": out,
        "C": C,
        "na": na,
        "nb": nb,
        "no": no,
        "nv": nv,
        "t": (t1, t2),
        "G": G,
        "E": E_corr_fn,
        "D": (D1, D2),
        "e_corr": e_corr,
        "cc_iters": iters,
        "W": W,
        "eps_o": eps_o,
        "eps_v": eps_v,
    }


def _solve_lambda(ctx, tol: float = 1e-9):
    """lam from J^T lam = -dE/dt via preconditioned GMRES (jax.vjp gives
    the transposed Jacobian action). Returns (lam pytree, iterations)."""
    G, E, t = ctx["G"], ctx["E"], ctx["t"]
    D1, D2 = ctx["D"]
    b = jax.grad(lambda ts: E(ts))(t)
    b = jax.tree.map(lambda x: -x, b)
    _, vjp_fn = jax.vjp(lambda ts: G(ts), t)

    def A(v):
        return vjp_fn(v)[0]

    def M(v):
        return (v[0] / (-D1), v[1] / (-D2))

    lam, info = jax.scipy.sparse.linalg.gmres(
        A, b, M=M, tol=tol, atol=0.0, maxiter=200, restart=40
    )
    # residual check (gmres info is unreliable across jax versions)
    r = jax.tree.map(lambda x, y: x - y, A(lam), b)
    rn = float(
        jnp.sqrt(sum(jnp.vdot(x, x).real for x in jax.tree.leaves(r)))
    )
    bn = float(
        jnp.sqrt(sum(jnp.vdot(x, x).real for x in jax.tree.leaves(b)))
    )
    if rn > 1e-6 * max(bn, 1.0):
        raise RuntimeError(f"lambda GMRES residual {rn:.2e} (|b|={bn:.2e})")
    return lam, rn


def _mo_blocks(ctx, V_ao):
    """Spinorbital (Voo, Vov, Vvv) blocks of a one-electron AO operator,
    in the amplitude index convention ([occ_a, occ_b | virt_a, virt_b];
    both spins share the spatial blocks for an RHF reference)."""
    C = ctx["C"]
    na = ctx["na"]
    n = C.shape[1]
    Vmo = np.asarray(C.T @ jnp.asarray(V_ao) @ C)
    occ_sp = np.concatenate([np.arange(na), np.arange(na)])
    vir_sp = np.concatenate([np.arange(na, n), np.arange(na, n)])
    # spin-diagonal mask: first half alpha, second half beta
    so = np.array([0] * na + [1] * na)
    sv = np.array([0] * (n - na) + [1] * (n - na))
    Voo = (so[:, None] == so[None, :]) * Vmo[np.ix_(occ_sp, occ_sp)]
    Vov = (so[:, None] == sv[None, :]) * Vmo[np.ix_(occ_sp, vir_sp)]
    Vvv = (sv[:, None] == sv[None, :]) * Vmo[np.ix_(vir_sp, vir_sp)]
    return (jnp.asarray(Voo), jnp.asarray(Vov), jnp.asarray(Vvv))


def ccsd_expectation(ctx, lam, V_ao, D_hf) -> float:
    """Unrelaxed CC expectation of a one-electron operator:
    tr(D_HF V) + dE_corr/dtheta + lam . dG/dtheta."""
    f = _mo_blocks(ctx, V_ao)
    G, E, t = ctx["G"], ctx["E"], ctx["t"]
    zeros = jax.tree.map(jnp.zeros_like, f)
    _, dG = jax.jvp(lambda ff: G(t, ff), (zeros,), (f,))
    _, dE = jax.jvp(lambda ff: E(t, ff), (zeros,), (f,))
    corr = float(dE) + float(
        sum(jnp.vdot(l, g).real for l, g in zip(jax.tree.leaves(lam), jax.tree.leaves(dG)))
    )
    ref = float(jnp.sum(jnp.asarray(D_hf) * jnp.asarray(V_ao)))
    return ref + corr


def ccsd_dipole(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    cc_epsilon: float = 1e-10,
) -> CcPropertyOutput:
    """Unrelaxed CCSD dipole moment (electronic expectation + nuclear),
    with the SCF dipole for comparison. One lambda solve serves all three
    components."""
    from qchem_rs_tpu.models.properties import dipole_moment
    from qchem_rs_tpu.ops import one_electron

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    ctx = _setup(system, config, cc_epsilon)
    lam, _ = _solve_lambda(ctx)
    out = ctx["out"]
    D_hf = jnp.asarray(out.density)

    d_ao = one_electron.dipole_integrals(system)  # (3, n, n), electronic r
    # nuclear + electronic SCF dipole from the existing property module
    scf_mu = np.asarray(dipole_moment(system, out.density))
    mu_cc = np.zeros(3)
    # nuclear part
    pos = np.asarray(system.positions)
    charges = np.array([a.ordinal for a in system.atoms], dtype=float)
    nuc = (charges[:, None] * pos).sum(0)
    for k in range(3):
        # electron charge is negative: electronic term enters with -<r>
        e_part = ccsd_expectation(ctx, lam, d_ao[k], D_hf)
        mu_cc[k] = nuc[k] - e_part
    return CcPropertyOutput(
        scf_total_energy=out.total_energy(),
        ccsd_total_energy=out.total_energy() + ctx["e_corr"],
        scf_dipole=scf_mu,
        ccsd_dipole=mu_cc,
        lambda_iterations=ctx["cc_iters"],
    )
