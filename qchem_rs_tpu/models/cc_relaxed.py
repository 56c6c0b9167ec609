"""Orbital-RELAXED CCSD first-order properties via the z-vector method.

The unrelaxed CC expectation (models/cc_lambda.py) holds the HF orbitals
fixed; the physical derivative dE_CC/dtheta additionally carries the
orbitals' response to the perturbation. Solving CPHF per perturbation is
3N equations for gradients; the z-vector trick (Handy-Schaefer) solves ONE
transposed system instead:

    L(t, lam, z, kappa; theta) = E_corr(t; kappa, theta)
                                 + lam . G(t; kappa, theta)
                                 + z . g_HF(kappa, theta)

with kappa the occupied-virtual orbital rotation and g_HF(kappa, theta) =
F(kappa, theta)_ov the HF stationarity condition. Stationarity in kappa
fixes z from

    A^T z = -(d/dkappa)[E_corr + lam . G]        (A = d g_HF / d kappa)

and then dE/dtheta = dL/dtheta at frozen (t, lam, z, kappa=0).

EVERYTHING on the right is automatic differentiation through verified
code: the MO-integral rotation runs through the traceable
_spinorbital_setup, the residual through the general-f CCSD step, A^T
through one jax.vjp of g_HF, and the theta derivatives through jvp — no
hand-derived response diagrams anywhere. Anchored against central finite
differences of the full field-dependent SCF+CCSD energy
(tests/test_cc_relaxed.py), which re-converges the orbitals at each field
and therefore IS the relaxed derivative.

The reference has no properties tier at all (rhf.rs/uhf.rs are its only
models; /root/reference/core/src/hf/rhf.rs) — capability beyond parity.
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
class RelaxedPropertyOutput:
    scf_total_energy: float
    ccsd_total_energy: float
    scf_dipole: np.ndarray  # (3,) a.u.
    ccsd_dipole_unrelaxed: np.ndarray  # (3,) a.u. (Lambda expectation)
    ccsd_dipole: np.ndarray  # (3,) a.u., orbital-relaxed
    z_residual: float


def ccsd_relaxed_dipole(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    cc_epsilon: float = 1e-10,
    z_tol: float = 1e-9,
) -> RelaxedPropertyOutput:
    """Orbital-relaxed CCSD dipole moment (plus the unrelaxed and SCF
    dipoles for comparison). One lambda solve + one z-vector solve serve
    all three Cartesian components."""
    from qchem_rs_tpu.models.cc import _ccsd_step, _spinorbital_setup
    from qchem_rs_tpu.models.cc_lambda import _setup, _solve_lambda, ccsd_dipole
    from qchem_rs_tpu.models.properties import dipole_moment
    from qchem_rs_tpu.models.rhf import _incore_tools
    from qchem_rs_tpu.ops import one_electron

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    ctx = _setup(system, config, cc_epsilon)
    lam, _ = _solve_lambda(ctx)
    out = ctx["out"]
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    na = ctx["na"]
    n = C.shape[1]
    nv_sp = n - na
    t = ctx["t"]

    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    positions = jnp.asarray(system.positions)
    H_ao = one_electron.kinetic(system, positions) + one_electron.nuclear(
        system, positions
    )
    mu_ao = jnp.asarray(one_electron.dipole_integrals(system))  # (3, n, n) of r

    # spin-duplication index maps for spinorbital one-body blocks
    occ_sp = np.concatenate([np.arange(na), np.arange(na)])
    vir_sp = np.concatenate([np.arange(na, n), np.arange(na, n)])
    so = np.array([0] * na + [1] * na)
    sv = np.array([0] * nv_sp + [1] * nv_sp)
    m_oo = jnp.asarray((so[:, None] == so[None, :]).astype(float))
    m_ov = jnp.asarray((so[:, None] == sv[None, :]).astype(float))
    m_vv = jnp.asarray((sv[:, None] == sv[None, :]).astype(float))
    ix_oo = np.ix_(occ_sp, occ_sp)
    ix_ov = np.ix_(occ_sp, vir_sp)
    ix_vv = np.ix_(vir_sp, vir_sp)
    eps_so_o = jnp.asarray(np.concatenate([eps[:na], eps[:na]]))
    eps_so_v = jnp.asarray(np.concatenate([eps[na:], eps[na:]]))

    def rotate(kappa):
        """C(kappa) to first order: kappa is the spatial (nv, no) vo block
        of the antisymmetric generator (exact first derivatives at 0)."""
        K = jnp.zeros((n, n))
        K = K.at[na:, :na].set(kappa)
        K = K.at[:na, na:].set(-kappa.T)
        return C @ (jnp.eye(n) + K)

    def fock_ao(Cr, theta):
        """AO Fock at the rotated density with field coupling H + theta.r
        (electron charge -1 convention of models/rhf._field_terms)."""
        Docc = 2.0 * (Cr[:, :na] @ Cr[:, :na].T)
        J = jnp.einsum("pqrs,rs->pq", e4, Docc)
        K = jnp.einsum("prqs,rs->pq", e4, Docc)
        H1 = H_ao + jnp.einsum("d,dpq->pq", theta, mu_ao)
        return H1 + J - 0.5 * K

    def g_hf(kappa, theta):
        """HF stationarity: the occ-virt MO Fock block (spatial, (na, nv))."""
        Cr = rotate(kappa)
        F = Cr.T @ fock_ao(Cr, theta) @ Cr
        return F[:na, na:]

    def corr_lagrangian(kappa, theta):
        """E_corr + lam . G with every MO quantity rebuilt from C(kappa)
        and the field-dependent Fock; the one-body rest R = F_mo - diag(eps)
        flows through the general-f CCSD step (exact for any split)."""
        Cr = rotate(kappa)
        W, eps_o, eps_v, no, _nv = _spinorbital_setup(
            e4, Cr, Cr, eps, eps, na, na, 0
        )
        Fmo = Cr.T @ fock_ao(Cr, theta) @ Cr
        R = Fmo - jnp.diag(jnp.asarray(eps))
        f = (
            m_oo * R[ix_oo],
            m_ov * R[ix_ov],
            m_vv * R[ix_vv],
        )
        a, b = t
        D1 = eps_so_o[:, None] - eps_so_v[None, :]
        D2 = (
            eps_so_o[:, None, None, None]
            + eps_so_o[None, :, None, None]
            - eps_so_v[None, None, :, None]
            - eps_so_v[None, None, None, :]
        )
        t1n, t2n, _ = _ccsd_step(a, b, eps_o, eps_v, no, W, f)
        G1 = D1 * (t1n - a)
        G2 = D2 * (t2n - b)
        Woovv = W[:no, :no, no:, no:]
        e = (
            0.25 * jnp.einsum("ijab,ijab->", Woovv, b)
            + 0.5 * jnp.einsum("ijab,ia,jb->", Woovv, a, a)
            + jnp.einsum("ia,ia->", f[1], a)
        )
        return e + jnp.vdot(lam[0], G1) + jnp.vdot(lam[1], G2)

    kappa0 = jnp.zeros((nv_sp, na))
    theta0 = jnp.zeros(3)

    # z-vector: A^T z = -b, b = d(corr Lagrangian)/d kappa at 0
    b = jax.grad(corr_lagrangian, argnums=0)(kappa0, theta0)
    _, vjp_g = jax.vjp(lambda k: g_hf(k, theta0), kappa0)

    # z lives in the g-space (na, nv); kappa/b live in (nv, na). GMRES
    # needs an endomorphism, so solve for z^T in kappa space and transpose.
    def At(zk):
        return vjp_g(zk.T)[0]

    # preconditioner: the CPHF diagonal ~ 2(eps_a - eps_i) in kappa space
    d_k = 2.0 * (
        jnp.asarray(eps[na:])[:, None] - jnp.asarray(eps[:na])[None, :]
    )

    zk, _info = jax.scipy.sparse.linalg.gmres(
        At,
        -b,
        M=lambda v: v / d_k,
        tol=z_tol,
        atol=0.0,
        maxiter=200,
        restart=40,
    )
    z = zk.T
    zr = At(zk) + b
    z_res = float(jnp.linalg.norm(zr))
    if z_res > 1e-6 * max(float(jnp.linalg.norm(b)), 1.0):
        raise RuntimeError(f"z-vector GMRES residual {z_res:.2e}")

    # dE/dtheta at frozen (t, lam, z, kappa=0), all via jvp over theta
    D_hf = jnp.asarray(out.density)

    def total_theta_terms(theta):
        # HF part: at kappa=0 the only explicit theta term is tr(D theta.r)
        e_hf = jnp.einsum("pq,d,dpq->", D_hf, theta, mu_ao)
        return (
            e_hf
            + corr_lagrangian(kappa0, theta)
            + jnp.vdot(z, g_hf(kappa0, theta))
        )

    dE = jax.jacfwd(total_theta_terms)(theta0)  # (3,) = d E_total / d theta

    pos = np.asarray(system.positions)
    charges = np.array([a.ordinal for a in system.atoms], dtype=float)
    nuc = (charges[:, None] * pos).sum(0)
    # coupling H += theta.r  =>  mu_elec = -<r> = -dE/dtheta
    mu_relaxed = nuc - np.asarray(dE)

    unrel = ccsd_dipole(system, config, cc_epsilon=cc_epsilon)
    return RelaxedPropertyOutput(
        scf_total_energy=out.total_energy(),
        ccsd_total_energy=out.total_energy() + ctx["e_corr"],
        scf_dipole=np.asarray(dipole_moment(system, out.density)),
        ccsd_dipole_unrelaxed=unrel.ccsd_dipole,
        ccsd_dipole=mu_relaxed,
        z_residual=z_res,
    )
