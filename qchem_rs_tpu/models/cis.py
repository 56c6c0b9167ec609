"""CIS and TDHF (RPA) excitation energies on converged RHF orbitals.

A capability rung above the reference (qchem-rs stops at ground-state
mean-field energies, /root/reference/README.md:1-6), extending the post-HF
tier (models/mp2.py) to excited states. TPU-first in the same way: the MO
transforms are MXU matmuls — in pair mode two matmuls against the resident
pair-space V2f matrix per integral block, never an n^4 AO tensor — and the
excitation problem is one dense symmetric eigensolve.

Closed-shell spin-adapted forms (real orbitals):

    A[ia,jb] = d_ij d_ab (e_a - e_i) + 2 (ia|jb) - (ij|ab)   (singlet)
             = d_ij d_ab (e_a - e_i)            - (ij|ab)   (triplet)
    B[ia,jb] =                        2 (ia|jb) - (ib|ja)   (singlet)
             =                                  - (ib|ja)   (triplet)

CIS diagonalizes A. TDHF solves the RPA problem via Casida's reduction for
real orbitals: with S = (A - B)^(1/2), the eigenvalues of S (A + B) S are
omega^2 and (X + Y) = S Z / sqrt(omega) for unit eigenvectors Z (A - B must
be positive definite — true at a stable RHF minimum; a non-PD A - B raises,
which doubles as an instability detector). Oscillator strengths in the
length gauge: f = (2/3) omega |sqrt(2) d_ov . (X + Y)|^2, with X = the CIS
vector and Y = 0 for CIS. Triplet states are spin-forbidden (f = 0).

The dense eigensolve bounds system size at no*nv ~ few 10^3 (naphthalene/
cc-pVDZ is 5304 — fine); a Davidson iteration over implicit matvecs is the
documented growth path beyond that.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.utils.system import MolecularSystem

HARTREE_TO_EV = 27.211386245988


@dataclasses.dataclass
class CisOutput:
    scf_total_energy: float
    excitation_energies: np.ndarray  # (nstates,) Hartree, ascending
    oscillator_strengths: np.ndarray  # (nstates,) length gauge; 0 for triplet
    iterations: int  # SCF iterations of the underlying ground state
    method: str  # "cis" | "tdhf"
    triplet: bool

    def excitation_energies_ev(self) -> np.ndarray:
        return self.excitation_energies * HARTREE_TO_EV


@jax.jit
def _transform_oovv(e4: jax.Array, Co: jax.Array, Cv: jax.Array):
    """(pq|rs) -> (ij|ab): four quarter-transforms, one buffer at a time."""
    x = jnp.einsum("pqrs,pi->iqrs", e4, Co)
    x = jnp.einsum("iqrs,qj->ijrs", x, Co)
    x = jnp.einsum("ijrs,ra->ijas", x, Cv)
    return jnp.einsum("ijas,sb->ijab", x, Cv)


def _cis_blocks_dense(engine, Co, Cv):
    """(ia|jb) and (ij|ab) through the dense AO tensor (incore tier)."""
    from qchem_rs_tpu.models.mp2 import _transform_ovov

    e4 = engine.finish_eri(engine.build())
    return _transform_ovov(e4, Co, Cv), _transform_oovv(e4, Co, Cv)


def _cis_blocks_pair(builder, Co, Cv):
    """(ia|jb) and (ij|ab) against the resident pair-space V2f — two MXU
    matmuls per block, no n^4 tensor (same envelope as mp2_pair_space)."""
    from qchem_rs_tpu.models.mp2 import _pair_transform_matrix

    if builder._prepared is not None:
        V2f = builder._prepared[0]
    else:
        from qchem_rs_tpu.ops.fock_pair import _mirror

        V2f = jax.jit(_mirror, donate_argnums=(0,))(builder.engine.build())
    no, nv = Co.shape[1], Cv.shape[1]
    U_ov = _pair_transform_matrix(builder, Co, Cv)
    U_oo = _pair_transform_matrix(builder, Co, Co)
    U_vv = _pair_transform_matrix(builder, Cv, Cv)

    @jax.jit
    def contract(V2f, L, R):
        return L.T @ (V2f @ R)

    ovov = contract(V2f, U_ov, U_ov).reshape(no, nv, no, nv)
    oovv = contract(V2f, U_oo, U_vv).reshape(no, no, nv, nv)
    return ovov, oovv


@partial(jax.jit, static_argnames=("singlet",))
def _assemble_AB(ovov, oovv, eps_o, eps_v, singlet: bool):
    """Dense A and B over the compound (ia) index, spin-adapted."""
    no, nv = ovov.shape[0], ovov.shape[1]
    n = no * nv
    diag = (eps_v[None, :] - eps_o[:, None]).reshape(n)
    K = 2.0 * ovov if singlet else jnp.zeros_like(ovov)
    A = (K - oovv.transpose(0, 2, 1, 3)).reshape(n, n) + jnp.diag(diag)
    B = (K - ovov.transpose(0, 3, 2, 1)).reshape(n, n)
    return A, B


@jax.jit
def _cis_solve(A):
    return jnp.linalg.eigh(A)


def _cis_matvec_dense(ovov, oovv, diag2, singlet: bool):
    """Batched CIS sigma vectors from resident MO blocks (incore tier)."""
    no, nv = oovv.shape[0], oovv.shape[2]

    @jax.jit
    def mv(X):  # (m, no*nv) -> (m, no*nv)
        Xr = X.reshape(-1, no, nv)
        y = Xr * diag2[None]
        if singlet:
            y = y + 2.0 * jnp.einsum("iajb,njb->nia", ovov, Xr)
        y = y - jnp.einsum("ijab,njb->nia", oovv, Xr)
        return y.reshape(X.shape)

    return mv


def _cis_matvec_pair(builder, Co, Cv, oovv, diag2, singlet: bool):
    """Batched CIS sigma vectors in the pair-space envelope: the Coulomb
    term streams through the resident V2f as J(X_sym) — J annihilates the
    antisymmetric part exactly, so only the symmetrized transition density
    rides the unordered-pair matvec — and only the (no^2, nv^2) oovv block
    is ever materialized (no (no*nv)^2 tensor)."""
    V2f = builder.prepare()[0]
    pidx, wj = builder._pidx, builder._wj
    pmap_flat = builder._pmap2.reshape(-1)
    no, nv = Co.shape[1], Cv.shape[1]
    nao = Co.shape[0]

    @jax.jit
    def mv_inner(X, V2f):
        Xr = X.reshape(-1, no, nv)
        y = Xr * diag2[None]
        if singlet:
            Xao = jnp.einsum("pi,nia,qa->npq", Co, Xr, Cv)
            Xs = 0.5 * (Xao + jnp.swapaxes(Xao, 1, 2))
            dJ = Xs.reshape(Xs.shape[0], nao * nao)[:, pidx] * wj
            Jp = dJ @ V2f  # V2f symmetric
            Jao = Jp[:, pmap_flat].reshape(-1, nao, nao)
            y = y + 2.0 * jnp.einsum("pi,npq,qa->nia", Co, Jao, Cv)
        y = y - jnp.einsum("ijab,njb->nia", oovv, Xr)
        return y.reshape(X.shape)

    return lambda X: mv_inner(X, V2f)


@jax.jit
def _tdhf_solve(A, B):
    """Casida reduction: eigvals of S (A+B) S with S = (A-B)^(1/2).

    Returns (omega^2 ascending, X+Y columns scaled for X^T X - Y^T Y = 1,
    min eigenvalue of A - B for the caller's stability check)."""
    wm, Um = jnp.linalg.eigh(A - B)
    S = (Um * jnp.sqrt(jnp.maximum(wm, 0.0))) @ Um.T
    w2, Z = jnp.linalg.eigh(S @ (A + B) @ S)
    omega = jnp.sqrt(jnp.maximum(w2, 0.0))
    xpy = (S @ Z) / jnp.sqrt(jnp.maximum(omega, 1e-30))
    return w2, xpy, jnp.min(wm)


def _davidson_sym_lowest(
    matvec,
    diag: np.ndarray,
    k: int,
    *,
    tol: float = 1e-8,
    max_iter: int = 100,
    max_subspace: int = 0,
):
    """Lowest-k eigenpairs of an implicit symmetric matrix by block Davidson.

    ``matvec`` maps a (m, dim) batch of row vectors to (m, dim) — one jitted
    einsum/matmul batch per subspace expansion (MXU work); the subspace
    bookkeeping is host-side numpy. Incremental: each iteration
    orthonormalizes only the new preconditioned residuals against the
    existing basis and extends A@V by one batched matvec. Restarts collapse
    to the current Ritz vectors. Returns (w, X, converged)."""
    dim = diag.size
    k = min(k, dim)
    max_subspace = max_subspace or max(6 * k, 48)
    nb = min(dim, max(2 * k, k + 4))
    order = np.argsort(diag)[:nb]
    V = np.zeros((dim, nb))
    V[order, np.arange(nb)] = 1.0
    AV = np.empty((dim, 0))

    def _extend(B):
        nonlocal V, AV
        AB = np.asarray(matvec(jnp.asarray(B.T))).T
        V = np.concatenate([V, B], axis=1) if V.size else B
        AV = np.concatenate([AV, AB], axis=1) if AV.size else AB

    # seed: V holds the initial block, AV empty
    B0, V = V, np.empty((dim, 0))
    _extend(B0)
    for _ in range(max_iter):
        T = V.T @ AV
        T = 0.5 * (T + T.T)
        w_all, S_all = np.linalg.eigh(T)
        w, S = w_all[:k], S_all[:, :k]
        X = V @ S
        R = AV @ S - X * w
        rn = np.linalg.norm(R, axis=0)
        if np.all(rn < tol):
            return w, X, True
        new = []
        for j in range(k):
            if rn[j] < tol:
                continue
            d = w[j] - diag
            d = np.where(np.abs(d) < 1e-8, np.copysign(1e-8, d + 1e-300), d)
            new.append(R[:, j] / d)
        B = np.array(new).T
        # orthogonalize new directions against V (two MGS passes), drop
        # numerically dependent ones
        for _pass in range(2):
            B = B - V @ (V.T @ B)
        keep = []
        for j in range(B.shape[1]):
            col = B[:, j]
            for kept in keep:
                col = col - kept * (kept @ col)
            nrm = np.linalg.norm(col)
            if nrm > 1e-10:
                keep.append(col / nrm)
        if not keep:
            return w, X, True  # stagnated at numerical precision
        B = np.array(keep).T
        if V.shape[1] + B.shape[1] > max_subspace:
            # restart from Ritz vectors
            V, AV = np.empty((dim, 0)), np.empty((dim, 0))
            Xq, _ = np.linalg.qr(X)
            _extend(Xq)
        _extend(B)
    return w, X, False


def _mo_transition_dipoles(system, C, nocc):
    """d_ov[3, no, nv] = <i| r |a> in the SCF working AO basis."""
    from qchem_rs_tpu.ops import one_electron

    d_ao = one_electron.dipole_integrals(system)
    Co, Cv = C[:, :nocc], C[:, nocc:]
    return jnp.einsum("pi,dpq,qa->dia", Co, d_ao, Cv)


def _ucis_blocks(system, config, C, nocc):
    """Spin-resolved MO integral blocks for UCIS: per-spin (ia|jb) and
    (ij|ab), plus the opposite-spin Coulomb coupling (i_a a_a | j_b b_b).
    Pair mode contracts against the resident V2f; otherwise dense."""
    from qchem_rs_tpu.models.rhf import _direct_tools, _incore_tools

    Co = [C[s][:, : nocc[s]] for s in range(2)]
    Cv = [C[s][:, nocc[s] :] for s in range(2)]
    if config.fock_mode == "pair":
        from qchem_rs_tpu.models.mp2 import _pair_transform_matrix

        builder = _direct_tools(system, config, "pair")
        if builder._prepared is not None:
            V2f = builder._prepared[0]
        else:
            from qchem_rs_tpu.ops.fock_pair import _mirror

            V2f = jax.jit(_mirror, donate_argnums=(0,))(builder.engine.build())

        @jax.jit
        def contract(V2f, L, R):
            return L.T @ (V2f @ R)

        U_ov = [_pair_transform_matrix(builder, Co[s], Cv[s]) for s in range(2)]
        U_oo = [_pair_transform_matrix(builder, Co[s], Co[s]) for s in range(2)]
        U_vv = [_pair_transform_matrix(builder, Cv[s], Cv[s]) for s in range(2)]
        sh = [(Co[s].shape[1], Cv[s].shape[1]) for s in range(2)]
        ovov = [
            contract(V2f, U_ov[s], U_ov[s]).reshape(*sh[s], *sh[s])
            for s in range(2)
        ]
        oovv = [
            contract(V2f, U_oo[s], U_vv[s]).reshape(
                sh[s][0], sh[s][0], sh[s][1], sh[s][1]
            )
            for s in range(2)
        ]
        ovov_ab = contract(V2f, U_ov[0], U_ov[1]).reshape(*sh[0], *sh[1])
        return ovov, oovv, ovov_ab

    from qchem_rs_tpu.models.mp2 import _transform_ovov

    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    ovov = [_transform_ovov(e4, Co[s], Cv[s]) for s in range(2)]
    oovv = [_transform_oovv(e4, Co[s], Cv[s]) for s in range(2)]
    x = jnp.einsum("pqrs,pi->iqrs", e4, Co[0])
    x = jnp.einsum("iqrs,qa->iars", x, Cv[0])
    x = jnp.einsum("iars,rj->iajs", x, Co[1])
    ovov_ab = jnp.einsum("iajs,sb->iajb", x, Cv[1])
    return ovov, oovv, ovov_ab


def _ucis_matvec(ovov, oovv, ovov_ab, diag_a, diag_b, dims):
    """Batched UCIS sigma vectors over the concatenated [alpha | beta]
    single-excitation vector (Davidson path; Ms-conserving blocks)."""
    (no_a, nv_a), (no_b, nv_b) = dims
    na_dim = no_a * nv_a

    @jax.jit
    def mv(X):  # (m, na_dim + nb_dim)
        Xa = X[:, :na_dim].reshape(-1, no_a, nv_a)
        Xb = X[:, na_dim:].reshape(-1, no_b, nv_b)
        ya = (
            Xa * diag_a[None]
            + jnp.einsum("iajb,njb->nia", ovov[0], Xa)
            - jnp.einsum("ijab,njb->nia", oovv[0], Xa)
            + jnp.einsum("iajb,njb->nia", ovov_ab, Xb)
        )
        yb = (
            Xb * diag_b[None]
            + jnp.einsum("iajb,njb->nia", ovov[1], Xb)
            - jnp.einsum("ijab,njb->nia", oovv[1], Xb)
            + jnp.einsum("iajb,nia->njb", ovov_ab, Xa)
        )
        return jnp.concatenate(
            [ya.reshape(X.shape[0], -1), yb.reshape(X.shape[0], -1)], axis=1
        )

    return mv


def ucis(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 5,
    solver: str = "auto",
    output=None,
) -> CisOutput:
    """Spin-orbital CIS on a UHF reference (open shells; Ms-conserving
    alpha->alpha / beta->beta excitations).

        A[ia,jb]^{ss}  = d d (e_a - e_i) + (ia|jb) - (ij|ab)
        A[ia,jb]^{ab}  =                   (ia|jb)            (Coulomb only)

    On a closed-shell reference the spectrum is exactly the union of the
    singlet and triplet restricted CIS spectra (the Ms=0 triplet component)
    — pinned as the oracle in tests/test_cis.py. ``solver`` mirrors cis():
    "davidson" iterates the lowest states with implicit sigma vectors
    (auto past a total single-excitation dimension of 4096)."""
    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    out = output or unrestricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; CIS needs a converged reference")
    nocc = scf_mod.electron_counts(
        system.n_electrons(config.charge), config.spin_multiplicity
    )
    C = jnp.asarray(out.coefficients)
    Cw = C  # SCF working basis (for transition dipoles)
    if system.spherical and config.fock_mode == "pair":
        C = jnp.einsum("pq,sqm->spm", jnp.asarray(system.sph_T), C)
    eps = [
        jnp.asarray(out.orbital_energies_alpha),
        jnp.asarray(out.orbital_energies_beta),
    ]
    n = C.shape[2]
    dims = [(nocc[s], n - nocc[s]) for s in range(2)]
    if any(no == 0 or nv == 0 for no, nv in dims):
        raise ValueError("UCIS needs occupied and virtual orbitals in both spins")

    if solver not in ("auto", "dense", "davidson"):
        raise ValueError(f"unknown solver={solver!r}")
    total_dim = sum(no * nv for no, nv in dims)
    use_dav = solver == "davidson" or (solver == "auto" and total_dim > 4096)

    ovov, oovv, ovov_ab = _ucis_blocks(system, config, C, nocc)
    diag2 = [
        eps[s][nocc[s] :][None, :] - eps[s][: nocc[s]][:, None] for s in range(2)
    ]
    if use_dav:
        matvec = _ucis_matvec(ovov, oovv, ovov_ab, diag2[0], diag2[1], dims)
        diag_flat = np.concatenate(
            [np.asarray(diag2[0]).reshape(-1), np.asarray(diag2[1]).reshape(-1)]
        )
        omega, X, ok = _davidson_sym_lowest(matvec, diag_flat, nstates, tol=1e-7)
        if not ok:
            raise RuntimeError("Davidson iteration did not converge")
        X = jnp.asarray(X)
    else:
        blocks = []
        for s in range(2):
            no, nv = dims[s]
            Ass = (ovov[s] - oovv[s].transpose(0, 2, 1, 3)).reshape(
                no * nv, no * nv
            ) + jnp.diag(diag2[s].reshape(-1))
            blocks.append(Ass)
        Aab = ovov_ab.reshape(dims[0][0] * dims[0][1], dims[1][0] * dims[1][1])
        A = jnp.block([[blocks[0], Aab], [Aab.T, blocks[1]]])
        omega_arr, X = _cis_solve(A)
        omega = np.asarray(omega_arr)

    from qchem_rs_tpu.ops import one_electron

    d_ao = one_electron.dipole_integrals(system)
    d_ov = jnp.concatenate(
        [
            jnp.einsum(
                "pi,dpq,qa->dia",
                Cw[s][:, : nocc[s]], d_ao, Cw[s][:, nocc[s] :],
            ).reshape(3, -1)
            for s in range(2)
        ],
        axis=1,
    )
    k = min(nstates, omega.shape[0])
    t = np.asarray(d_ov @ X)  # spin orbitals: no sqrt(2)
    f = (2.0 / 3.0) * omega * (t**2).sum(axis=0)
    return CisOutput(
        scf_total_energy=out.total_energy(),
        excitation_energies=omega[:k],
        oscillator_strengths=f[:k],
        iterations=out.iterations,
        method="ucis",
        triplet=False,
    )


def cis(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 5,
    triplet: bool = False,
    tdhf: bool = False,
    solver: str = "auto",
    output=None,
) -> CisOutput:
    """Lowest ``nstates`` CIS (or TDHF) excitations on a converged RHF.

    ``config.fock_mode == "pair"`` routes the MO-integral blocks through
    the pair-space V2f matrix (no n^4 AO tensor — the same memory envelope
    that runs naphthalene/cc-pVDZ on one chip); any other mode uses the
    dense incore transform.

    ``solver``: "dense" diagonalizes the assembled A; "davidson" iterates
    lowest states with implicit sigma vectors (never assembles the
    (no*nv)^2 matrix — in pair mode the Coulomb term streams through the
    resident V2f, so the growth path documented in the module docstring is
    real); "auto" picks davidson past no*nv = 4096 (CIS only — TDHF stays
    dense via the Casida reduction).
    """
    from qchem_rs_tpu.models.rhf import (
        _direct_tools,
        _incore_tools,
        restricted_hartree_fock,
    )

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; CIS needs a converged reference")
    nocc = system.n_electrons(config.charge) // 2
    C = jnp.asarray(out.coefficients)
    eps = jnp.asarray(out.orbital_energies)
    nv = C.shape[1] - nocc
    if nocc == 0 or nv == 0:
        raise ValueError("CIS needs at least one occupied and one virtual orbital")

    if solver not in ("auto", "dense", "davidson"):
        raise ValueError(f"unknown solver={solver!r}")
    if tdhf and solver == "davidson":
        raise ValueError("solver='davidson' supports CIS only; TDHF is dense")
    use_dav = (not tdhf) and (
        solver == "davidson" or (solver == "auto" and nocc * nv > 4096)
    )

    matvec = None
    if config.fock_mode == "pair":
        Cx = C
        if system.spherical:
            # V2f is Cartesian: lift the MO coefficients (mp2.py pattern)
            Cx = jnp.asarray(system.sph_T) @ C
        builder = _direct_tools(system, config, "pair")
        Co, Cv = Cx[:, :nocc], Cx[:, nocc:]
        if use_dav:
            from qchem_rs_tpu.models.mp2 import _pair_transform_matrix

            V2f = builder.prepare()[0]
            U_oo = _pair_transform_matrix(builder, Co, Co)
            U_vv = _pair_transform_matrix(builder, Cv, Cv)
            oovv = jax.jit(lambda V, L, R: L.T @ (V @ R))(
                V2f, U_oo, U_vv
            ).reshape(nocc, nocc, nv, nv)
            diag2 = eps[nocc:][None, :] - eps[:nocc][:, None]
            matvec = _cis_matvec_pair(builder, Co, Cv, oovv, diag2, not triplet)
        else:
            ovov, oovv = _cis_blocks_pair(builder, Co, Cv)
    else:
        _, engine = _incore_tools(system, config)
        ovov, oovv = _cis_blocks_dense(engine, C[:, :nocc], C[:, nocc:])
        if use_dav:
            diag2 = eps[nocc:][None, :] - eps[:nocc][:, None]
            matvec = _cis_matvec_dense(ovov, oovv, diag2, not triplet)

    # transition dipoles live in the SCF working basis (NOT the Cartesian
    # lift): d_ov from the original C
    d_ov = _mo_transition_dipoles(system, C, nocc).reshape(3, -1)

    if use_dav:
        diag_flat = np.asarray(diag2).reshape(-1)
        w, X, ok = _davidson_sym_lowest(matvec, diag_flat, nstates, tol=1e-7)
        if not ok:
            raise RuntimeError("Davidson iteration did not converge")
        omega, amp = w, X
        t = np.asarray(d_ov @ jnp.asarray(amp)) * np.sqrt(2.0)
        f = (2.0 / 3.0) * omega * (t**2).sum(axis=0)
        if triplet:
            f = np.zeros_like(f)
        k = min(nstates, omega.shape[0])
        return CisOutput(
            scf_total_energy=out.total_energy(),
            excitation_energies=omega[:k],
            oscillator_strengths=f[:k],
            iterations=out.iterations,
            method="cis",
            triplet=triplet,
        )

    A, B = _assemble_AB(ovov, oovv, eps[:nocc], eps[nocc:], not triplet)

    if tdhf:
        w2, xpy, wm_min = _tdhf_solve(A, B)
        if float(wm_min) <= 0.0:
            raise RuntimeError(
                "A - B is not positive definite: the RHF reference is "
                f"unstable (min eig {float(wm_min):.3e}); TDHF is undefined"
            )
        omega = np.sqrt(np.maximum(np.asarray(w2), 0.0))
        amp = xpy  # (X + Y), normalized X^T X - Y^T Y = 1
    else:
        omega_arr, X = _cis_solve(A)
        omega = np.asarray(omega_arr)
        amp = X  # Y = 0

    k = min(nstates, omega.shape[0])
    # spin-adapted transition dipole: sqrt(2) d . (X + Y); triplet forbidden
    t = np.asarray(jnp.einsum("dn,nk->dk", jnp.asarray(d_ov), amp)) * np.sqrt(2.0)
    f = (2.0 / 3.0) * omega * (t**2).sum(axis=0)
    if triplet:
        f = np.zeros_like(f)
    return CisOutput(
        scf_total_energy=out.total_energy(),
        excitation_energies=omega[:k],
        oscillator_strengths=f[:k],
        iterations=out.iterations,
        method="tdhf" if tdhf else "cis",
        triplet=triplet,
    )
