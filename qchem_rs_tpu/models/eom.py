"""EOM-CCSD excitation energies (small-system determinant-space tier).

Equation-of-motion CCSD diagonalizes the similarity-transformed
Hamiltonian Hbar = e^{-T} H e^{T} in the space of the reference plus
single and double excitations. This implementation is EXACT EOM-CCSD,
built the determinant way rather than the diagrammatic way: the FCI
machinery (models/fci.py, element-validated against a brute-force
second-quantization oracle) supplies H as a dense matrix over
(alpha-string x beta-string) determinants, T1+T2 are applied as operators
with generic fermionic bookkeeping, e^{+-T} are finite nilpotent series,
and P Hbar P is diagonalized over the rank<=2 determinants
(non-Hermitian — left/right eigenpairs differ; energies are what we
report). No truncation, no transcribed diagrams: the only inputs are the
converged CCSD amplitudes.

Scope: the same capped-dimension tier as FCI (a few thousand
determinants) — the correctness anchor and small-molecule capability; the
einsum sigma-vector formulation over MO blocks is the documented growth
path, to be validated against THIS implementation. Closed-shell RHF
references (the determinant space shares one spatial orbital set across
spins; UHF references would need spin-blocked integrals).

Anchors (tests/test_eom.py): on two-electron systems the CISD space IS
the FCI space and CCSD is exact, so every EOM-CCSD root must equal the
FCI spectrum to machine precision; <Phi0|Hbar|Phi0> must reproduce
E_CCSD; on water/STO-3G the excitation energies must land within a few
mEh of FCI and beat CIS.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.fci import _build_hamiltonian, _strings
from qchem_rs_tpu.utils.system import MolecularSystem

HARTREE_TO_EV = 27.211386245988


@dataclasses.dataclass
class EomOutput:
    scf_total_energy: float
    ccsd_total_energy: float
    excitation_energies: np.ndarray  # (nstates,) Hartree, ascending
    dimension: int  # rank<=2 projection dimension
    fci_dimension: int
    cc_iterations: int
    #: max |<singles+doubles| Hbar |Phi0>| — the CCSD amplitude equations
    #: evaluated through the determinant machinery; ~cc_epsilon when both
    #: the amplitudes and the T-operator expansion are right
    amplitude_residual: float
    #: left (vjp) spectrum when solved (eom_ccsd_davidson(left=True));
    #: must equal excitation_energies — Hbar has one spectrum, two
    #: eigenbases
    left_excitation_energies: Optional[np.ndarray] = None

    def excitation_energies_ev(self) -> np.ndarray:
        return self.excitation_energies * HARTREE_TO_EV


def _annihilate(mask: int, q: int):
    if not (mask >> q) & 1:
        return None
    below = bin(mask & ((1 << q) - 1)).count("1")
    return (1 - 2 * (below & 1), mask ^ (1 << q))


def _create(mask: int, p: int):
    if (mask >> p) & 1:
        return None
    below = bin(mask & ((1 << p) - 1)).count("1")
    return (1 - 2 * (below & 1), mask | (1 << p))


def _t_matrix(t1_so, t2_so, n, na, nb, dets, index):
    """Dense matrix of T = sum t1 a+_A a_I + 1/4 sum t2 a+_A a+_B a_J a_I
    over the determinant basis. Spinorbital index convention matches
    models/cc.py's _spinorbital_setup ([occ_a, occ_b | virt_a, virt_b]);
    determinant masks put alpha spatial p at bit p, beta at bit n + p."""
    no = na + nb
    nv_a = n - na

    def so_bit(k: int, occupied: bool) -> int:
        """Spinorbital (cc ordering) -> bit position in the det mask."""
        if occupied:
            return k if k < na else n + (k - na)
        v = k - no
        return (na + v) if v < nv_a else n + nb + (v - nv_a)

    dim = len(dets)
    T = np.zeros((dim, dim))
    t1 = np.asarray(t1_so)
    t2 = np.asarray(t2_so)
    singles = [
        (so_bit(i, True), so_bit(no + a_, False), t1[i, a_])
        for i, a_ in zip(*np.nonzero(np.abs(t1) > 1e-14))
    ]
    I, J, A, B = np.nonzero(np.abs(t2) > 1e-14)
    doubles = [
        (
            so_bit(i, True),
            so_bit(j, True),
            so_bit(no + a_, False),
            so_bit(no + b_, False),
            t2[i, j, a_, b_],
        )
        for i, j, a_, b_ in zip(I, J, A, B)
    ]
    for col, mask in enumerate(dets):
        for ib, ab, amp in singles:
            r = _annihilate(mask, ib)
            if r is None:
                continue
            s1, m1 = r
            r = _create(m1, ab)
            if r is None:
                continue
            s2, m2 = r
            T[index[m2], col] += s1 * s2 * amp
        # 1/4 sum t2[IJAB] a+_A a+_B a_J a_I
        for ib, jb, ab, bb, amp in doubles:
            r = _annihilate(mask, ib)
            if r is None:
                continue
            s1, m1 = r
            r = _annihilate(m1, jb)
            if r is None:
                continue
            s2, m2 = r
            r = _create(m2, bb)
            if r is None:
                continue
            s3, m3 = r
            r = _create(m3, ab)
            if r is None:
                continue
            s4, m4 = r
            T[index[m4], col] += 0.25 * s1 * s2 * s3 * s4 * amp
    return T


def _expm_nilpotent(T: np.ndarray, max_power: int = 64) -> np.ndarray:
    """exp(T) for a strictly excitation-raising T: the series terminates."""
    X = np.eye(T.shape[0])
    term = np.eye(T.shape[0])
    for k in range(1, max_power + 1):
        term = term @ T / k
        X += term
        if np.max(np.abs(term)) < 1e-16:
            return X
    raise RuntimeError("exp(T) series did not terminate (T not nilpotent?)")


@dataclasses.dataclass
class IpEaOutput:
    ccsd_total_energy: float
    energies: np.ndarray  # (nstates,) Hartree: IPs (positive) or EAs
    kind: str  # "ip" | "ea"
    dimension: int
    koopmans: float  # -eps_HOMO (ip) / -eps_LUMO (ea) for comparison


def _hbar_sector(ctx, na: int, nb: int, return_transforms: bool = False):
    """Similarity-transformed H over the (na, nb)-electron determinant
    sector, using the N-electron reference's orbitals and amplitudes (T
    acts in any sector — the operators don't care)."""
    H, dim = _build_hamiltonian(ctx["h_mo"], ctx["g_mo"], na, nb)
    n = ctx["n"]
    sa, sb = _strings(n, na), _strings(n, nb)
    dets = [a | (b << n) for a in sa for b in sb]
    index = {m: i for i, m in enumerate(dets)}
    Tm = _t_matrix(
        ctx["t1"], ctx["t2"], n, ctx["na"], ctx["nb"], dets, index
    )
    Xi, X = _expm_nilpotent(-Tm), _expm_nilpotent(Tm)
    Hbar = Xi @ H @ X
    if return_transforms:
        return Hbar, dets, index, Xi, X
    return Hbar, dets


def _one_body_matrix(op_mo: np.ndarray, n: int, dets, index) -> np.ndarray:
    """Dense determinant-basis matrix of the spin-free one-body operator
    sum_pq op[p,q] (a+_pa a_qa + a+_pb a_qb); spatial-orbital MO matrix in,
    alpha bits [0, n), beta bits [n, 2n)."""
    dim = len(dets)
    M = np.zeros((dim, dim))
    pq = list(zip(*np.nonzero(np.abs(op_mo) > 1e-14)))
    for col, mask in enumerate(dets):
        for p, q in pq:
            for off in (0, n):
                r = _annihilate(mask, q + off)
                if r is None:
                    continue
                s1, m1 = r
                r = _create(m1, p + off)
                if r is None:
                    continue
                s2, m2 = r
                M[index[m2], col] += s1 * s2 * op_mo[p, q]
    return M


def ip_eom_ccsd(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 3,
    max_dim: int = 4000,
    cc_epsilon: float = 1e-10,
) -> IpEaOutput:
    """IP-EOM-CCSD: ionization potentials from the (N-1)-electron sector
    of Hbar, projected onto 1h and 2h1p determinants. Positive energies =
    energy to remove an electron (alpha channel)."""
    return _ip_ea(system, config, nstates, max_dim, cc_epsilon, kind="ip")


def ea_eom_ccsd(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 3,
    max_dim: int = 4000,
    cc_epsilon: float = 1e-10,
) -> IpEaOutput:
    """EA-EOM-CCSD: electron affinities from the (N+1)-electron sector of
    Hbar, projected onto 1p and 2p1h determinants. Negative values mean
    the anion is bound."""
    return _ip_ea(system, config, nstates, max_dim, cc_epsilon, kind="ea")


def _ip_ea(system, config, nstates, max_dim, cc_epsilon, kind):
    ctx = _cc_context(system, config, max_dim, cc_epsilon)
    na, nb = ctx["na"], ctx["nb"]
    if kind == "ip":
        Hbar, dets = _hbar_sector(ctx, na - 1, nb)
    else:
        Hbar, dets = _hbar_sector(ctx, na + 1, nb)
    n = ctx["n"]
    hf = ctx["hf_mask"]
    # particles/holes relative to the N-electron HF determinant
    parts = np.array([bin(m & ~hf).count("1") for m in dets])
    holes = np.array([bin(hf & ~m).count("1") for m in dets])
    if kind == "ip":
        keep = np.where(parts <= 1)[0]  # 1h + 2h1p
    else:
        keep = np.where(holes <= 1)[0]  # 1p + 2p1h
    Hp = Hbar[np.ix_(keep, keep)]
    e_nuc = float(system.nuclear_repulsion())
    w = np.sort(np.linalg.eigvals(Hp).real) + e_nuc
    e_cc = ctx["e_ccsd"]
    if kind == "ip":
        vals = w[:nstates] - e_cc  # positive IPs
        koopmans = -float(ctx["eps"][na - 1])
    else:
        vals = w[:nstates] - e_cc  # EA convention: E(N+1) - E(N)
        koopmans = float(ctx["eps"][na])
    return IpEaOutput(
        ccsd_total_energy=e_cc,
        energies=np.asarray(vals),
        kind=kind,
        dimension=len(keep),
        koopmans=koopmans,
    )


def _cc_context(system, config, max_dim, cc_epsilon):
    """Shared setup: RHF, spinorbital CCSD amplitudes, MO integrals, and
    the N-electron reference bookkeeping."""
    import math

    import jax.numpy as jnp

    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.cc import _cc_loop, _ccsd_step, _spinorbital_setup
    from qchem_rs_tpu.models.fci import _transform_full
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    n_el = system.n_electrons(config.charge)
    na, nb = scf_mod.electron_counts(n_el, config.spin_multiplicity)
    if na != nb:
        raise ValueError("EOM requires a closed-shell RHF reference")
    out = restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged")
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    n = C.shape[1]
    if math.comb(n, na) * math.comb(n, nb) > max_dim:
        raise ValueError("determinant space exceeds max_dim")

    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    W, eps_o, eps_v, no, nv = _spinorbital_setup(e4, C, C, eps, eps, na, nb, 0)
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

    ones, _ = _incore_tools(system, config)
    pos = jnp.asarray(system.positions)
    h_mo = np.asarray(C.T @ (ones["T"](pos) + ones["V"](pos)) @ C)
    g_mo = np.asarray(_transform_full(e4, C))
    hf_a = (1 << na) - 1
    hf_b = (1 << nb) - 1
    return {
        "n": n,
        "na": na,
        "nb": nb,
        "C": np.asarray(C),
        "eps": eps,
        "h_mo": h_mo,
        "g_mo": g_mo,
        "t1": t1,
        "t2": t2,
        "W_so": W,
        "eps_o": eps_o,
        "eps_v": eps_v,
        "cc_iters": iters,
        "e_ccsd": out.total_energy() + e_corr,
        "hf_mask": hf_a | (hf_b << n),
        "scf_total_energy": out.total_energy(),
    }


# --------------------------------------------------------------------------
# production EOM-EE-CCSD: sigma vectors as the JVP of the CCSD residual
# --------------------------------------------------------------------------
#
# Because R (a pure excitation operator) commutes with T,
#
#   <Phi_K| Hbar R |Phi0> = <Phi_K| d/de Hbar(T + e R) |Phi0> + E_cc r_K
#                         = (dG/dt . r)_K + E_cc r_K,
#
# where G(t) = <Phi_K|Hbar(t)|Phi0> is exactly the CCSD residual our
# amplitude step already computes. So the EOM sigma vector is ONE
# jax.jvp through the verified _ccsd_step — no transcribed diagrams at
# all — and the excitation energies are the eigenvalues of the JVP
# operator directly (the E_cc shift cancels). Verified against the
# determinant-space Hbar to ~1e-9 elementwise on random R (2026-08-19 dev
# harness), and pinned root-by-root in tests/test_eom.py. The same trick
# through the spatial closed-shell step gives spin-adapted (singlet-only)
# sigma vectors at the fast path's memory footprint.


def _davidson_nonsym_lowest(
    matvec,
    diag: np.ndarray,
    k: int,
    *,
    in_subspace,
    tol: float = 1e-6,
    max_iter: int = 100,
    max_subspace: int = 0,
):
    """Lowest-k right eigenpairs of an implicit (mildly) non-Hermitian
    matrix by block Davidson with oblique Rayleigh-Ritz (np.linalg.eig on
    the projected matrix). ``in_subspace`` projects vectors onto the
    physical subspace (Ms-conserving, antisymmetric/symmetric amplitude
    patterns) — the operator preserves it, so every basis vector is passed
    through it once at entry."""
    import jax.numpy as jnp

    dim = diag.size
    k = min(k, dim)
    max_subspace = max_subspace or max(6 * k, 48)
    nb = min(dim, max(2 * k, k + 4))
    finite = np.where(np.isfinite(diag), diag, np.inf)
    order = np.argsort(finite)[:nb]
    B0 = np.zeros((dim, nb))
    B0[order, np.arange(nb)] = 1.0
    B0 = in_subspace(B0)
    V = np.empty((dim, 0))
    AV = np.empty((dim, 0))

    def _extend(B):
        nonlocal V, AV
        # orthonormalize against V, drop dependent columns
        for _ in range(2):
            if V.size:
                B = B - V @ (V.T @ B)
        keep = []
        for j in range(B.shape[1]):
            c = B[:, j]
            for q in keep:
                c = c - q * (q @ c)
            nrm = np.linalg.norm(c)
            if nrm > 1e-10:
                keep.append(c / nrm)
        if not keep:
            return False
        B = np.array(keep).T
        AB = np.asarray(matvec(jnp.asarray(B.T))).T
        V = np.concatenate([V, B], axis=1) if V.size else B
        AV = np.concatenate([AV, AB], axis=1) if AV.size else AB
        return True

    _extend(B0)
    w = X = None
    for _ in range(max_iter):
        T = V.T @ AV
        w_all, S_all = np.linalg.eig(T)
        # the projected start basis can hold fewer than k independent
        # columns in early iterations — work with what exists
        kk = min(k, w_all.size)
        sel = np.argsort(w_all.real)[:kk]
        w = w_all[sel].real
        S = np.real(S_all[:, sel])
        # renormalize (real part of a complex eigvec can shrink)
        S = S / np.maximum(np.linalg.norm(S, axis=0), 1e-30)
        X = V @ S
        R = AV @ S - X * w
        rn = np.linalg.norm(R, axis=0)
        if kk == k and np.all(rn < tol):
            return w, X, True
        new = []
        for j in range(kk):
            if rn[j] < tol:
                continue
            d = w[j] - diag
            d = np.where(np.abs(d) < 1e-8, np.copysign(1e-8, d + 1e-300), d)
            new.append(R[:, j] / d)
        if not new:
            # every present root converged but kk < k: inject fresh
            # directions so the subspace can still reach k roots
            rng_l = np.random.default_rng(V.shape[1])
            new.append(rng_l.standard_normal(dim))
        B = in_subspace(np.array(new).T)
        if V.shape[1] + B.shape[1] > max_subspace:
            V, AV = np.empty((dim, 0)), np.empty((dim, 0))
            Xq, _ = np.linalg.qr(X)
            _extend(in_subspace(Xq))
        if not _extend(B):
            return w, X, True  # stagnated at numerical precision
    return w, X, False


def eom_ccsd_davidson(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 5,
    formulation: str = "spinorbital",
    tol: float = 1e-6,
    cc_epsilon: float = 1e-10,
    left: bool = False,
) -> EomOutput:
    """Matrix-free EOM-EE-CCSD (production tier): Davidson over jvp sigma
    vectors. ``formulation="spinorbital"`` covers all Ms=0 roots (singlets
    and triplets); ``"spatial"`` runs the closed-shell fast path and finds
    singlet roots only. Scales wherever the corresponding ground-state
    CCSD runs — no determinant space anywhere.

    ``left=True`` additionally solves the LEFT eigenproblem: Hbar is
    non-Hermitian, so left eigenvectors differ from right ones and are the
    missing half of biorthogonal transition properties. The left sigma
    vector is the TRANSPOSE of the jvp operator — i.e. exactly one
    ``jax.vjp`` through the same verified amplitude step; no additional
    diagrams exist anywhere. Left excitation energies land in
    ``left_excitation_energies`` and must match the right spectrum
    (pinned in tests against the determinant-space Hbar)."""
    import jax
    import jax.numpy as jnp

    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.cc import (
        _cc_loop,
        _ccsd_rhf_step,
        _ccsd_step,
        _mo_phys_blocks,
        _spinorbital_setup,
    )
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    n_el = system.n_electrons(config.charge)
    na, nb = scf_mod.electron_counts(n_el, config.spin_multiplicity)
    if na != nb:
        raise ValueError("EOM requires a closed-shell RHF reference")
    if formulation not in ("spinorbital", "spatial"):
        raise ValueError(f"unknown formulation={formulation!r}")

    out = restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged")
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    n = C.shape[1]
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())

    if formulation == "spinorbital":
        W, eps_o, eps_v, no, nv = _spinorbital_setup(
            e4, C, C, eps, eps, na, nb, 0
        )
        D1 = eps_o[:, None] - eps_v[None, :]
        D2 = (
            eps_o[:, None, None, None]
            + eps_o[None, :, None, None]
            - eps_v[None, None, :, None]
            - eps_v[None, None, None, :]
        )
        t1 = jnp.zeros((no, nv))
        t2 = (W[:no, :no, no:, no:]) / D2
        e_mp2 = float(0.25 * jnp.einsum("ijab,ijab->", W[:no, :no, no:, no:], t2))
        step = lambda a, b: _ccsd_step(a, b, eps_o, eps_v, no, W)
        t1, t2, e_corr, iters, converged = _cc_loop(
            step, t1, t2, e_mp2, 200, cc_epsilon
        )
        if not converged:
            raise RuntimeError("CCSD amplitudes not converged")

        def G(a, b):
            t1n, t2n, _ = _ccsd_step(a, b, eps_o, eps_v, no, W)
            return D1 * (t1n - a), D2 * (t2n - b)

        amps = (t1, t2)
        n1 = no * nv
        shape2 = (no, no, nv, nv)

        @jax.jit
        def matvec(X):  # (m, n1 + n2) flattened [r1, r2]
            def one(x):
                r1 = x[:n1].reshape(no, nv)
                r2 = x[n1:].reshape(shape2)
                _, (s1, s2) = jax.jvp(G, (t1, t2), (r1, r2))
                return jnp.concatenate([s1.reshape(-1), s2.reshape(-1)])

            return jax.vmap(one)(X)

        # Ms / antisymmetry projector
        spin_o = np.array([0] * na + [1] * nb)
        spin_v = np.array([0] * (n - na) + [1] * (n - nb))
        mask1 = (spin_o[:, None] == spin_v[None, :]).astype(float)
        mask2 = (
            (spin_o[:, None, None, None] + spin_o[None, :, None, None])
            == (spin_v[None, None, :, None] + spin_v[None, None, None, :])
        ).astype(float)

        def in_subspace(B):
            if B.size == 0:
                return B
            out_cols = []
            for j in range(B.shape[1]):
                r1 = B[:n1, j].reshape(no, nv) * mask1
                r2 = B[n1:, j].reshape(shape2)
                r2 = 0.25 * (
                    r2
                    - r2.transpose(1, 0, 2, 3)
                    - r2.transpose(0, 1, 3, 2)
                    + r2.transpose(1, 0, 3, 2)
                ) * mask2
                out_cols.append(
                    np.concatenate([r1.reshape(-1), r2.reshape(-1)])
                )
            return np.array(out_cols).T

        diag = np.concatenate(
            [
                np.asarray(-D1).reshape(-1),
                np.asarray(-D2).reshape(-1),
            ]
        )
        e_cc_total = out.total_energy() + e_corr
    else:
        Co, Cv = C[:, :na], C[:, na:]
        g = _mo_phys_blocks(e4, Co, Cv)
        eps_o = jnp.asarray(eps[:na])
        eps_v = jnp.asarray(eps[na:])
        D1 = eps_o[:, None] - eps_v[None, :]
        D2 = (
            eps_o[:, None, None, None]
            + eps_o[None, :, None, None]
            - eps_v[None, None, :, None]
            - eps_v[None, None, None, :]
        )
        g_oovv = g["oovv"]
        L_oovv = 2.0 * g_oovv - jnp.swapaxes(g_oovv, 2, 3)
        T0 = g_oovv / D2
        t1 = jnp.zeros((eps_o.size, eps_v.size))
        e_mp2 = float(jnp.einsum("ijab,ijab->", L_oovv, T0))
        step = lambda a, b: _ccsd_rhf_step(a, b, eps_o, eps_v, g)
        t1, T, e_corr, iters, converged = _cc_loop(
            step, t1, T0, e_mp2, 200, cc_epsilon
        )
        if not converged:
            raise RuntimeError("CCSD amplitudes not converged")

        def G(a, b):
            t1n, Tn, _ = _ccsd_rhf_step(a, b, eps_o, eps_v, g)
            return D1 * (t1n - a), D2 * (Tn - b)

        amps = (t1, T)
        no_s, nv_s = int(eps_o.size), int(eps_v.size)
        n1 = no_s * nv_s
        shape2 = (no_s, no_s, nv_s, nv_s)

        @jax.jit
        def matvec(X):
            def one(x):
                r1 = x[:n1].reshape(no_s, nv_s)
                r2 = x[n1:].reshape(shape2)
                _, (s1, s2) = jax.jvp(G, (t1, T), (r1, r2))
                return jnp.concatenate([s1.reshape(-1), s2.reshape(-1)])

            return jax.vmap(one)(X)

        def in_subspace(B):
            if B.size == 0:
                return B
            out_cols = []
            for j in range(B.shape[1]):
                r1 = B[:n1, j]
                r2 = B[n1:, j].reshape(shape2)
                r2 = 0.5 * (r2 + r2.transpose(1, 0, 3, 2))
                out_cols.append(np.concatenate([r1, r2.reshape(-1)]))
            return np.array(out_cols).T

        diag = np.concatenate(
            [np.asarray(-D1).reshape(-1), np.asarray(-D2).reshape(-1)]
        )
        e_cc_total = out.total_energy() + e_corr

    # oversolve: near-degenerate pairs are easy for Davidson to skip when
    # asked for exactly k roots (observed: water's 0.5018/0.5055 pair)
    k_int = nstates + 2
    w, X, ok = _davidson_nonsym_lowest(
        matvec, diag, k_int, in_subspace=in_subspace, tol=tol
    )
    if not ok:
        raise RuntimeError("EOM Davidson did not converge")

    wl = None
    if left:
        # transpose sigma: sigma_L = (dG/dt)^T l — one vjp, zero diagrams
        _, vjp_fun = jax.vjp(G, *amps)
        sh1 = amps[0].shape

        @jax.jit
        def matvec_left(Xb):
            def one(x):
                l1 = x[:n1].reshape(sh1)
                l2 = x[n1:].reshape(shape2)
                d1, d2 = vjp_fun((l1, l2))
                return jnp.concatenate([d1.reshape(-1), d2.reshape(-1)])

            return jax.vmap(one)(Xb)

        wl, _XL, okl = _davidson_nonsym_lowest(
            matvec_left, diag, k_int, in_subspace=in_subspace, tol=tol
        )
        if not okl:
            raise RuntimeError("left EOM Davidson did not converge")
        wl = np.asarray(wl)[:nstates]

    return EomOutput(
        scf_total_energy=out.total_energy(),
        ccsd_total_energy=e_cc_total,
        excitation_energies=np.asarray(w)[:nstates],
        dimension=diag.size,
        fci_dimension=0,
        cc_iterations=iters,
        amplitude_residual=0.0,
        left_excitation_energies=wl,
    )


def eom_ccsd(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 5,
    max_dim: int = 4000,
    cc_epsilon: float = 1e-10,
) -> EomOutput:
    """EOM-CCSD excitation energies on a closed-shell RHF reference."""
    ctx = _cc_context(system, config, max_dim, cc_epsilon)
    na, nb = ctx["na"], ctx["nb"]
    Hbar, dets = _hbar_sector(ctx, na, nb)
    hf = ctx["hf_mask"]
    assert dets[0] == hf  # lexicographic strings put the HF det first
    ranks = np.array([bin(m ^ hf).count("1") // 2 for m in dets])
    keep = np.where(ranks <= 2)[0]
    Hp = Hbar[np.ix_(keep, keep)]

    e_nuc = float(system.nuclear_repulsion())
    e0 = Hbar[0, 0] + e_nuc  # = E_CCSD (consistency anchor, tested)
    residual = float(np.max(np.abs(Hp[1:, 0])))
    w = np.linalg.eigvals(Hp)
    w = np.sort(w.real) + e_nuc
    # the lowest root is the CC ground state; excitations are relative
    omega = w[1:] - w[0]
    k = min(nstates, omega.shape[0])
    return EomOutput(
        scf_total_energy=ctx["scf_total_energy"],
        ccsd_total_energy=float(e0),
        excitation_energies=omega[:k],
        dimension=len(keep),
        fci_dimension=len(dets),
        cc_iterations=ctx["cc_iters"],
        amplitude_residual=residual,
    )


@dataclasses.dataclass
class EomPropertiesOutput:
    scf_total_energy: float
    ccsd_total_energy: float
    excitation_energies: np.ndarray  # (nstates,) Hartree, ascending
    oscillator_strengths: np.ndarray  # (nstates,) length-gauge f values
    transition_strengths: np.ndarray  # (nstates, 3) S_d = T_L,d * T_R,d
    ground_state_dipole: np.ndarray  # (3,) a.u., nuclear + electronic
    dimension: int

    def excitation_energies_ev(self) -> np.ndarray:
        return self.excitation_energies * HARTREE_TO_EV


def eom_ccsd_properties(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 5,
    max_dim: int = 4000,
    cc_epsilon: float = 1e-10,
) -> EomPropertiesOutput:
    """EOM-CCSD transition dipoles and oscillator strengths, exact in the
    determinant-space tier.

    Hbar is non-Hermitian, so transition strengths are BIORTHOGONAL
    products: with right eigenvectors R_k and their duals L = R^{-1}
    (rows — exact left eigenvectors of the diagonalizable projected Hbar),

        S_k,d = <L_0| mubar_d |R_k> <L_k| mubar_d |R_0>,
        f_k   = (2/3) omega_k sum_d S_k,d,

    where mubar = e^{-T} mu e^{T} is the similarity-transformed dipole
    built with the same nilpotent expansions as Hbar. S_k,d is
    gauge-consistent even though each factor separately is not (the
    left and right transition moments differ away from Hermiticity).
    The ground-state row doubles as an independent property check:
    <L_0|mubar|R_0> + mu_nuc must match the Lambda-equation analytic
    dipole (models/cc_lambda.py) — pinned in tests.

    The reference has no excited-state tier at all (rhf.rs/uhf.rs are its
    only models); this is capability beyond
    /root/reference/core/src/hf/rhf.rs.
    """
    from qchem_rs_tpu.ops.one_electron import dipole_integrals

    ctx = _cc_context(system, config, max_dim, cc_epsilon)
    na, nb = ctx["na"], ctx["nb"]
    Hbar, dets, index, Xi, X = _hbar_sector(ctx, na, nb, return_transforms=True)
    hf = ctx["hf_mask"]
    ranks = np.array([bin(m ^ hf).count("1") // 2 for m in dets])
    keep = np.where(ranks <= 2)[0]
    sel = np.ix_(keep, keep)
    Hp = Hbar[sel]

    C = ctx["C"]
    mu_ao = np.asarray(dipole_integrals(system))  # (3, nao, nao)
    # electrons carry charge -1: electronic dipole operator is -r
    mubar = [
        (Xi @ _one_body_matrix(-(C.T @ mu_ao[d] @ C), ctx["n"], dets, index) @ X)[sel]
        for d in range(3)
    ]

    w, R = np.linalg.eig(Hp)
    order = np.argsort(w.real)
    w = w[order]
    R = R[:, order]
    L = np.linalg.inv(R)  # rows are the biorthonormal left eigenvectors
    omega = (w[1:] - w[0]).real
    k = min(nstates, omega.shape[0])

    mu_nuc = np.array([
        sum(a.ordinal * a.position[d] for a in system.atoms) for d in range(3)
    ])
    mu_gs = np.array([
        (L[0] @ mubar[d] @ R[:, 0]).real for d in range(3)
    ]) + mu_nuc

    strengths = np.zeros((k, 3))
    for j in range(k):
        s = j + 1  # state index in the sorted spectrum
        for d in range(3):
            t_r = L[0] @ mubar[d] @ R[:, s]
            t_l = L[s] @ mubar[d] @ R[:, 0]
            strengths[j, d] = (t_r * t_l).real
    f = (2.0 / 3.0) * omega[:k] * strengths.sum(axis=1)

    e_nuc = float(system.nuclear_repulsion())
    return EomPropertiesOutput(
        scf_total_energy=ctx["scf_total_energy"],
        ccsd_total_energy=float(Hbar[0, 0] + e_nuc),
        excitation_energies=omega[:k],
        oscillator_strengths=f,
        transition_strengths=strengths,
        ground_state_dipole=mu_gs,
        dimension=len(keep),
    )


def eom_ccsd_transition_moments(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nstates: int = 5,
    tol: float = 1e-7,
    cc_epsilon: float = 1e-10,
) -> EomPropertiesOutput:
    """PRODUCTION-tier EOM-CCSD transition dipoles / oscillator strengths:
    matrix-free (Davidson + AD through the verified amplitude residual), no
    determinant space anywhere — scales wherever ground-state CCSD runs.

    Biorthogonal strengths per Cartesian direction d:

        S_kd  = T^L_kd * T^R_kd,     f_k = (2/3) omega_k sum_d S_kd

    with every ingredient an automatic derivative of the residual
    G_K(t; f) = <K|Hbar|0> and energy E(t; f) (models/cc.py general-f hook):

    - LEFT moment   T^L_kd = <0|L_k mubar_d|0> = l_k . xi_d  where
      xi_d = dG/df . mu_d  (one jvp over the one-body blocks): the
      connected <K|mubar|0> amplitudes.
    - RIGHT moment  T^R_kd = <0|(1+Lambda) mubar_d R_k|0>. Using
      <0|mubar|K> = d/dt_K <0|mubar|0> (tau_K^+ kills |0>), the rank<=2
      closure of mubar R|0>, and r0 = -(lambda . r) (biorthogonality of
      R_k against the ground-state left vector (1, lambda)), the
      origin-dependent <0|mubar|0> cancels exactly and

        T^R_kd = eta_d . r  +  lambda . (dxi_d/dt . r)
                 + lambda_2 . P2(r_1, xi_d,1)  -  (lambda . r)(lambda . xi_d)

      where eta_d = grad_t(dE/df . mu_d) (the <0|mubar|K> row),
      dxi_d/dt . r is a nested jvp (t-direction r of the f-jvp), and
      P2 = A(r_1 x xi_1) is the closed-form DISCONNECTED piece
      <M_2|R_1 Xi_1|0> = r_ia xi_jb - r_ja xi_ib - r_ib xi_ja + r_jb xi_ia
      (the term plain first-order AD of the Lagrangian cannot produce —
      docs/ROADMAP round-5 note).

    Spinorbital formulation (all Ms = 0 roots; triplets come out with
    numerically zero strength from a singlet ground state). Validated
    root-by-root against the exact determinant-space tier
    (eom_ccsd_properties) in tests/test_eom.py.
    """
    import jax
    import jax.numpy as jnp

    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.cc import (
        _cc_loop,
        _ccsd_step,
        _spinorbital_setup,
    )
    from qchem_rs_tpu.models.cc_lambda import _mo_blocks, _solve_lambda
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock
    from qchem_rs_tpu.ops.one_electron import dipole_integrals

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    n_el = system.n_electrons(config.charge)
    na, nb = scf_mod.electron_counts(n_el, config.spin_multiplicity)
    if na != nb:
        raise ValueError("EOM requires a closed-shell RHF reference")
    out = restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged")
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    n = C.shape[1]
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
    t = (t1, t2)

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

    lam, _ = _solve_lambda({"G": G, "E": E_corr_fn, "t": t, "D": (D1, D2)})

    # --- right + left Davidson (cf. eom_ccsd_davidson spinorbital branch) --
    n1 = no * nv
    shape2 = (no, no, nv, nv)

    def G_t(a, b):
        t1n, t2n, _ = _ccsd_step(a, b, eps_o, eps_v, no, W)
        return D1 * (t1n - a), D2 * (t2n - b)

    @jax.jit
    def matvec(X):
        def one(x):
            r1 = x[:n1].reshape(no, nv)
            r2 = x[n1:].reshape(shape2)
            _, (s1, s2) = jax.jvp(G_t, t, (r1, r2))
            return jnp.concatenate([s1.reshape(-1), s2.reshape(-1)])

        return jax.vmap(one)(X)

    _, vjp_fun = jax.vjp(G_t, *t)

    @jax.jit
    def matvec_left(Xb):
        def one(x):
            l1 = x[:n1].reshape(no, nv)
            l2 = x[n1:].reshape(shape2)
            d1, d2 = vjp_fun((l1, l2))
            return jnp.concatenate([d1.reshape(-1), d2.reshape(-1)])

        return jax.vmap(one)(Xb)

    spin_o = np.array([0] * na + [1] * nb)
    spin_v = np.array([0] * (n - na) + [1] * (n - nb))
    mask1 = (spin_o[:, None] == spin_v[None, :]).astype(float)
    mask2 = (
        (spin_o[:, None, None, None] + spin_o[None, :, None, None])
        == (spin_v[None, None, :, None] + spin_v[None, None, None, :])
    ).astype(float)

    def in_subspace(B):
        if B.size == 0:
            return B
        cols = []
        for j in range(B.shape[1]):
            r1 = B[:n1, j].reshape(no, nv) * mask1
            r2 = B[n1:, j].reshape(shape2)
            r2 = 0.25 * (
                r2
                - r2.transpose(1, 0, 2, 3)
                - r2.transpose(0, 1, 3, 2)
                + r2.transpose(1, 0, 3, 2)
            ) * mask2
            cols.append(np.concatenate([r1.reshape(-1), r2.reshape(-1)]))
        return np.array(cols).T

    diag = np.concatenate(
        [np.asarray(-D1).reshape(-1), np.asarray(-D2).reshape(-1)]
    )
    k_int = nstates + 2
    w, XR, ok = _davidson_nonsym_lowest(
        matvec, diag, k_int, in_subspace=in_subspace, tol=tol
    )
    if not ok:
        raise RuntimeError("EOM Davidson (right) did not converge")
    wl, XL, okl = _davidson_nonsym_lowest(
        matvec_left, diag, k_int, in_subspace=in_subspace, tol=tol
    )
    if not okl:
        raise RuntimeError("EOM Davidson (left) did not converge")

    # pair left roots to right roots by eigenvalue, then biorthonormalize
    k = min(nstates, w.size)
    pairs = []
    used = set()
    for s in range(k):
        cand = np.argsort(np.abs(wl - w[s]))
        j = next(int(c) for c in cand if int(c) not in used)
        used.add(j)
        if abs(wl[j] - w[s]) > 100 * tol + 1e-9:
            raise RuntimeError(
                f"left/right spectra disagree: {w[s]:.8f} vs {wl[j]:.8f}"
            )
        pairs.append(j)

    # --- dipole AD ingredients --------------------------------------------
    mu_ao = np.asarray(dipole_integrals(system))  # (3, nao, nao)
    ctx_mo = {"C": C, "na": na}
    zeros = (
        jnp.zeros((2 * na, 2 * na)),
        jnp.zeros((2 * na, 2 * (n - na))),
        jnp.zeros((2 * (n - na), 2 * (n - na))),
    )
    D_hf = np.asarray(out.density)
    mu_nuc = np.array([
        sum(a.ordinal * a.position[d] for a in system.atoms) for d in range(3)
    ])

    def flat(ts):
        return jnp.concatenate([ts[0].reshape(-1), ts[1].reshape(-1)])

    lam_v = np.asarray(flat(lam))
    strengths = np.zeros((k, 3))
    mu_gs = np.zeros(3)
    for d in range(3):
        f_d = _mo_blocks(ctx_mo, -(mu_ao[d]))  # electron charge -1
        _, xi = jax.jvp(lambda ff: G(t, ff), (zeros,), (f_d,))
        eta = jax.grad(
            lambda ts: jax.jvp(lambda ff: E_corr_fn(ts, ff), (zeros,), (f_d,))[1]
        )(t)
        xi_v = np.asarray(flat(xi))
        eta_v = np.asarray(flat(eta))
        lam_xi = float(lam_v @ xi_v)
        # ground-state (unrelaxed Lambda) dipole: reference + correlation
        e_ref = float(np.sum(D_hf * (-(mu_ao[d]))))
        de = float(jax.jvp(lambda ff: E_corr_fn(t, ff), (zeros,), (f_d,))[1])
        mu_gs[d] = e_ref + de + lam_xi + mu_nuc[d]

        xi1 = np.asarray(xi[0])
        for s in range(k):
            r_v = XR[:, s]
            l_v = XL[:, pairs[s]]
            l_v = l_v / float(l_v @ r_v)  # biorthonormal pair
            t_left = float(l_v @ xi_v)

            r1 = jnp.asarray(r_v[:n1].reshape(no, nv))
            r2 = jnp.asarray(r_v[n1:].reshape(shape2))
            _, dxi = jax.jvp(
                lambda ts: jax.jvp(lambda ff: G(ts, ff), (zeros,), (f_d,))[1],
                (t,),
                ((r1, r2),),
            )
            r1n = np.asarray(r1)
            P2 = (
                np.einsum("ia,jb->ijab", r1n, xi1)
                - np.einsum("ja,ib->ijab", r1n, xi1)
                - np.einsum("ib,ja->ijab", r1n, xi1)
                + np.einsum("jb,ia->ijab", r1n, xi1)
            )
            lam_r = float(lam_v @ r_v)
            t_right = (
                float(eta_v @ r_v)
                + float(lam_v @ np.asarray(flat(dxi)))
                + float(np.asarray(lam[1]).reshape(-1) @ P2.reshape(-1))
                - lam_r * lam_xi
            )
            strengths[s, d] = t_left * t_right

    omega = np.asarray(w)[:k]
    f_osc = (2.0 / 3.0) * omega * strengths.sum(axis=1)
    return EomPropertiesOutput(
        scf_total_energy=out.total_energy(),
        ccsd_total_energy=out.total_energy() + e_corr,
        excitation_energies=omega,
        oscillator_strengths=f_osc,
        transition_strengths=strengths,
        ground_state_dipole=mu_gs,
        dimension=diag.size,
    )
