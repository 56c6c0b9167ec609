"""Determinant full CI for small systems.

A capability rung above the reference (qchem-rs stops at mean-field
energies, /root/reference/README.md:1-6) and the correctness ANCHOR of the
correlation tier: FCI is exact within the basis, so

  * CCSD on any two-electron system must reproduce it to machine precision
    (models/cc.py tests), and
  * every correlation method is bounded by it (E_FCI <= E_MP2-total, etc.).

Design: the Hamiltonian is assembled over (alpha-string, beta-string)
determinant pairs with the usual spin-factorized Slater-Condon structure —
excitations factor into per-spin-sector string singles/doubles, so the
assembly is numpy-vectorized over the opposite spin sector instead of
looping over all dim^2 determinant pairs. This combinatorial, irregular,
host-side work is deliberately NOT device code: dimensions are capped at a
few thousand determinants where the dense symmetric eigensolve dominates
and the assembly is milliseconds. The n^5 MO transform that feeds it IS
device work (four MXU quarter-transforms, models/mp2.py pattern).

Orbital invariance: full CI is invariant under any orthonormal single-
particle basis change, so the solver accepts either converged RHF orbitals
(meaningful E_corr bookkeeping) or symmetric-Loewdin orthogonalized AOs
(no SCF required — works for open shells and non-aufbau cases); both give
the same eigenvalues, which doubles as a sharp self-test of every
Slater-Condon phase (tests/test_fci.py).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.utils.system import MolecularSystem


@dataclasses.dataclass
class FciOutput:
    total_energies: np.ndarray  # (nroots,) ascending, nuclear repulsion included
    dimension: int
    n_alpha: int
    n_beta: int
    scf_total_energy: Optional[float]  # None when orbitals="lowdin"

    def total_energy(self) -> float:
        return float(self.total_energies[0])

    def correlation_energy(self) -> Optional[float]:
        if self.scf_total_energy is None:
            return None
        return self.total_energy() - self.scf_total_energy


@jax.jit
def _transform_full(e4: jax.Array, C: jax.Array) -> jax.Array:
    """(pq|rs) AO -> MO, four quarter-transforms, one n^4 buffer at a time."""
    x = jnp.einsum("pqrs,pi->iqrs", e4, C)
    x = jnp.einsum("iqrs,qj->ijrs", x, C)
    x = jnp.einsum("ijrs,rk->ijks", x, C)
    return jnp.einsum("ijks,sl->ijkl", x, C)


# --------------------------------------------------------------------------
# spin-string machinery (host-side, bitmask ints)
# --------------------------------------------------------------------------


def _strings(n: int, k: int) -> list[int]:
    """All k-electron occupation bitmasks over n orbitals, lexicographic."""
    out = []
    for occ in itertools.combinations(range(n), k):
        m = 0
        for p in occ:
            m |= 1 << p
        out.append(m)
    return out


def _occ(mask: int) -> list[int]:
    out, p = [], 0
    while mask:
        if mask & 1:
            out.append(p)
        mask >>= 1
        p += 1
    return out


def _single_phase(mask: int, i: int, a: int) -> int:
    """Parity of moving one electron i -> a within `mask` (i occupied,
    a empty): (-1)^(number of occupied orbitals strictly between them)."""
    lo, hi = (i, a) if i < a else (a, i)
    between = mask & (((1 << hi) - 1) ^ ((1 << (lo + 1)) - 1))
    return 1 - 2 * (bin(between).count("1") & 1)


def _sector_excitations(strings: list[int]):
    """Per-spin-sector excitation lists between the given strings.

    Returns (singles, doubles):
      singles: list of (I, J, i, a, phase)       J = I with i -> a
      doubles: list of (I, J, i, j, a, b, phase) holes i < j, parts a < b,
               phase = sequential application (i -> a, then j -> b)
    Both directions are enumerated independently (I -> J and J -> I appear
    as separate entries), so Hamiltonian symmetry is an emergent property
    the tests can check, not an imposed one.
    """
    index = {m: I for I, m in enumerate(strings)}
    n_max = max(strings).bit_length() if strings else 0
    singles, doubles = [], []
    for I, m in enumerate(strings):
        occ = _occ(m)
        virt = [p for p in range(n_max) if not (m >> p) & 1]
        for i in occ:
            for a in virt:
                m1 = m ^ (1 << i) | (1 << a)
                J = index.get(m1)
                if J is not None:
                    singles.append((I, J, i, a, _single_phase(m, i, a)))
        for i, j in itertools.combinations(occ, 2):
            for a, b in itertools.combinations(virt, 2):
                ph1 = _single_phase(m, i, a)
                m1 = m ^ (1 << i) | (1 << a)
                ph2 = _single_phase(m1, j, b)
                m2 = m1 ^ (1 << j) | (1 << b)
                J = index.get(m2)
                if J is not None:
                    doubles.append((I, J, i, j, a, b, ph1 * ph2))
    return singles, doubles


def _build_hamiltonian(
    h: np.ndarray, g: np.ndarray, na: int, nb: int
) -> tuple[np.ndarray, int]:
    """Dense FCI Hamiltonian over (alpha-string x beta-string) determinants.

    `h` is the one-electron MO matrix, `g` the chemist-notation (pq|rs) MO
    tensor, both over one orthonormal spatial orbital set shared by the two
    spins. Determinant index = Ia * n_beta_strings + Ib (alpha-major).
    """
    n = h.shape[0]
    sa, sb = _strings(n, na), _strings(n, nb)
    na_str, nb_str = len(sa), len(sb)
    dim = na_str * nb_str
    H = np.zeros((dim, dim))

    occ_a = np.array([[(m >> p) & 1 for p in range(n)] for m in sa], dtype=float)
    occ_b = np.array([[(m >> p) & 1 for p in range(n)] for m in sb], dtype=float)
    Jmat = np.einsum("ppqq->pq", g)  # (pp|qq)
    Kmat = np.einsum("pqqp->pq", g)  # (pq|qp)
    gd = np.einsum("pqjj->pqj", g)  # (pq|jj): vectorized Coulomb column
    gx = np.einsum("pjjq->pqj", g)  # (pj|jq): vectorized exchange column

    # -- diagonal: (0,0) ----------------------------------------------------
    e1_a = occ_a @ np.diag(h)
    e1_b = occ_b @ np.diag(h)
    ee_same_a = 0.5 * np.einsum("Ip,pq,Iq->I", occ_a, Jmat - Kmat, occ_a)
    ee_same_b = 0.5 * np.einsum("Ip,pq,Iq->I", occ_b, Jmat - Kmat, occ_b)
    e_ab = occ_a @ Jmat @ occ_b.T  # (na_str, nb_str)
    diag = (
        (e1_a + ee_same_a)[:, None] + (e1_b + ee_same_b)[None, :] + e_ab
    ).reshape(dim)
    H[np.arange(dim), np.arange(dim)] = diag

    singles_a, doubles_a = _sector_excitations(sa)
    singles_b, doubles_b = _sector_excitations(sb)
    ib_all = np.arange(nb_str)
    ia_all = np.arange(na_str)

    # -- alpha singles: (1,0) — vectorized over every beta string -----------
    for I, J, i, a, ph in singles_a:
        common = occ_a[I] * occ_a[J]  # spectators: occupied in both strings
        const = h[i, a] + common @ (gd[i, a] - gx[i, a])
        vals = ph * (const + occ_b @ gd[i, a])
        H[I * nb_str + ib_all, J * nb_str + ib_all] = vals

    # -- beta singles: (0,1) — vectorized over every alpha string -----------
    for I, J, i, a, ph in singles_b:
        common = occ_b[I] * occ_b[J]
        const = h[i, a] + common @ (gd[i, a] - gx[i, a])
        vals = ph * (const + occ_a @ gd[i, a])
        H[ia_all * nb_str + I, ia_all * nb_str + J] = vals

    # -- same-spin doubles: (2,0) / (0,2) ------------------------------------
    for I, J, i, j, a, b, ph in doubles_a:
        v = ph * (g[i, a, j, b] - g[i, b, j, a])
        H[I * nb_str + ib_all, J * nb_str + ib_all] = v
    for I, J, i, j, a, b, ph in doubles_b:
        v = ph * (g[i, a, j, b] - g[i, b, j, a])
        H[ia_all * nb_str + I, ia_all * nb_str + J] = v

    # -- opposite-spin doubles: (1,1) — vectorized over beta singles ---------
    if singles_b:
        sb_arr = np.array([(I, J, i, a, ph) for I, J, i, a, ph in singles_b])
        Ib, Jb = sb_arr[:, 0].astype(int), sb_arr[:, 1].astype(int)
        jb_i, jb_a = sb_arr[:, 2].astype(int), sb_arr[:, 3].astype(int)
        ph_b = sb_arr[:, 4]
        for I, J, i, a, ph in singles_a:
            vals = ph * ph_b * g[i, a, jb_i, jb_a]
            H[I * nb_str + Ib, J * nb_str + Jb] = vals

    return H, dim


def fci_from_integrals(
    h: np.ndarray,
    g: np.ndarray,
    n_alpha: int,
    n_beta: int,
    e_nuclear: float = 0.0,
    *,
    nroots: int = 1,
    max_dim: int = 4000,
) -> tuple[np.ndarray, int]:
    """Lowest `nroots` FCI total energies from MO-basis integrals.

    The core entry point — reused directly by the test oracle chain. Raises
    when the determinant space exceeds `max_dim` (dense eigensolve tier)."""
    n = h.shape[0]
    import math

    dim = math.comb(n, n_alpha) * math.comb(n, n_beta)
    if dim > max_dim:
        raise ValueError(
            f"FCI dimension {dim} exceeds max_dim={max_dim}; this solver is "
            "the dense small-system tier (raise max_dim explicitly if you "
            "really want a bigger dense eigensolve)"
        )
    H, dim = _build_hamiltonian(np.asarray(h), np.asarray(g), n_alpha, n_beta)
    if nroots >= dim:
        w = np.linalg.eigvalsh(H)
    else:
        # dense eigh is fine at this tier; slice the requested roots
        w = np.linalg.eigvalsh(H)[: max(nroots, 1)]
    return w[:nroots] + e_nuclear, dim


def fci(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    nroots: int = 1,
    max_dim: int = 4000,
    orbitals: str = "auto",
) -> FciOutput:
    """Full CI ground (and optionally excited) state total energies.

    orbitals:
      "rhf"    — converged closed-shell RHF orbitals (records E_SCF so
                 correlation_energy() is meaningful); even-electron only.
      "lowdin" — symmetric-Loewdin orthogonalized AOs; no SCF needed, works
                 for any (n_alpha, n_beta). Same eigenvalues (invariance).
      "auto"   — "rhf" for closed shells, else "lowdin".
    """
    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    n_el = system.n_electrons(config.charge)
    na, nb = scf_mod.electron_counts(n_el, config.spin_multiplicity)
    if orbitals == "auto":
        orbitals = "rhf" if na == nb else "lowdin"

    ones, engine = _incore_tools(system, config)
    positions = jnp.asarray(system.positions)
    H1 = ones["T"](positions) + ones["V"](positions)
    S = ones["S"](positions)

    scf_total = None
    if orbitals == "rhf":
        if na != nb:
            raise ValueError("orbitals='rhf' requires a closed shell")
        out = restricted_hartree_fock(system, config)
        if not out.converged:
            raise RuntimeError("SCF not converged; pass orbitals='lowdin'")
        C = jnp.asarray(out.coefficients)
        scf_total = out.total_energy()
    elif orbitals == "lowdin":
        C = scf_mod.lowdin_x(S)
    else:
        raise ValueError(f"unknown orbitals={orbitals!r}")

    e4 = engine.finish_eri(engine.build())
    g_mo = np.asarray(_transform_full(e4, C))
    h_mo = np.asarray(C.T @ H1 @ C)
    energies, dim = fci_from_integrals(
        h_mo,
        g_mo,
        na,
        nb,
        float(system.nuclear_repulsion()),
        nroots=nroots,
        max_dim=max_dim,
    )
    return FciOutput(
        total_energies=energies,
        dimension=dim,
        n_alpha=na,
        n_beta=nb,
        scf_total_energy=scf_total,
    )
