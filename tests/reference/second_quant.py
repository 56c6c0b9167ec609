"""Brute-force second-quantization FCI Hamiltonian (test oracle).

Builds H[I, J] = <det_I| H |det_J> by literally applying

    H = sum_PQ h_PQ a+_P a_Q  +  1/2 sum_PQRS (PQ|RS) a+_P a+_R a_S a_Q

(spinorbital chemist notation) to occupation bitmasks with explicit
fermionic sign bookkeeping. O((2n)^4 * dim) — absurdly slow, obviously
correct, zero shared code with qchem_rs_tpu.models.fci: every Slater-Condon
rule and phase in the product module is validated against this.

Spinorbital convention: spatial orbital p -> alpha = p, beta = n + p, so a
determinant (alpha mask, beta mask) maps to the spinorbital mask
alpha | (beta << n). Determinant ordering matches models/fci.py (alpha-major
over lexicographic itertools.combinations strings).
"""

from __future__ import annotations

import itertools

import numpy as np


def _strings(n: int, k: int) -> list[int]:
    out = []
    for occ in itertools.combinations(range(n), k):
        m = 0
        for p in occ:
            m |= 1 << p
        out.append(m)
    return out


def _annihilate(mask: int, q: int):
    """a_q |mask> -> (sign, mask') or None."""
    if not (mask >> q) & 1:
        return None
    below = bin(mask & ((1 << q) - 1)).count("1")
    return (1 - 2 * (below & 1), mask ^ (1 << q))


def _create(mask: int, p: int):
    """a+_p |mask> -> (sign, mask') or None."""
    if (mask >> p) & 1:
        return None
    below = bin(mask & ((1 << p) - 1)).count("1")
    return (1 - 2 * (below & 1), mask | (1 << p))


def brute_force_hamiltonian(
    h: np.ndarray, g: np.ndarray, n_alpha: int, n_beta: int
) -> np.ndarray:
    """Dense FCI H over (alpha x beta) determinants, by operator application.

    h: (n, n) spatial one-electron MO matrix; g: (n, n, n, n) chemist
    (pq|rs) spatial MO tensor."""
    n = h.shape[0]
    nso = 2 * n

    def spin_h(P, Q):
        if (P < n) != (Q < n):
            return 0.0
        return h[P % n, Q % n]

    def spin_g(P, Q, R, S):
        if (P < n) != (Q < n) or (R < n) != (S < n):
            return 0.0
        return g[P % n, Q % n, R % n, S % n]

    sa, sb = _strings(n, n_alpha), _strings(n, n_beta)
    dets = [a | (b << n) for a in sa for b in sb]
    index = {m: i for i, m in enumerate(dets)}
    dim = len(dets)
    H = np.zeros((dim, dim))

    for J, mJ in enumerate(dets):
        # one-electron part
        for Q in range(nso):
            r1 = _annihilate(mJ, Q)
            if r1 is None:
                continue
            s1, m1 = r1
            for P in range(nso):
                hPQ = spin_h(P, Q)
                if hPQ == 0.0:
                    continue
                r2 = _create(m1, P)
                if r2 is None:
                    continue
                s2, m2 = r2
                H[index[m2], J] += s1 * s2 * hPQ
        # two-electron part: 1/2 sum (PQ|RS) a+_P a+_R a_S a_Q
        for Q in range(nso):
            rq = _annihilate(mJ, Q)
            if rq is None:
                continue
            sq, mq = rq
            for S in range(nso):
                rs = _annihilate(mq, S)
                if rs is None:
                    continue
                ss, ms = rs
                for R in range(nso):
                    rr = _create(ms, R)
                    if rr is None:
                        continue
                    sr, mr = rr
                    for P in range(nso):
                        v = spin_g(P, Q, R, S)
                        if v == 0.0:
                            continue
                        rp = _create(mr, P)
                        if rp is None:
                            continue
                        sp, mp = rp
                        H[index[mp], J] += 0.5 * sq * ss * sr * sp * v
    return H


def random_integrals(n: int, seed: int = 0):
    """Random (h, g) with the full 8-fold real-orbital permutation symmetry."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n, n))
    h = 0.5 * (h + h.T)
    t = rng.standard_normal((n, n, n, n))
    g = t + t.transpose(1, 0, 2, 3) + t.transpose(0, 1, 3, 2) + t.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    return h, g / 8.0
