"""Independent slow reference integrals via Obara-Saika recursions.

Test-only oracle, deliberately a *different algorithm family* than the
production McMurchie-Davidson path (qchem_rs_tpu/ops): scalar numpy
Obara-Saika vertical/horizontal recursions. Agreement between the two to
~1e-11 on random mixed-l systems is the core correctness argument for the
integrals engine, since the reference's molint crate is not available
(SURVEY.md §2.1) and PySCF is not installed in this environment.

Boys function here uses the series/asymptotic scheme in plain numpy; that
scheme is itself validated against adaptive quadrature in tests/test_boys.py.
"""

from __future__ import annotations

import numpy as np

from qchem_rs_tpu.ops.angular import cart_components, ncart


def boys_np(mmax: int, T: float) -> np.ndarray:
    out = np.empty(mmax + 1)
    if T < 35.0:
        term = 1.0 / (2.0 * mmax + 1.0)
        acc = term
        for i in range(200):
            term *= 2.0 * T / (2.0 * mmax + 2.0 * i + 3.0)
            acc += term
            if term < 1e-18 * acc:
                break
        out[mmax] = np.exp(-T) * acc
        for m in range(mmax, 0, -1):
            out[m - 1] = (2.0 * T * out[m] + np.exp(-T)) / (2.0 * m - 1.0)
    else:
        out[0] = 0.5 * np.sqrt(np.pi / T)
        eT = np.exp(-T)
        for m in range(mmax):
            out[m + 1] = ((2.0 * m + 1.0) * out[m] - eT) / (2.0 * T)
    return out


# --- 1D Obara-Saika overlap table -------------------------------------------


def _os_1d(imax, jmax, a, b, A, B):
    """1D overlap integrals s(i,j) = <x^i_A | x^j_B> including the Gaussian
    prefactor and sqrt(pi/p) (full 1D integral)."""
    p = a + b
    mu = a * b / p
    XAB = A - B
    XPA = -(b / p) * XAB
    XPB = (a / p) * XAB
    s = np.zeros((imax + 3, jmax + 3))
    s[0, 0] = np.sqrt(np.pi / p) * np.exp(-mu * XAB * XAB)

    def get(i, j):
        return s[i, j] if i >= 0 and j >= 0 else 0.0

    for i in range(imax + 2):
        s[i + 1, 0] = XPA * s[i, 0] + (0.5 / p) * (i * get(i - 1, 0))
    for j in range(jmax + 2):
        for i in range(imax + 3):
            s[i, j + 1] = XPB * s[i, j] + (0.5 / p) * (i * get(i - 1, j) + j * get(i, j - 1))
    return s


def prim_overlap(a, la_c, A, b, lb_c, B):
    """Primitive Cartesian overlap, component tuples la_c=(ix,iy,iz)."""
    sx = _os_1d(la_c[0], lb_c[0], a, b, A[0], B[0])
    sy = _os_1d(la_c[1], lb_c[1], a, b, A[1], B[1])
    sz = _os_1d(la_c[2], lb_c[2], a, b, A[2], B[2])
    return sx[la_c[0], lb_c[0]] * sy[la_c[1], lb_c[1]] * sz[la_c[2], lb_c[2]]


def prim_kinetic(a, la_c, A, b, lb_c, B):
    i, j, k = la_c
    x, y, z = lb_c
    sx = _os_1d(i, x + 2, a, b, A[0], B[0])
    sy = _os_1d(j, y + 2, a, b, A[1], B[1])
    sz = _os_1d(k, z + 2, a, b, A[2], B[2])

    def t1d(s, i_, j_):
        t = -2.0 * b * b * s[i_, j_ + 2] + b * (2 * j_ + 1) * s[i_, j_]
        if j_ >= 2:
            t -= 0.5 * j_ * (j_ - 1) * s[i_, j_ - 2]
        return t

    return (
        t1d(sx, i, x) * sy[j, y] * sz[k, z]
        + sx[i, x] * t1d(sy, j, y) * sz[k, z]
        + sx[i, x] * sy[j, y] * t1d(sz, k, z)
    )


# --- nuclear attraction (OS with auxiliary index) ---------------------------


def prim_nuclear(a, la_c, A, b, lb_c, B, C):
    """<a|1/|r-C||b> (positive sign; caller applies -Z)."""
    p = a + b
    mu = a * b / p
    AB = np.asarray(A) - np.asarray(B)
    P = (a * np.asarray(A) + b * np.asarray(B)) / p
    PA = P - np.asarray(A)
    PB = P - np.asarray(B)
    PC = P - np.asarray(C)
    Ltot = sum(la_c) + sum(lb_c)
    F = boys_np(Ltot, p * float(PC @ PC))
    pref = 2.0 * np.pi / p * np.exp(-mu * float(AB @ AB))

    from functools import lru_cache

    def dec(vec, d):
        out = list(vec)
        out[d] -= 1
        return tuple(out)

    @lru_cache(maxsize=None)
    def theta(avec, bvec, m):
        if min(avec) < 0 or min(bvec) < 0:
            return 0.0
        if sum(avec) == 0 and sum(bvec) == 0:
            return pref * F[m]
        # OS downward step on the first nonzero bra index, then ket:
        # theta^m_{a,b} = PA_d th^m_{a',b} - PC_d th^{m+1}_{a',b}
        #   + a'_d/(2p) (th^m_{a'-1,b} - th^{m+1}_{a'-1,b})
        #   + b_d/(2p)  (th^m_{a',b-1} - th^{m+1}_{a',b-1})      (a' = a-1_d)
        for d in range(3):
            if avec[d] > 0:
                a1 = dec(avec, d)
                val = PA[d] * theta(a1, bvec, m) - PC[d] * theta(a1, bvec, m + 1)
                if a1[d] > 0:
                    a2 = dec(a1, d)
                    val += (a1[d] / (2 * p)) * (theta(a2, bvec, m) - theta(a2, bvec, m + 1))
                if bvec[d] > 0:
                    b1 = dec(bvec, d)
                    val += (bvec[d] / (2 * p)) * (theta(a1, b1, m) - theta(a1, b1, m + 1))
                return val
        for d in range(3):
            if bvec[d] > 0:
                b1 = dec(bvec, d)
                val = PB[d] * theta(avec, b1, m) - PC[d] * theta(avec, b1, m + 1)
                if b1[d] > 0:
                    b2 = dec(b1, d)
                    val += (b1[d] / (2 * p)) * (theta(avec, b2, m) - theta(avec, b2, m + 1))
                return val
        raise AssertionError

    return theta(tuple(la_c), tuple(lb_c), 0)


# --- ERI via OS vertical + horizontal recursions ----------------------------


def prim_eri(a, la_c, A, b, lb_c, B, c, lc_c, C, d, ld_c, D):
    """Primitive Cartesian ERI (ab|cd) in chemists' notation."""
    A, B, C, D = map(np.asarray, (A, B, C, D))
    p = a + b
    q = c + d
    P = (a * A + b * B) / p
    Q = (c * C + d * D) / q
    W = (p * P + q * Q) / (p + q)
    rho = p * q / (p + q)
    AB = A - B
    CD = C - D
    PQ = P - Q
    Ltot = sum(la_c) + sum(lb_c) + sum(lc_c) + sum(ld_c)
    F = boys_np(Ltot, rho * float(PQ @ PQ))
    Kab = np.exp(-(a * b / p) * float(AB @ AB))
    Kcd = np.exp(-(c * d / q) * float(CD @ CD))
    pref = 2.0 * np.pi**2.5 / (p * q * np.sqrt(p + q)) * Kab * Kcd
    PA = P - A
    WP = W - P
    QC = Q - C
    WQ = W - Q

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def vrr(ax, ay, az, cx, cy, cz, m):
        """(a 0 | c 0)^(m) with pure-bra/pure-ket angular momentum."""
        if min(ax, ay, az, cx, cy, cz) < 0:
            return 0.0
        if ax == ay == az == cx == cy == cz == 0:
            return pref * F[m]
        avec = [ax, ay, az]
        cvec = [cx, cy, cz]
        for dd in range(3):
            if avec[dd] > 0:
                am = avec.copy()
                am[dd] -= 1
                am2 = am.copy()
                am2[dd] -= 1
                cm = cvec.copy()
                cm[dd] -= 1
                val = PA[dd] * vrr(*am, *cvec, m) + WP[dd] * vrr(*am, *cvec, m + 1)
                if am2[dd] >= 0:
                    val += (am[dd] / (2 * p)) * (
                        vrr(*am2, *cvec, m) - (rho / p) * vrr(*am2, *cvec, m + 1)
                    )
                if cm[dd] >= 0:
                    val += (cvec[dd] / (2 * (p + q))) * vrr(*am, *cm, m + 1)
                return val
        for dd in range(3):
            if cvec[dd] > 0:
                cm = cvec.copy()
                cm[dd] -= 1
                cm2 = cm.copy()
                cm2[dd] -= 1
                val = QC[dd] * vrr(0, 0, 0, *cm, m) + WQ[dd] * vrr(0, 0, 0, *cm, m + 1)
                if cm2[dd] >= 0:
                    val += (cm[dd] / (2 * q)) * (
                        vrr(0, 0, 0, *cm2, m) - (rho / q) * vrr(0, 0, 0, *cm2, m + 1)
                    )
                return val
        raise AssertionError

    @lru_cache(maxsize=None)
    def hrr_bra(ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz):
        """(a b | c d) built by horizontal recursion from (a+b, 0 | c+d, 0)."""
        bvec = [bx, by, bz]
        for dd in range(3):
            if bvec[dd] > 0:
                bm = bvec.copy()
                bm[dd] -= 1
                ap = [ax, ay, az]
                ap[dd] += 1
                return hrr_bra(*ap, *bm, cx, cy, cz, dx, dy, dz) + AB[dd] * hrr_bra(
                    ax, ay, az, *bm, cx, cy, cz, dx, dy, dz
                )
        dvec = [dx, dy, dz]
        for dd in range(3):
            if dvec[dd] > 0:
                dm = dvec.copy()
                dm[dd] -= 1
                cp = [cx, cy, cz]
                cp[dd] += 1
                return hrr_bra(ax, ay, az, 0, 0, 0, *cp, *dm) + CD[dd] * hrr_bra(
                    ax, ay, az, 0, 0, 0, cx, cy, cz, *dm
                )
        return vrr(ax, ay, az, cx, cy, cz, 0)

    return hrr_bra(*la_c, *lb_c, *lc_c, *ld_c)


# --- contracted AO matrices over a MolecularSystem --------------------------


def _contract_pair(fn, sh_a, sh_b, *extra):
    na, nb = ncart(sh_a.l), ncart(sh_b.l)
    out = np.zeros((na, nb))
    for ia, ca_comp in enumerate(cart_components(sh_a.l)):
        for ib, cb_comp in enumerate(cart_components(sh_b.l)):
            v = 0.0
            for pa, ca in zip(sh_a.exponents, sh_a.coefficients):
                for pb, cb in zip(sh_b.exponents, sh_b.coefficients):
                    v += ca * cb * fn(pa, ca_comp, sh_a.center, pb, cb_comp, sh_b.center, *extra)
            out[ia, ib] = v
    return out


def overlap_np(system):
    return _matrix_np(system, prim_overlap)


def kinetic_np(system):
    return _matrix_np(system, prim_kinetic)


def _matrix_np(system, prim_fn):
    nao = system.n_basis()
    M = np.zeros((nao, nao))
    for sa in system.shells:
        for sb in system.shells:
            blk = _contract_pair(prim_fn, sa, sb)
            M[
                sa.ao_offset : sa.ao_offset + ncart(sa.l),
                sb.ao_offset : sb.ao_offset + ncart(sb.l),
            ] = blk
    n = system.ao_norms
    return M * n[:, None] * n[None, :]


def nuclear_np(system):
    nao = system.n_basis()
    M = np.zeros((nao, nao))
    for sa in system.shells:
        for sb in system.shells:
            blk = np.zeros((ncart(sa.l), ncart(sb.l)))
            for atom, Z in zip(system.atoms, system.charges):
                blk -= Z * _contract_pair(prim_nuclear, sa, sb, atom.position)
            M[
                sa.ao_offset : sa.ao_offset + ncart(sa.l),
                sb.ao_offset : sb.ao_offset + ncart(sb.l),
            ] = blk
    n = system.ao_norms
    return M * n[:, None] * n[None, :]


def eri_np(system):
    """Full dense (nao, nao, nao, nao) ERI tensor, chemists' notation (ij|kl).
    Brutally slow — tiny systems only."""
    nao = system.n_basis()
    out = np.zeros((nao, nao, nao, nao))
    shells = system.shells
    for sa in shells:
        for sb in shells:
            for sc in shells:
                for sd in shells:
                    na, nb, nc, nd = (ncart(s.l) for s in (sa, sb, sc, sd))
                    blk = np.zeros((na, nb, nc, nd))
                    for i, cai in enumerate(cart_components(sa.l)):
                        for j, cbj in enumerate(cart_components(sb.l)):
                            for k, cck in enumerate(cart_components(sc.l)):
                                for l, cdl in enumerate(cart_components(sd.l)):
                                    v = 0.0
                                    for pa, ca in zip(sa.exponents, sa.coefficients):
                                        for pb, cb in zip(sb.exponents, sb.coefficients):
                                            for pc, cc_ in zip(sc.exponents, sc.coefficients):
                                                for pd, cd in zip(sd.exponents, sd.coefficients):
                                                    v += ca * cb * cc_ * cd * prim_eri(
                                                        pa, cai, sa.center,
                                                        pb, cbj, sb.center,
                                                        pc, cck, sc.center,
                                                        pd, cdl, sd.center,
                                                    )
                                    blk[i, j, k, l] = v
                    out[
                        sa.ao_offset : sa.ao_offset + na,
                        sb.ao_offset : sb.ao_offset + nb,
                        sc.ao_offset : sc.ao_offset + nc,
                        sd.ao_offset : sd.ao_offset + nd,
                    ] = blk
    n = system.ao_norms
    return out * n[:, None, None, None] * n[None, :, None, None] * n[None, None, :, None] * n[None, None, None, :]
