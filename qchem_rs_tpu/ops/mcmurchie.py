"""McMurchie-Davidson Hermite-Gaussian machinery (batched, trace-time codegen).

This replaces the unvendored ``molint`` integrals engine of the reference
(SURVEY.md §2.1). All recursions run at *trace time* over static angular
momentum bounds; at runtime everything is dense batched arrays, so each
integral class compiles to one fused XLA kernel (elementwise VPU work for the
recursions + batched MXU einsums for the Hermite->Cartesian contraction).

Conventions (standard MD, e.g. Helgaker/Jorgensen/Olsen ch. 9):

- E_t^{ij} Hermite expansion coefficients per dimension, recursion
    E_0^{00} = exp(-mu X_AB^2),  mu = ab/p,  p = a + b
    E_t^{i+1,j} = E_{t-1}^{ij}/(2p) + X_PA E_t^{ij} + (t+1) E_{t+1}^{ij}
    E_t^{i,j+1} = E_{t-1}^{ij}/(2p) + X_PB E_t^{ij} + (t+1) E_{t+1}^{ij}
- Hermite Coulomb integrals R_{tuv} via
    R^{(n)}_{000} = (-2p)^n F_n(p |PC|^2)
    R^{(n)}_{t+1,u,v} = t R^{(n+1)}_{t-1,u,v} + X_PC R^{(n+1)}_{t,u,v}   (etc.)
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.boys import boys


@lru_cache(maxsize=None)
def hermite_components(L: int) -> tuple[tuple[int, int, int], ...]:
    """All (t, u, v) with t+u+v <= L, in a fixed deterministic order."""
    return tuple(
        (t, u, v)
        for t in range(L + 1)
        for u in range(L + 1 - t)
        for v in range(L + 1 - t - u)
    )


@lru_cache(maxsize=None)
def hermite_index(L: int) -> dict[tuple[int, int, int], int]:
    return {tuv: s for s, tuv in enumerate(hermite_components(L))}


def nhermite(L: int) -> int:
    return (L + 1) * (L + 2) * (L + 3) // 6


def _e_step(E, x, inv2p, tcoef):
    """One E-coefficient ladder step, vectorized over the trailing t axis:
    E'_t = E_{t-1}/(2p) + x E_t + (t+1) E_{t+1}."""
    up = jnp.concatenate([jnp.zeros_like(E[..., :1]), E[..., :-1]], axis=-1)
    down = jnp.concatenate([E[..., 1:] * tcoef, jnp.zeros_like(E[..., :1])], axis=-1)
    return inv2p * up + x * E + down


def e_cubes(imax: int, jmax: int, a, b, AB):
    """Hermite expansion coefficient cubes for all three dimensions.

    a, b: exponents, any (broadcast-compatible) batch shape ``B``.
    AB:   A - B separation, shape ``B + (3,)``.

    Returns a list of three arrays (x, y, z), each of shape
    ``B + (imax+1, jmax+1, imax+jmax+1)`` where entry [..., i, j, t] is
    E_t^{ij} for that dimension (zero for t > i + j).

    The two-index ladder is vectorized over the Hermite t axis (and, for the
    j ladder, the whole i axis): O(imax + jmax) fused ops per dimension
    instead of O(imax * jmax * t) unrolled scalars — this is what keeps HLO
    size and compile time bounded for high-angular-momentum classes.
    """
    p = a + b
    inv2p = 0.5 / p
    mu = a * b / p
    tmax = imax + jmax
    tcoef = jnp.arange(1, tmax + 1, dtype=jnp.float64)
    cubes = []
    for d in range(3):
        ab_d = AB[..., d]
        xpa = -(b / p) * ab_d  # P - A
        xpb = (a / p) * ab_d  # P - B
        e00 = jnp.exp(-mu * ab_d * ab_d)
        # i ladder at j = 0: rows[i] has shape B + (tmax+1,)
        row = jnp.concatenate(
            [e00[..., None], jnp.zeros(e00.shape + (tmax,), e00.dtype)], axis=-1
        )
        rows = [row]
        for _ in range(imax):
            row = _e_step(row, xpa[..., None], inv2p[..., None], tcoef)
            rows.append(row)
        cube = jnp.stack(rows, axis=-2)  # B + (imax+1, tmax+1)
        # j ladder over the whole i axis at once
        planes = [cube]
        for _ in range(jmax):
            cube = _e_step(cube, xpb[..., None, None], inv2p[..., None, None], tcoef)
            planes.append(cube)
        cubes.append(jnp.stack(planes, axis=-2))  # B + (imax+1, jmax+1, tmax+1)
    return cubes


@lru_cache(maxsize=None)
def _r_plan(L: int):
    """Static gather plan for the vectorized R recursion.

    For each Hermite entry s=(t,u,v) (s>0), reduce along the first nonzero
    dimension d: R^{(n)}_s = PC_d R^{(n+1)}_{s-e_d} + c R^{(n+1)}_{s-2e_d}
    with c = (s_d - 1). c == 0 exactly when s-2e_d is out of range, so idx2
    can safely point anywhere (0) in that case.
    """
    comps = hermite_components(L)
    index = hermite_index(L)
    H = len(comps)
    onehot = np.zeros((H, 3))
    idx1 = np.zeros(H, dtype=np.int32)
    idx2 = np.zeros(H, dtype=np.int32)
    coef = np.zeros(H)
    for s, (t, u, v) in enumerate(comps):
        if s == 0:
            continue
        if t >= 1:
            d, e1, c = 0, (t - 1, u, v), t - 1
            e2 = (t - 2, u, v)
        elif u >= 1:
            d, e1, c = 1, (t, u - 1, v), u - 1
            e2 = (t, u - 2, v)
        else:
            d, e1, c = 2, (t, u, v - 1), v - 1
            e2 = (t, u, v - 2)
        onehot[s, d] = 1.0
        idx1[s] = index[e1]
        idx2[s] = index[e2] if c > 0 else 0
        coef[s] = c
    return onehot, idx1, idx2, coef


def r_table_leading(L: int, p, PC):
    """Hermite Coulomb integrals R_{tuv} = R^{(0)}_{tuv}(p, PC) for all
    t+u+v <= L, stacked along the LEADING axis in ``hermite_components(L)``
    order: returns shape ``(nhermite(L),) + B``.

    TPU layout note: the Hermite axis is small (<= a few hundred); keeping it
    leading leaves the large batch dims minormost, which avoids the massive
    tile-padding blowup of f64-emulated (bf16 x8) tensors whose last dims are
    small (observed 20x memory inflation the other way).

    Vectorized level-by-level downward recursion in the auxiliary index n:
    every level is ONE gather+multiply-add over the whole Hermite axis
    (compile-time O(L) HLO ops instead of O(L * nhermite) unrolled scalars,
    and only two levels live at once). Entries whose order exceeds L - n at
    level n are garbage-but-finite and provably never feed a valid entry.
    """
    T = p * jnp.sum(PC * PC, axis=-1)
    F = boys(L, T)  # (L+1,) + B
    m2p = -2.0 * p
    base = []
    acc = jnp.ones_like(p)
    for n in range(L + 1):
        base.append(acc * F[n])
        acc = acc * m2p

    onehot, idx1, idx2, coef = _r_plan(L)
    H = len(hermite_components(L))
    bshape = jnp.broadcast_shapes(jnp.shape(p), PC.shape[:-1])
    # PC component per Hermite entry: (H,) + B
    PCs = jnp.einsum("...d,sd->s...", jnp.broadcast_to(PC, bshape + (3,)), jnp.asarray(onehot))
    extra = (1,) * len(bshape)
    coef = jnp.asarray(coef).reshape((H,) + extra)
    idx1 = jnp.asarray(idx1)
    idx2 = jnp.asarray(idx2)

    R = jnp.zeros((H,) + bshape, dtype=PCs.dtype).at[0].set(base[L])
    for n in range(L - 1, -1, -1):
        R = PCs * R[idx1] + coef * R[idx2]
        R = R.at[0].set(base[n])
    return R


def r_table(L: int, p, PC):
    """Hermite Coulomb integrals with the Hermite axis LAST: ``B + (H,)``.

    Same vectorized downward recursion as r_table_leading but with gathers on
    the minor axis. Elementwise chains on small-minor-dim tensors fuse on TPU
    without materializing their padded tile layout, so this variant is the
    right input for the fused minor-axis R2m gather in the ERI chunk kernel
    (and it compiles much faster there than leading-axis gathers for high-L
    classes)."""
    T = p * jnp.sum(PC * PC, axis=-1)
    F = boys(L, T)  # (L+1,) + B
    m2p = -2.0 * p
    base = []
    acc = jnp.ones_like(p)
    for n in range(L + 1):
        base.append(acc * F[n])
        acc = acc * m2p

    onehot, idx1, idx2, coef = _r_plan(L)
    H = len(hermite_components(L))
    PCs = jnp.einsum("...d,sd->...s", PC, jnp.asarray(onehot))  # B + (H,)
    coef = jnp.asarray(coef)
    idx1 = jnp.asarray(idx1)
    idx2 = jnp.asarray(idx2)
    bshape = jnp.broadcast_shapes(jnp.shape(p), PC.shape[:-1])
    R = jnp.zeros(bshape + (H,), dtype=PCs.dtype).at[..., 0].set(base[L])
    for n in range(L - 1, -1, -1):
        R = PCs * R[..., idx1] + coef * R[..., idx2]
        R = R.at[..., 0].set(base[n])
    return R


@lru_cache(maxsize=None)
def cart_hermite_gather(la: int, lb: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static gather indices mapping E cubes -> dense (compAB, tuv) tensor.

    Returns integer arrays (i1, i2, j1, j2, k1, k2 gather plan):
    ``ix_a[A], ix_b[A]`` per-dimension powers for each component pair A and
    ``t_idx[S], u_idx[S], v_idx[S]`` for each Hermite component S of
    L = la + lb. Used as fancy indices into the e_cubes outputs so that

      E_bra[..., A, S] = Ex[..., ia[A], ib[A], t[S]]
                       * Ey[..., ja[A], jb[A], u[S]]
                       * Ez[..., ka[A], kb[A], v[S]]
    """
    from qchem_rs_tpu.ops.angular import cart_components

    comps_a = cart_components(la)
    comps_b = cart_components(lb)
    A_idx = [(ca, cb) for ca in comps_a for cb in comps_b]
    ia = np.array([ca[0] for ca, cb in A_idx])
    ja = np.array([ca[1] for ca, cb in A_idx])
    ka = np.array([ca[2] for ca, cb in A_idx])
    ib = np.array([cb[0] for ca, cb in A_idx])
    jb = np.array([cb[1] for ca, cb in A_idx])
    kb = np.array([cb[2] for ca, cb in A_idx])
    tuv = hermite_components(la + lb)
    t = np.array([s[0] for s in tuv])
    u = np.array([s[1] for s in tuv])
    v = np.array([s[2] for s in tuv])
    return (np.stack([ia, ja, ka]), np.stack([ib, jb, kb]), t, u, v, np.array([len(A_idx), len(tuv)]))


def hermite_expansion_dense(la: int, lb: int, a, b, AB):
    """Dense Hermite expansion tensor E[..., A, S] for a shell-pair class.

    A indexes Cartesian component pairs (ncart(la) * ncart(lb)), S indexes
    Hermite components of order la+lb. Batch dims of a/b are preserved.
    """
    ex, ey, ez = e_cubes(la, lb, a, b, AB)
    pa, pb, t, u, v, _ = cart_hermite_gather(la, lb)
    ia, ja, ka = pa
    ib, jb, kb = pb
    # gathers: (..., A, S)
    Ex = ex[..., ia[:, None], ib[:, None], t[None, :]]
    Ey = ey[..., ja[:, None], jb[:, None], u[None, :]]
    Ez = ez[..., ka[:, None], kb[:, None], v[None, :]]
    return Ex * Ey * Ez
