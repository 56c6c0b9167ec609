"""Cartesian -> real solid-harmonic (spherical) basis transforms.

The reference's molint convention (Cartesian vs spherical) is unknowable from
the snapshot (SURVEY.md §7.1 M1); this framework computes in Cartesian
Gaussians and optionally projects onto the 2l+1-dimensional harmonic subspace
(5d/7f/9g), the convention most published HF numbers use.

Construction is numerical and convention-free: the degree-l harmonic
polynomial subspace is the null space of the Laplacian acting on degree-l
monomials; an orthonormal basis w.r.t. the Gaussian-weighted inner product is
as good as canonical Y_lm for any observable (energies depend only on the
span). Columns are deterministic (SVD-based null space).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from qchem_rs_tpu.ops.angular import cart_components, double_factorial, ncart


def nsph(l: int) -> int:
    return 2 * l + 1


@lru_cache(maxsize=None)
def _gauss_metric(l: int) -> np.ndarray:
    """<mono_a | mono_b> for unit-exponent same-center Gaussians, up to a
    common positive factor: product of (a_d + b_d - 1)!! over dimensions when
    every a_d + b_d is even, else 0."""
    comps = cart_components(l)
    n = len(comps)
    M = np.zeros((n, n))
    for i, a in enumerate(comps):
        for j, b in enumerate(comps):
            if all((ad + bd) % 2 == 0 for ad, bd in zip(a, b)):
                M[i, j] = np.prod(
                    [double_factorial(ad + bd - 1) for ad, bd in zip(a, b)]
                )
    return M


@lru_cache(maxsize=None)
def cart_to_sph(l: int) -> np.ndarray:
    """(ncart(l), nsph(l)) transform from *unit-normalized* Cartesian AOs to
    orthonormal spherical AOs."""
    comps = cart_components(l)
    n = len(comps)
    if l < 2:
        return np.eye(n)
    lower = cart_components(l - 2)
    idx = {c: i for i, c in enumerate(lower)}
    L = np.zeros((len(lower), n))
    for j, (a, b, c) in enumerate(comps):
        if a >= 2:
            L[idx[(a - 2, b, c)], j] += a * (a - 1)
        if b >= 2:
            L[idx[(a, b - 2, c)], j] += b * (b - 1)
        if c >= 2:
            L[idx[(a, b, c - 2)], j] += c * (c - 1)
    # null space via SVD (deterministic)
    _, s, vt = np.linalg.svd(L)
    null = vt[np.sum(s > 1e-10) :].T  # (n, 2l+1)
    assert null.shape[1] == nsph(l), (l, null.shape)
    # orthonormalize w.r.t. the Gaussian metric
    M = _gauss_metric(l)
    G = null.T @ M @ null
    w, U = np.linalg.eigh(G)
    T = null @ (U / np.sqrt(w)[None, :]) @ U.T  # (n, 2l+1), T^T M T = I
    # re-express in terms of unit-normalized Cartesian AOs:
    # cart_ao_a = mono_a / sqrt(M_aa)  =>  coefficient picks up sqrt(M_aa)
    return T * np.sqrt(np.diag(M))[:, None]


def system_transform(system) -> np.ndarray:
    """Block-diagonal (nao_cart, nao_sph) transform for a whole system."""
    blocks = [cart_to_sph(s.l) for s in system.shells]
    nc = sum(b.shape[0] for b in blocks)
    ns = sum(b.shape[1] for b in blocks)
    T = np.zeros((nc, ns))
    i = j = 0
    for b in blocks:
        T[i : i + b.shape[0], j : j + b.shape[1]] = b
        i += b.shape[0]
        j += b.shape[1]
    return T
