"""Vectorized Boys function F_m(T), float64, jit/vmap/Pallas-friendly.

The reference gets this from the Rust ``boys`` crate backed by GSL
(/root/reference/core/Cargo.toml:17; libgsl accounts for 14.3% of the
reference's runtime profile, see SURVEY.md §6). Here it is pure elementwise
jnp math so XLA fuses it straight into the integral kernels:

- small T  : Kummer series evaluated at m = mmax, then stable downward
             recursion F_{m-1} = (2T F_m + e^-T) / (2m - 1).
- large T  : F_0 = 1/2 sqrt(pi/T) erf(sqrt T), then upward recursion
             F_{m+1} = ((2m+1) F_m - e^-T) / (2T) (stable for T > m + 1/2).

Accuracy target ~1e-15 relative (validated against scipy.special.hyp1f1 in
tests/test_boys.py). Max order needed: 4*l_max = 16 for (gg|gg) ERI classes.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_T_SWITCH = 35.0
_SERIES_TERMS = 170
_DT = 0.05  # Taylor table spacing
_NTAYLOR = 7  # Taylor order; err ~ (dT/2)^7/7! ~ 1e-15


def boys_series(mmax: int, T: jax.Array) -> jax.Array:
    """Reference implementation: Kummer series + downward recursion (small T)
    / asymptotic + upward recursion (large T). O(_SERIES_TERMS) sequential
    ops — used to build the Taylor table and for validation."""
    T = jnp.asarray(T, dtype=jnp.float64)
    Tsafe_small = jnp.minimum(T, _T_SWITCH)  # keep series args bounded
    Tsafe_big = jnp.maximum(T, _T_SWITCH)  # keep 1/T, sqrt well-behaved
    expT = jnp.exp(-T)

    # series at m = mmax: t_0 = 1/(2m+1); t_{i+1} = t_i 2T/(2m+2i+3)
    def series_step(i, carry):
        term, acc = carry
        term = term * (2.0 * Tsafe_small) / (2.0 * mmax + 2.0 * i + 3.0)
        return term, acc + term

    t0 = jnp.full_like(T, 1.0 / (2.0 * mmax + 1.0))
    _, ssum = jax.lax.fori_loop(0, _SERIES_TERMS, series_step, (t0, t0))
    f_mmax_small = expT * ssum

    fs_small = [f_mmax_small]
    for m in range(mmax, 0, -1):
        fs_small.append((2.0 * Tsafe_small * fs_small[-1] + expT) / (2.0 * m - 1.0))
    fs_small = fs_small[::-1]  # F_0 .. F_mmax

    f0_big = 0.5 * jnp.sqrt(jnp.pi / Tsafe_big) * jax.lax.erf(jnp.sqrt(Tsafe_big))
    fs_big = [f0_big]
    for m in range(mmax):
        fs_big.append(((2.0 * m + 1.0) * fs_big[-1] - expT) / (2.0 * Tsafe_big))

    use_small = T < _T_SWITCH
    return jnp.stack(
        [jnp.where(use_small, s, b) for s, b in zip(fs_small, fs_big)], axis=0
    )


@lru_cache(maxsize=None)
def _taylor_table(mrows: int) -> np.ndarray:
    """F_m(T_i) on the grid T_i = i * _DT, i = 0.._T_SWITCH/_DT, for
    m = 0..mrows-1 — built once on host with the numpy series."""
    grid = np.arange(int(round(_T_SWITCH / _DT)) + 1) * _DT
    mtop = mrows - 1
    # series at mtop (float64 host), then downward recursion
    term = np.full_like(grid, 1.0 / (2 * mtop + 1))
    acc = term.copy()
    for i in range(300):
        term = term * (2.0 * grid) / (2.0 * mtop + 2.0 * i + 3.0)
        acc += term
    out = np.empty((mrows, grid.size))
    e = np.exp(-grid)
    out[mtop] = e * acc
    for m in range(mtop, 0, -1):
        out[m - 1] = (2.0 * grid * out[m] + e) / (2.0 * m - 1.0)
    return out


def boys(mmax: int, T: jax.Array) -> jax.Array:
    """Boys functions F_0..F_mmax at T (elementwise), shape (mmax+1,) + T.shape.

    Fast path: tabulated Taylor expansion with spacing _DT and _NTAYLOR terms
    (F'_m = -F_{m+1}, so the derivatives come from higher-m table rows):
        F_m(T) = sum_k F_{m+k}(T_i) (T_i - T)^k / k!
    ~10 fused ops instead of the ~400-op series loop — this was the dominant
    runtime cost of the ERI kernels (like GSL was 14.3% of the reference's
    profile, SURVEY.md §6). Large T uses the asymptotic + upward recursion.
    """
    T = jnp.asarray(T, dtype=jnp.float64)
    table = _taylor_table(mmax + _NTAYLOR)
    Tsmall = jnp.minimum(T, _T_SWITCH)
    i = jnp.clip(jnp.round(Tsmall / _DT).astype(jnp.int32), 0, table.shape[1] - 1)
    d = i * _DT - Tsmall  # (T_i - T)
    expT = jnp.exp(-T)
    # one 1D gather per table row: g[j] = F_j(T_i). (A single 2D gather
    # materializes with the small row axis minormost, which tile-pads to 128
    # on TPU — measured 12.8 GB for a 1.5 GB logical tensor.) Only the 7
    # rows for m = mmax are gathered; lower orders come from the stable
    # downward recursion F_{m-1} = (2T F_m + e^-T)/(2m-1), which is cheaper
    # than 7-term Taylor per order.
    g = [jnp.asarray(table[mmax + j])[i] for j in range(_NTAYLOR)]
    # Horner in d: F_mmax = g[0] + d (g[1] + d/2 (g[2] + d/3 (...)))
    acc = g[_NTAYLOR - 1]
    for k in range(_NTAYLOR - 1, 0, -1):
        acc = g[k - 1] + d * acc / k
    fs_small = [acc]
    for m in range(mmax, 0, -1):
        fs_small.append((2.0 * Tsmall * fs_small[-1] + expT) / (2.0 * m - 1.0))
    fs_small = fs_small[::-1]  # F_0 .. F_mmax
    Tbig = jnp.maximum(T, _T_SWITCH)
    f0_big = 0.5 * jnp.sqrt(jnp.pi / Tbig)  # erf(sqrt(T)) == 1 to 7e-17 here
    fs_big = [f0_big]
    for m in range(mmax):
        fs_big.append(((2.0 * m + 1.0) * fs_big[-1] - expT) / (2.0 * Tbig))

    use_small = T < _T_SWITCH
    return jnp.stack(
        [jnp.where(use_small, s, b) for s, b in zip(fs_small, fs_big)], axis=0
    )


def boys_ref(mmax: int, T):
    """Slow quadrature-based oracle: F_m(T) = int_0^1 t^{2m} e^{-T t^2} dt.

    Test-only; fully independent of the jnp implementation above. (scipy's
    hyp1f1 was tried first but is itself only ~1e-12 accurate for strongly
    negative arguments, worse than the implementation under test.)
    """
    import numpy as np
    from scipy import integrate

    T = np.atleast_1d(np.asarray(T, dtype=np.float64))
    out = np.empty((mmax + 1, T.size))
    for j, t in enumerate(T):
        # quadrature at the highest order, exact downward recursion below
        f = integrate.quad(
            lambda x: x ** (2 * mmax) * np.exp(-t * x * x),
            0.0,
            1.0,
            epsabs=1e-300,
            epsrel=1e-13,
        )[0]
        out[mmax, j] = f
        e = np.exp(-t)
        for m in range(mmax, 0, -1):
            f = (2.0 * t * f + e) / (2.0 * m - 1.0)
            out[m - 1, j] = f
    return out.reshape((mmax + 1,) + np.shape(T))
