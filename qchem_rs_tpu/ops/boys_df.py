"""Double-float Boys function: F_0..F_mmax to ~1e-13 relative in f32-pair
arithmetic (ops/dfloat.py), gather-free and erf-free.

Replaces the emulated-f64 `ops/boys.py` path inside TPU ERI kernels: the
round-2 profile (docs/PROFILE_r02.md) measured XLA's emulated-f64 `erf` at
~27% of ss-tile runtime and the Kummer series at ~2(2L+40) emulated ops.
Here every branch is a short Chebyshev/Clenshaw evaluation in hardware-f32
double-float:

- F_0: four degree-<=20 Chebyshev pieces on [0, 36] (abs err <= 1.8e-15,
  tools/gen_boys_df_coefs.py); T > 36 is the pure asymptotic
  0.5*sqrt(pi/T) (erfc(6) = 2.2e-17 relative — no erf anywhere).
- F_L, T <= switch(L): Chebyshev pieces for the SCALED S_L = F_L*exp(T)
  (all-positive Kummer sum; fitting S keeps the piece dynamic range <= ~6
  so the df Clenshaw stays ~5e-14 RELATIVE — a direct F_L fit loses
  dynamic-range x 1e-14 near the switch, measured 4e-12 at L=8), then
  F_L = S_L*exp(-T) with the exp(-T) the ladders already need; lower
  orders by stable downward recursion.
- F_L, T > switch(L): upward recursion from F_0 (switch measured as the
  smallest T where f64 upward recursion is ~noise-floor accurate for all
  orders <= L, tools/gen_boys_df_coefs.py).

The reference gets this from the Rust `boys` crate backed by GSL
(/root/reference/core/Cargo.toml:17; 14.3% of its profile, SURVEY.md §6).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops import dfloat as df
from qchem_rs_tpu.ops._boys_df_coefs import F0_CHEB, F0_EDGES, F0_TMAX, FL_CHEB

_HALF_SQRT_PI = 0.5 * math.sqrt(math.pi)


def _clenshaw(coefs, x):
    """Clenshaw evaluation of a Chebyshev series (Python-float coefficients,
    ascending) at df x in [-1, 1]. Sloppy adds: coefficient magnitudes are
    O(1) and descending, no catastrophic cancellation."""
    x2 = df.mul_pow2(x, 2.0)
    zero = jnp.zeros_like(x[0])
    b1 = (zero, zero)
    b2 = b1
    for c in coefs[:0:-1]:
        b1, b2 = df.add_(df.sub_(df.mul(x2, b1), b2), df.const(c, like=x[0])), b1
    return df.add_(df.sub_(df.mul(x, b1), b2), df.const(coefs[0], like=x[0]))


def _select_coefs(masks, tables, k):
    """k-th coefficient as a df array selected across pieces by masks."""
    c = np.float32(tables[0][k])
    cl = np.float32(np.float64(tables[0][k]) - np.float64(c))
    hi = jnp.full_like(masks[0], c, dtype=jnp.float32)
    lo = jnp.full_like(masks[0], cl, dtype=jnp.float32)
    for m, tab in zip(masks[1:], tables[1:]):
        c = np.float32(tab[k])
        cl = np.float32(np.float64(tab[k]) - np.float64(c))
        hi = jnp.where(m, c, hi)
        lo = jnp.where(m, cl, lo)
    return hi, lo


def _clenshaw_selected(masks, tables, x):
    """Clenshaw with per-element piecewise coefficients (df accuracy)."""
    x2 = df.mul_pow2(x, 2.0)
    zero = jnp.zeros_like(x[0])
    b1 = (zero, zero)
    b2 = b1
    deg = len(tables[0]) - 1
    for k in range(deg, 0, -1):
        ck = _select_coefs(masks, tables, k)
        b1, b2 = df.add_(df.add_(df.mul(x2, b1), df.neg(b2)), ck), b1
    c0 = _select_coefs(masks, tables, 0)
    return df.add_(df.sub_(df.mul(x, b1), b2), c0)


def boys_f0_df(T):
    """df Boys F_0 at df T >= 0. ~1e-13 relative everywhere."""
    width = F0_EDGES[1] - F0_EDGES[0]
    t_hi = T[0]
    # clamp into [0, TMAX] so the asymptotic region evaluates a harmless
    # in-range polynomial (selected away below)
    Tc = df.where(t_hi > F0_TMAX, df.const(F0_TMAX, like=t_hi), T)
    # piece index via arithmetic (equal-width pieces)
    idx = jnp.clip(jnp.floor(t_hi / width), 0, len(F0_CHEB) - 1)
    center = ((idx + 0.5) * width).astype(jnp.float32)  # 4.5/13.5/22.5/31.5: exact
    # the 2/width scale is NOT an f32-exact constant — apply it in df, or the
    # effective T is perturbed by ~T*2^-25 (would cost ~1e-7 absolute in F0)
    x = df.mul(df.add_f(Tc, -center), df.const(2.0 / width, like=t_hi))
    piece_masks = [idx == i for i in range(len(F0_CHEB))]
    poly = _clenshaw_selected(piece_masks, F0_CHEB, x)
    # asymptotic branch: 0.5 sqrt(pi) * rsqrt(T)
    Tbig = df.where(t_hi > F0_TMAX, T, df.const(F0_TMAX, like=t_hi))
    asym = df.mul(df.rsqrt(Tbig), df.const(_HALF_SQRT_PI, like=t_hi))
    return df.where(t_hi > F0_TMAX, asym, poly)


def boys_df(mmax: int, T):
    """df Boys functions F_0..F_mmax at df T >= 0.

    Returns a list of mmax+1 df pairs (each with T's shape). Branchless:
    both the downward (Chebyshev at mmax) and upward (asymptotic F_0)
    ladders are evaluated with clamped arguments and combined by select,
    exactly like the emulated-f64 ops/boys.py.
    """
    F0 = boys_f0_df(T)
    if mmax == 0:
        return [F0]

    t_hi = T[0]
    switch, edges, coef_tables = FL_CHEB[mmax]
    E = df.exp_neg(T)

    # downward branch: S_mmax on [0, switch] by (piecewise) Chebyshev,
    # F_mmax = S*exp(-T), then recurse down
    Tdn = df.where(t_hi > switch, df.const(switch, like=t_hi), T)
    if len(coef_tables) == 1:
        x = df.add_f(
            df.mul(Tdn, df.const(2.0 / switch, like=t_hi)), np.float32(-1.0)
        )
        S = _clenshaw(coef_tables[0], x)
    else:
        # piece index by comparing against interior edges (pieces are
        # adaptive-width); map T into each piece's [-1, 1] via selected
        # (lo, 2/width) constants — all selects, no gathers
        idx = jnp.zeros_like(t_hi, dtype=jnp.int32)
        for e in edges[1:-1]:
            idx = idx + (Tdn[0] > np.float32(e)).astype(jnp.int32)
        masks = [idx == i for i in range(len(coef_tables))]
        lo = jnp.zeros_like(t_hi)
        iw_hi = jnp.zeros_like(t_hi)
        iw_lo = jnp.zeros_like(t_hi)
        for i, (a, b) in enumerate(zip(edges[:-1], edges[1:])):
            lo = jnp.where(masks[i], np.float32(a), lo)
            w64 = np.float64(2.0) / (np.float64(b) - np.float64(a))
            wh = np.float32(w64)
            iw_hi = jnp.where(masks[i], wh, iw_hi)
            iw_lo = jnp.where(masks[i], np.float32(w64 - np.float64(wh)), iw_lo)
        # x = (Tdn - lo)*(2/width) - 1, the scale as a full df constant
        x = df.add_f(
            df.mul(df.add_f(Tdn, -lo), (iw_hi, iw_lo)), np.float32(-1.0)
        )
        S = _clenshaw_selected(masks, coef_tables, x)
    fs_dn = [df.mul(S, E)]
    T2dn = df.mul_pow2(Tdn, 2.0)
    for m in range(mmax, 0, -1):
        num = df.add_(df.mul(T2dn, fs_dn[-1]), E)
        fs_dn.append(df.mul(num, df.const(1.0 / (2 * m - 1), like=t_hi)))
    fs_dn = fs_dn[::-1]  # F_0..F_mmax (downward-branch values)

    # upward branch: from F0 with clamped T (stable for T > switch)
    Tup = df.where(t_hi > switch, T, df.const(switch, like=t_hi))
    inv2T = df.inv(df.mul_pow2(Tup, 2.0))
    fs_up = [F0]
    for m in range(mmax):
        fs_up.append(df.mul(df.add_(df.mul_f(fs_up[-1], np.float32(2 * m + 1)), df.neg(E)), inv2T))

    use_dn = t_hi <= switch
    out = [df.where(use_dn, fs_dn[0], F0)]
    for m in range(1, mmax + 1):
        out.append(df.where(use_dn, fs_dn[m], fs_up[m]))
    return out
