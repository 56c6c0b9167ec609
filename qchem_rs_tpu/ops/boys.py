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

import jax
import jax.numpy as jnp
import numpy as np

_T_SWITCH = 35.0  # boys_series small/large switch (reference impl only)
_SERIES_TERMS = 170


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


def _series_n(mmax: int) -> int:
    """Series length for the small-T Kummer branch of boys(). The branch only
    evaluates at T <= mmax + 1.5, where term ratios 2T/(2 mmax + 2i + 3)
    start below 1 and decay; 2 mmax + 40 terms bounds the relative tail
    under ~1e-17 for every order used here (validated against the
    quadrature oracle in tests/test_boys.py)."""
    return 2 * mmax + 40


def boys(mmax: int, T: jax.Array) -> jax.Array:
    """Boys functions F_0..F_mmax at T (elementwise), shape (mmax+1,) + T.shape.

    GATHER-FREE by construction — every op is fused elementwise VPU math:

    - ``F_0(T) = 1/2 sqrt(pi/T) erf(sqrt T)`` exactly, at every T (the
      expression is cancellation-free down to T -> 0, where erf(x)/x -> 2/pi^.5).
    - m >= 1, T > mmax + 1.5: upward recursion from F_0 (error factor
      (2m+1)/(2T) < 1 per step — contracting in this range).
    - m >= 1, T <= mmax + 1.5: Kummer series at m = mmax then exact downward
      recursion (always stable).

    A previous revision interpolated a tabulated grid; the 7 per-element
    table gathers lowered catastrophically on TPU (measured 2.8 s for a 27M
    point batch — ~100% of ERI kernel runtime; this version removes them).
    """
    T = jnp.asarray(T)
    if T.dtype not in (jnp.float32, jnp.float64):
        T = T.astype(jnp.float64)
    # dtype follows the input: float64 is the accuracy path (~1e-15); a
    # float32 input runs the whole evaluation single-precision (~1e-7
    # relative) — used by the mixed-precision ERI engine for tile blocks
    # whose Schwarz bound makes single precision exact to ~1e-12 absolute.
    # NOTE the clamp must stay within the f32 EXPONENT range: TPU "f64" is
    # double-float emulation whose dynamic range is float32's (~1e+-38), so
    # pi/1e-300 would overflow to inf there (-> NaN at screened/padded T=0
    # points). 1e-30 keeps pi/Tc ~ 3e30 representable. The emulated sqrt and
    # erf both lose ~2^-29 relative at such extreme arguments (measured), so
    # a 7-term Taylor covers T < 0.01 instead:
    #   F_0(T) = sum_k (-T)^k / (k! (2k+1)),  |tail| < T^7/75600 < 2e-19.
    tiny = jnp.asarray(1e-30, T.dtype)
    Tc = jnp.maximum(T, tiny)
    F0 = 0.5 * jnp.sqrt(jnp.pi / Tc) * jax.lax.erf(jnp.sqrt(Tc))
    import math

    coef = [1.0 / (math.factorial(k) * (2 * k + 1)) for k in range(7)]
    f0_taylor = coef[6]
    for k in range(5, -1, -1):
        f0_taylor = coef[k] - T * f0_taylor
    F0 = jnp.where(T < 0.01, f0_taylor, F0)
    if mmax == 0:
        return F0[None]

    switch = mmax + 1.5
    expT = jnp.exp(-T)

    # upward branch (evaluated everywhere, selected where T > switch)
    Tbig = jnp.maximum(T, switch)
    fs_big = [F0]
    for m in range(mmax):
        fs_big.append(((2.0 * m + 1.0) * fs_big[-1] - expT) / (2.0 * Tbig))

    # series at mmax + downward recursion (selected where T <= switch)
    Tsm = jnp.minimum(T, switch)

    def series_step(i, carry):
        term, acc = carry
        term = term * (2.0 * Tsm) / (2.0 * mmax + 2.0 * i + 3.0)
        return term, acc + term

    t0 = jnp.full_like(T, 1.0 / (2.0 * mmax + 1.0))
    _, ssum = jax.lax.fori_loop(0, _series_n(mmax), series_step, (t0, t0))
    fs_small = [expT * ssum]
    for m in range(mmax, 0, -1):
        fs_small.append((2.0 * Tsm * fs_small[-1] + expT) / (2.0 * m - 1.0))
    fs_small = fs_small[::-1]  # F_0 .. F_mmax

    use_small = T <= switch
    out = [jnp.where(use_small, fs_small[0], F0)]
    for m in range(1, mmax + 1):
        out.append(jnp.where(use_small, fs_small[m], fs_big[m]))
    return jnp.stack(out, axis=0)


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
