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

_T_SWITCH = 35.0
_SERIES_TERMS = 130


def boys(mmax: int, T: jax.Array) -> jax.Array:
    """Boys functions F_0..F_mmax at T (elementwise).

    Returns an array of shape ``(mmax + 1,) + T.shape``.
    """
    T = jnp.asarray(T, dtype=jnp.float64)
    Tsafe_small = jnp.minimum(T, _T_SWITCH)  # keep series args bounded
    Tsafe_big = jnp.maximum(T, _T_SWITCH)  # keep 1/T, sqrt well-behaved
    expT = jnp.exp(-T)

    # --- series at m = mmax (valid small T) ------------------------------
    # t_0 = 1/(2m+1); t_{i+1} = t_i * 2T / (2m + 2i + 3); F_m = e^-T sum t_i
    def series_step(i, carry):
        term, acc = carry
        term = term * (2.0 * Tsafe_small) / (2.0 * mmax + 2.0 * i + 3.0)
        return term, acc + term

    t0 = jnp.full_like(T, 1.0 / (2.0 * mmax + 1.0))
    _, ssum = jax.lax.fori_loop(0, _SERIES_TERMS, series_step, (t0, t0))
    f_mmax_small = expT * ssum

    # downward recursion from mmax
    fs_small = [f_mmax_small]
    for m in range(mmax, 0, -1):
        fs_small.append((2.0 * Tsafe_small * fs_small[-1] + expT) / (2.0 * m - 1.0))
    fs_small = fs_small[::-1]  # F_0 .. F_mmax

    # --- asymptotic at F_0 (valid large T), upward recursion -------------
    f0_big = 0.5 * jnp.sqrt(jnp.pi / Tsafe_big) * jax.lax.erf(jnp.sqrt(Tsafe_big))
    fs_big = [f0_big]
    for m in range(mmax):
        fs_big.append(((2.0 * m + 1.0) * fs_big[-1] - expT) / (2.0 * Tsafe_big))

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
