"""Double-float (hi, lo) f32-pair arithmetic for TPU kernels.

The TPU has no hardware f64: XLA emulates it (measured on this backend:
~20 G op/s elementwise vs multi-T op/s hardware f32 — docs/PROFILE_r02.md).
Hartree-Fock integrals need ~1e-12 relative accuracy, which a pair of f32s
(~2^-45..2^-48 effective mantissa) provides at hardware-f32 VPU rate. This
module implements classic error-free-transformation ("double-double", here
double-single) arithmetic — Dekker/Knuth two_sum/two_prod with Dekker
splitting (no FMA exposed on the VPU) — as plain jnp elementwise functions,
so the SAME code runs inside Pallas kernels and in fused XLA element chains.

A df number is a tuple (hi, lo) of same-shape f32 arrays with hi = fl(hi+lo)
and |lo| <= ulp(hi)/2. All functions are shape-polymorphic and jit/vmap/
Pallas-safe (no data-dependent control flow; branches via jnp.where).

Range note: f32 exponent range only (~1e+-38). The Dekker split multiplies
by 2^12+1, so inputs must stay below ~2^115 ~ 4e34 in magnitude — all
quantities in the ERI chain are well inside after the usual clamps
(ops/boys.py range notes). Subnormal underflow degrades lo silently, which
is acceptable: it only occurs for values < ~1e-32 that are chemically zero.

Replaces the f64 arithmetic the reference gets for free on CPU
(/root/reference/core/src/hf/rhf.rs — nalgebra f64 throughout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dekker split constant for f32 (24-bit mantissa -> 12+12): 2^12 + 1.
_SPLIT = 4097.0


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly. 6 flops."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|. 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a = hi + lo with 12-bit mantissas each. 4 flops."""
    t = a * _SPLIT
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (no FMA). 17 flops."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# df = (hi, lo) operations
# ---------------------------------------------------------------------------


def df(hi, lo=None):
    """Make a df number from f32 array(s)."""
    hi = jnp.asarray(hi, jnp.float32)
    return (hi, jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32))


def from_f64(x):
    """Split an f64 array into a df pair (host/XLA side, done once per input)."""
    import numpy as np

    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def to_f64(x):
    """Recombine a df pair into f64 (output conversion)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def split_f64(x):
    """Split an f64 jnp array into a df pair — traceable (conformer sweeps
    pass traced geometry through this), unlike the numpy from_f64."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def const(v, like=None):
    """df constant from a Python float (exact split)."""
    import numpy as np

    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    if like is None:
        return (jnp.float32(hi), jnp.float32(lo))
    return (jnp.full_like(like, hi), jnp.full_like(like, lo))


def add(x, y):
    """df + df, fully accurate (IEEE-style). ~20 flops."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    return quick_two_sum(s, e)


def add_(x, y):
    """df + df, sloppy (error ~3 ulp; 11 flops). Fine inside sums of
    same-sign terms (Boys series, MAC chains)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return quick_two_sum(s, e)


def add_f(x, f):
    """df + f32. 10 flops."""
    s, e = two_sum(x[0], f)
    e = e + x[1]
    return quick_two_sum(s, e)


def neg(x):
    return (-x[0], -x[1])


def sub(x, y):
    return add(x, neg(y))


def sub_(x, y):
    return add_(x, neg(y))


def mul(x, y):
    """df * df. ~26 flops."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def mul_f(x, f):
    """df * f32 (exact in the f-factor). ~21 flops."""
    p, e = two_prod(x[0], f)
    e = e + x[1] * f
    return quick_two_sum(p, e)


def mul_pow2(x, f):
    """df * (power of two): exact, 2 flops."""
    return (x[0] * f, x[1] * f)


def madd(acc, x, y):
    """acc + x*y in df (the MAC of df dot products). ~37 flops."""
    return add_(acc, mul(x, y))


def sqr(x):
    """df squared (saves 4 flops vs mul)."""
    p, e = two_prod(x[0], x[0])
    e = e + 2.0 * (x[0] * x[1])
    return quick_two_sum(p, e)


def inv(y):
    """1 / df via Newton: r' = r*(2 - y*r) in df, TWO steps. ~110 flops.

    Two steps because the TPU f32 divide seed is only ~12-bit accurate
    (measured: one-step inv landed at 2^-24 on device = seed error squared),
    unlike CPU f32 divide which is correctly rounded."""
    r = (1.0 / y[0], jnp.zeros_like(y[0]))
    two = const(2.0, like=y[0])
    for _ in range(2):
        e = sub_(two, mul(y, r))
        r = mul(r, e)
    return r


def div(x, y):
    return mul(x, inv(y))


def sqrt(y):
    """sqrt(df) = y * rsqrt(y); y >= 0. ~130 flops.

    Rides rsqrt's TWO Newton refinements: the TPU f32 rsqrt seed is only
    ~12-bit accurate (see inv/rsqrt), so a single step leaves ~2^-23
    relative error — far off the module's ~2^-45 contract, and invisible
    in CPU tests where the seed is correctly rounded."""
    return mul(y, rsqrt(y))


def rsqrt(y):
    """1/sqrt(df), two Newton refinements of the f32 seed. ~110 flops."""
    r0 = jax.lax.rsqrt(jnp.maximum(y[0], jnp.float32(1e-38)))
    r = (r0, jnp.zeros_like(r0))
    for _ in range(2):
        yr2 = mul(y, sqr(r))
        corr = mul_pow2(sub_(const(1.0, like=y[0])[0:2], yr2), 0.5)
        r = add_(r, mul(corr, r))
    return r


def poly(coeffs, x):
    """Horner evaluation with df coefficients (list of (hi, lo) Python-float
    pairs from np.float64 splits) at df x. len-1 muls + adds."""
    acc = const(coeffs[0], like=x[0])
    for c in coeffs[1:]:
        acc = add(mul(acc, x), const(c, like=x[0]))
    return acc


def where(cond, x, y):
    return (jnp.where(cond, x[0], y[0]), jnp.where(cond, x[1], y[1]))


# ---------------------------------------------------------------------------
# exp(-t) for t >= 0 (the Gaussian-product / Boys workhorse)
# ---------------------------------------------------------------------------

_LN2 = 0.6931471805599453
_EXP_COEF = [  # Taylor 1/k! k=11..0; |r| <= ln2/2 -> tail ~7e-15 at deg 11
    2.505210838544172e-08,
    2.755731922398589e-07,
    2.755731922398589e-06,
    2.48015873015873e-05,
    0.0001984126984126984,
    0.001388888888888889,
    0.008333333333333333,
    0.041666666666666664,
    0.16666666666666666,
    0.5,
    1.0,
    1.0,
]


def exp_neg(t):
    """exp(-t) for df t >= 0, ~2^-46 relative. ~450 flops.

    Range reduction: t = k ln2 + r, |r| <= ln2/2; exp(-t) = 2^-k exp(-r).
    k <= 127 covers t <= 88; beyond that exp(-t) < 1e-38 -> 0 (f32
    underflow — chemically nothing: every term carrying exp(-T) also decays).
    """
    k = jnp.round(t[0] * jnp.float32(1.4426950408889634))
    # r = t - k*ln2 in df (ln2 split exactly)
    r = add_(t, neg(mul_f(const(_LN2, like=t[0]), k)))
    p = poly(_EXP_COEF, neg(r))
    # scale by 2^-k EXACTLY: build the power of two by writing the f32
    # exponent field directly (jnp.exp2 is a polynomial approximation with
    # ~1e-6 worst-case relative error at integer arguments — measured)
    kc = jnp.clip(k, -125.0, 126.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((127 - kc) << 23, jnp.float32)
    out = mul_pow2(p, scale)
    zero = jnp.zeros_like(t[0])
    return where(t[0] > 85.0, (zero, zero), out)
