"""Double-float (hi, lo)-f32 arithmetic and df Boys function tests.

The df layer (ops/dfloat.py) replaces the f64 arithmetic the reference gets
for free on CPU (/root/reference/core/src/hf/rhf.rs — nalgebra f64) with
hardware-f32 pair arithmetic for TPU kernels. Accuracy bar: ~2^-45 relative
for the primitives, ~2e-13 relative for the Boys ladder through m=16.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qchem_rs_tpu.ops import dfloat as df
from qchem_rs_tpu.ops.boys import boys
from qchem_rs_tpu.ops.boys_df import boys_df


def _rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-300))


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(42)
    return rng.uniform(0.1, 10.0, 4096), rng.uniform(0.1, 10.0, 4096)


def test_df_roundtrip():
    x = np.array([1.0, np.pi, 1e-20, 1e20, 2.0 / 3.0])
    hi, lo = df.from_f64(x)
    back = np.asarray(df.to_f64((jnp.asarray(hi), jnp.asarray(lo))))
    assert _rel(back, x) < 5e-15  # 48-bit split round-trips f64 to ~2^-48


@pytest.mark.parametrize(
    "op,ref",
    [
        ("add", lambda a, b: a + b),
        ("sub", lambda a, b: a - b),
        ("mul", lambda a, b: a * b),
        ("div", lambda a, b: a / b),
    ],
)
def test_df_binary_ops(samples, op, ref):
    a64, b64 = samples
    a = df.df(*df.from_f64(a64))
    b = df.df(*df.from_f64(b64))
    out = np.asarray(df.to_f64(getattr(df, op)(a, b)))
    want = ref(a64, b64)
    # error measured against the INPUT scale: the 2^-48 representation
    # error of the operands is inherent, and a-b amplifies it under
    # cancellation no matter how exact the subtraction is
    scale = np.maximum(np.abs(a64), np.abs(b64))
    if op == "div":
        scale = np.abs(want)
    assert np.max(np.abs(out - want) / scale) < 1e-13


def test_df_sqrt_rsqrt(samples):
    a64, _ = samples
    a = df.df(*df.from_f64(a64))
    assert _rel(np.asarray(df.to_f64(df.sqrt(a))), np.sqrt(a64)) < 1e-13
    assert _rel(np.asarray(df.to_f64(df.rsqrt(a))), 1.0 / np.sqrt(a64)) < 1e-13


def test_df_exp_neg():
    t64 = np.concatenate(
        [np.linspace(0.0, 30.0, 3000), 10.0 ** np.linspace(-8, 1.4, 1000)]
    )
    t = df.df(*df.from_f64(t64))
    out = np.asarray(df.to_f64(df.exp_neg(t)))
    assert _rel(out, np.exp(-t64)) < 2e-13


def test_df_exp_neg_underflow_is_zero():
    out = df.to_f64(df.exp_neg(df.df(np.float32(200.0))))
    assert float(out) == 0.0


@pytest.mark.parametrize("mmax", [0, 1, 2, 4, 6, 8, 12, 16])
def test_boys_df_vs_f64(mmax):
    """df Boys matches the f64 Boys (itself quadrature-validated in
    test_boys.py) to ~2e-13 relative for every order and T regime."""
    rng = np.random.default_rng(7)
    T64 = np.concatenate(
        [
            rng.uniform(0, 1, 1000),
            rng.uniform(1, 40, 2000),
            rng.uniform(40, 200, 1000),
            10.0 ** rng.uniform(-8, 0, 1000),
            np.array([0.0, 1e-12, 36.0, 36.0000001]),  # branch edges
        ]
    )
    ref = np.asarray(boys(mmax, jnp.asarray(T64)))
    out = boys_df(mmax, df.df(*df.from_f64(T64)))
    vals = np.stack([np.asarray(df.to_f64(o)) for o in out])
    assert _rel(vals, ref) < 2.5e-13
