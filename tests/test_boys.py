"""Boys function vs independent scipy hyp1f1 oracle."""

import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.boys import boys, boys_ref


def test_boys_matches_hyp1f1_small_and_large():
    T = np.concatenate(
        [
            np.array([0.0, 1e-14, 1e-8, 1e-3]),
            np.linspace(0.01, 34.9, 200),
            np.linspace(35.0, 300.0, 100),
            np.array([1e3, 1e4]),
        ]
    )
    got = np.asarray(boys(16, jnp.asarray(T)))
    want = boys_ref(16, T)
    # relative error against scale of F_m (F decays like T^-(m+1/2))
    err = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert err.max() < 5e-14, f"max rel err {err.max():.3e}"


def test_boys_zero_limit():
    got = np.asarray(boys(8, jnp.asarray(0.0)))
    want = 1.0 / (2.0 * np.arange(9) + 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-15)


def test_boys_downward_consistency():
    # recurrence identity: F_{m-1} = (2T F_m + e^-T) / (2m-1)
    T = np.linspace(0.1, 100.0, 50)
    F = np.asarray(boys(10, jnp.asarray(T)))
    for m in range(10, 0, -1):
        lhs = F[m - 1]
        rhs = (2 * T * F[m] + np.exp(-T)) / (2 * m - 1)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
