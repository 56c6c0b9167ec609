"""DIIS ring-buffer semantics vs the reference Diis (diis.rs:19-59)."""

import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.models.diis import diis_apply, diis_init


def _push(state, e, f, min_len):
    return diis_apply(state, jnp.asarray(e), jnp.asarray(f), min_len)


def test_passthrough_below_min_length():
    n = 3
    st = diis_init(6, n)
    e1 = np.eye(n)
    f1 = np.full((n, n), 2.0)
    out, st = _push(st, e1, f1, 4)
    # window of 1 < min_len 4: newest fock returned unchanged (diis.rs:33-38)
    np.testing.assert_allclose(np.asarray(out), f1)


def test_exact_cancellation_pair():
    n = 2
    st = diis_init(6, n)
    e = np.array([[1.0, 0.0], [0.0, -1.0]])
    f1 = np.diag([1.0, 3.0])
    f2 = np.diag([5.0, 7.0])
    _, st = _push(st, e, f1, 2)
    out, st = _push(st, -e, f2, 2)
    # c = (1/2, 1/2) kills the error exactly -> mean Fock
    np.testing.assert_allclose(np.asarray(out), 0.5 * (f1 + f2), atol=1e-10)


def test_window_truncation_drops_oldest():
    n = 2
    st = diis_init(2, n)  # max_len = 2
    e_big = 1e6 * np.eye(n)
    f_big = 1e6 * np.ones((n, n))
    e = np.array([[1.0, 0.0], [0.0, -1.0]])
    f2, f3 = np.diag([1.0, 1.0]), np.diag([3.0, 3.0])
    _, st = _push(st, e_big, f_big, 1)
    _, st = _push(st, e, f2, 1)
    out, st = _push(st, -e, f3, 1)
    # window holds only the last two samples; result combines f2, f3 only
    np.testing.assert_allclose(np.asarray(out), 0.5 * (f2 + f3), atol=1e-8)


def test_coefficients_sum_to_one():
    # random errors: the bordered system enforces sum(c) = 1, so feeding
    # identical Focks must return that Fock
    rng = np.random.default_rng(0)
    n = 4
    st = diis_init(5, n)
    f = rng.standard_normal((n, n))
    out = None
    for _ in range(5):
        out, st = _push(st, rng.standard_normal((n, n)), f, 2)
    np.testing.assert_allclose(np.asarray(out), f, atol=1e-9)
