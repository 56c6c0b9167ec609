"""C++ screening runtime vs the numpy fallback."""

import numpy as np

from qchem_rs_tpu.utils.native import get_lib, screened_quartets_native


def _numpy_reference(i1, j1, i2, j2, q1, q2, same, tau):
    if same:
        br, kt = np.triu_indices(len(q1))
    else:
        br, kt = np.meshgrid(np.arange(len(q1)), np.arange(len(q2)), indexing="ij")
        br, kt = br.ravel(), kt.ravel()
    if tau > 0:
        keep = q1[br] * q2[kt] > tau
        br, kt = br[keep], kt[keep]
    w = np.ones(len(br))
    w /= 1.0 + (i1[br] == j1[br])
    w /= 1.0 + (i2[kt] == j2[kt])
    if same:
        w /= 1.0 + (br == kt)
    return br, kt, w


def test_native_lib_builds():
    assert get_lib() is not None, "g++ is in the image; the native lib must build"


def test_native_matches_numpy():
    rng = np.random.default_rng(3)
    n1, n2 = 37, 29
    i1 = rng.integers(0, 10, n1)
    j1 = rng.integers(0, 10, n1)
    i2 = rng.integers(0, 10, n2)
    j2 = rng.integers(0, 10, n2)
    q1 = 10.0 ** rng.uniform(-9, 0, n1)
    q2 = 10.0 ** rng.uniform(-9, 0, n2)
    for same in (False, True):
        a1, b1_, w1 = (i1, j1, q1) if True else None
        n2_ = n1 if same else n2
        ii2 = i1 if same else i2
        jj2 = j1 if same else j2
        qq2 = q1 if same else q2
        for tau in (0.0, 1e-6, 1e-3):
            got = screened_quartets_native(i1, j1, ii2, jj2, q1, qq2, same, tau)
            assert got is not None
            want = _numpy_reference(i1, j1, ii2, jj2, q1, qq2, same, tau)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
            np.testing.assert_allclose(got[2], want[2])
