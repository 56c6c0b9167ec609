"""CPU-checkable plan logic of the Pallas ERI kernel (ops/eri_pallas.py).

The Mosaic kernel itself needs a TPU (tests/test_eri_pallas.py), but its
trace-time planning — the register-unrolled R recursion, the VMEM brick
sizing, the (s1, s2) emission plan, and the XLA-side H-table reorder
fallback — is pure Python/XLA and must break CPU CI when an index, sign,
or layout regresses."""

import numpy as np
import pytest

import jax.numpy as jnp

from qchem_rs_tpu.ops import dfloat as dfl
from qchem_rs_tpu.ops.eri import _r2_gather
from qchem_rs_tpu.ops.eri_pallas import (
    _VMEM_OUT_BUDGET,
    _pick_bt1,
    _r2m_emission,
    _r_recursion_unrolled,
    _reorder_htab,
)
from qchem_rs_tpu.ops.mcmurchie import hermite_components, nhermite, r_table


@pytest.mark.parametrize("L", [0, 1, 2, 3, 4, 6])
def test_r_recursion_unrolled_matches_r_table(L):
    """The kernel's statically-indexed register recursion must reproduce the
    vectorized XLA R table (same Boys-fold, same component order)."""
    rng = np.random.default_rng(3 + L)
    BT1, T2 = 4, 8
    p = rng.uniform(0.2, 6.0, (BT1, T2))
    PQ = rng.standard_normal((BT1, T2, 3)) * 1.3
    ref = np.asarray(r_table(L, jnp.asarray(p), jnp.asarray(PQ)))  # (BT1,T2,H)
    pdf = dfl.split_f64(jnp.asarray(p))
    PQdf = [dfl.split_f64(jnp.asarray(PQ[..., d])) for d in range(3)]
    R = _r_recursion_unrolled(L, pdf, PQdf)
    assert len(R) == len(hermite_components(L))
    got = np.stack([np.asarray(h, np.float64) + np.asarray(l, np.float64)
                    for (h, l) in R], axis=-1)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-12


@pytest.mark.parametrize("T1", [8, 16, 64, 128, 120, 7, 12])
@pytest.mark.parametrize("row_bytes", [256, 4096, 10 * 1024 * 1024])
def test_pick_bt1_invariants(T1, row_bytes):
    BT1 = _pick_bt1(T1, row_bytes)
    if T1 % 8:
        assert BT1 == T1  # non-8-divisible grids run in one brick
        return
    assert BT1 % 8 == 0 and T1 % BT1 == 0 and 8 <= BT1 <= T1
    # the double-buffered block either fits the budget or is the 8-row floor
    assert BT1 == 8 or BT1 * row_bytes <= _VMEM_OUT_BUDGET
    # maximality: the next larger divisor would bust the budget
    bigger = [b for b in range(BT1 + 8, T1 + 1, 8) if T1 % b == 0]
    if bigger:
        assert bigger[0] * row_bytes > _VMEM_OUT_BUDGET


@pytest.mark.parametrize("Lb,Lk", [(0, 0), (1, 1), (2, 1), (2, 2), (3, 3)])
def test_r2m_emission_plan(Lb, Lk):
    """out[s1, s2] must be sign[s2] * vals[idx[s1, s2]], with each negation
    materialized at most once (a register, not a per-slot recompute)."""
    idx, sign = _r2_gather(Lb, Lk)
    S1, S2 = idx.shape
    H = nhermite(Lb + Lk)
    vals = [float(v) for v in np.random.default_rng(0).standard_normal(H)]
    neg_calls: list[float] = []

    def neg(v):
        neg_calls.append(v)
        return -v

    out = _r2m_emission(vals, idx, sign, neg)
    assert set(out) == {(s1, s2) for s1 in range(S1) for s2 in range(S2)}
    for (s1, s2), v in out.items():
        assert v == pytest.approx(float(sign[s2]) * vals[int(idx[s1, s2])])
    assert len(neg_calls) == len(set(neg_calls))  # negation cache works


@pytest.mark.parametrize("Lb,Lk", [(1, 1), (2, 2), (3, 2)])
def test_reorder_htab_matches_loop(Lb, Lk):
    """The gather-based fallback reorder must equal the elementwise spec
    out[ai*S1+s1, cj*S2+s2] = sign[s2] * htab[idx[s1, s2], ai, cj]."""
    idx, sign = _r2_gather(Lb, Lk)
    S1, S2 = idx.shape
    H = nhermite(Lb + Lk)
    a, c, T1, T2 = 2, 3, 4, 8
    rng = np.random.default_rng(11)
    hi = rng.standard_normal((H, a, c, T1, T2)).astype(np.float32)
    lo = rng.standard_normal((H, a, c, T1, T2)).astype(np.float32) * 1e-7
    got_hi, got_lo = _reorder_htab(jnp.asarray(hi), jnp.asarray(lo), Lb, Lk, a, c)
    exp_hi = np.empty((a * S1, c * S2, T1, T2), np.float32)
    exp_lo = np.empty_like(exp_hi)
    for ai in range(a):
        for cj in range(c):
            for s1 in range(S1):
                for s2 in range(S2):
                    h = int(idx[s1, s2])
                    s = np.float32(sign[s2])
                    exp_hi[ai * S1 + s1, cj * S2 + s2] = hi[h, ai, cj] * s
                    exp_lo[ai * S1 + s1, cj * S2 + s2] = lo[h, ai, cj] * s
    np.testing.assert_array_equal(np.asarray(got_hi), exp_hi)
    np.testing.assert_array_equal(np.asarray(got_lo), exp_lo)
