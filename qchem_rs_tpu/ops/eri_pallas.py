"""Pallas TPU kernel for the double-float ERI tile chain.

This is the hand-written-kernel form of ``eri_tiled._tile_vals_df``: the
whole per-tile elementwise integral chain — Gaussian pair geometry, the
double-float Boys function, the Hermite Coulomb R-table recursion, the
2 pi^{5/2} prefactor AND the R2m (s1, s2) reordering with ket parity signs
— runs inside ONE ``pl.pallas_call`` in (hi, lo)-f32 pair arithmetic
(ops/dfloat.py) on the VPU. Only the two Hermite->Cartesian contractions
stay in XLA f64 (Mosaic has no f64; the contraction is the measured minor
cost — docs/PROFILE_r02.md).

Why a kernel instead of the fused-XLA df chain (measured, round 3):
- XLA's TPU compile of the df graph costs 15-370 s PER class-pair program
  (a water/cc-pVDZ V2 build did not finish compiling in 48 min); Mosaic
  compiles the same arithmetic as straight-line VPU code in ~10 s.
- The kernel keeps the (H, brick) R table in VMEM registers and emits the
  contraction-ready R2m layout directly — the XLA form round-trips every
  (H, a, c, T1, T2) intermediate through HBM and pays an extra full-size
  gather pass for the (s1, s2) reordering.
- All static plans (mcmurchie._r_plan, eri._r2_gather) unroll to register
  moves — zero in-kernel gathers (the round-2 Boys lesson).

Replaces the f64 arithmetic + GSL Boys the reference gets on CPU
(/root/reference/core/src/hf/rhf.rs via molint; SURVEY.md §2.1).

Grid/layout (per class pair, per tile):
  grid = (T1 // BT1, a): each instance owns a (BT1, T2) brick of the pair
  grid for ONE bra primitive-pair index ia, loops ket primitive pairs c
  and the Hermite axes unrolled in registers. T2 <= 128 lanes, BT1
  sublanes sized to a VMEM budget. Output is R2m as (hi, lo) f32 pairs of
  shape (a*S1, c*S2, T1, T2), ready for the two MXU contractions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qchem_rs_tpu.ops import dfloat as dfl
from qchem_rs_tpu.ops.boys_df import boys_df
from qchem_rs_tpu.ops.eri import _r2_gather
from qchem_rs_tpu.ops.mcmurchie import _r_plan, hermite_components, nhermite

__all__ = ["tile_vals_pallas", "r2m_tiles_pallas"]

#: per-instance VMEM budget for the output brick (bytes). The compiler
#: double-buffers output blocks; keep 2 x out + live R registers well under
#: the ~16 MB VMEM. Larger budgets -> taller BT1 bricks -> fewer grid steps
#: and better VPU issue amortization (small (8, 128) bricks pay 2-4x in
#: instruction issue). QCHEM_PL_VMEM overrides (bytes).
import os as _os

_VMEM_OUT_BUDGET = int(_os.environ.get("QCHEM_PL_VMEM", 6 * 1024 * 1024))


def _r_recursion_unrolled(L: int, p, PQ):
    """Downward R recursion with STATIC per-component indexing.

    ``p``/``PQ[d]`` are df pairs of (BT1, T2) bricks. Returns a list of H
    df pairs in hermite_components(L) order. The source-order recursion
    R^{(n)}_s = PC_d R^{(n+1)}_{s-e_d} + (s_d-1) R^{(n+1)}_{s-2e_d} is
    unrolled with Python ints."""
    comps = hermite_components(L)
    H = len(comps)
    T = dfl.mul(
        p, dfl.add_(dfl.add_(dfl.sqr(PQ[0]), dfl.sqr(PQ[1])), dfl.sqr(PQ[2]))
    )
    F = boys_df(L, T)
    m2p = dfl.mul_pow2(p, -2.0)
    base = []
    acc = dfl.const(1.0, like=p[0])
    for n in range(L + 1):
        base.append(dfl.mul(acc, F[n]))
        if n < L:
            acc = dfl.mul(acc, m2p)
    if L == 0:
        return [base[0]]

    onehot, idx1, idx2, coef = _r_plan(L)
    zero = dfl.const(0.0, like=p[0])
    # R holds the H entries as Python-list registers; level n uses levels
    # built at n+1 — exactly r_table_leading's dataflow, statically indexed
    R = [base[L]] + [zero] * (H - 1)
    for n in range(L - 1, -1, -1):
        Rn = [base[n]]
        for s in range(1, H):
            d = int(np.argmax(onehot[s]))
            term = dfl.mul(PQ[d], R[int(idx1[s])])
            c = float(coef[s])
            if c != 0.0:
                term = dfl.add_(term, dfl.mul_f(R[int(idx2[s])], jnp.float32(c)))
            Rn.append(term)
        R = Rn
    return R


def _brick_vals(L, BT1, T2, bra_refs, ket_refs, ia, t1, ic):
    """The shared per-brick chain: geometry -> Boys -> R recursion ->
    prefactor. Returns (vals, ...) the H df R values for one (ia, ic,
    t1-block) brick.

    The bra column ia is extracted by a one-hot masked lane reduction —
    dynamic LANE indexing is not lowerable on TPU; a compare-select-sum is
    three VPU ops on a (BT1, a) block. The ket row ic is a (dynamic)
    sublane slice, which lowers fine.
    """
    p1h = bra_refs[0]
    a = p1h.shape[-1]
    sub = lambda r: r[pl.ds(t1 * BT1, BT1), :]  # (BT1, a) sublane slice
    lane = jax.lax.broadcasted_iota(jnp.int32, (BT1, a), 1)
    pick = lambda r: jnp.broadcast_to(
        jnp.sum(jnp.where(lane == ia, sub(r), 0.0), axis=1, keepdims=True),
        (BT1, T2),
    )
    ket = lambda h, l: (  # noqa: E731
        jnp.broadcast_to(h[pl.ds(ic, 1), :], (BT1, T2)),
        jnp.broadcast_to(l[pl.ds(ic, 1), :], (BT1, T2)),
    )
    p1 = (pick(bra_refs[0]), pick(bra_refs[1]))
    P1 = [(pick(bra_refs[2 + 2 * d]), pick(bra_refs[3 + 2 * d])) for d in range(3)]
    p2 = ket(ket_refs[0], ket_refs[1])
    P2 = [ket(ket_refs[2 + 2 * d], ket_refs[3 + 2 * d]) for d in range(3)]
    ps = dfl.add(p1, p2)
    pq = dfl.mul(p1, p2)
    alpha = dfl.mul(pq, dfl.inv(ps))
    PQ = [dfl.sub(P1[d], P2[d]) for d in range(3)]
    R = _r_recursion_unrolled(L, alpha, PQ)
    pref = dfl.mul(
        dfl.mul(dfl.inv(pq), dfl.rsqrt(ps)),
        dfl.const(2.0 * np.pi**2.5, like=ps[0]),
    )
    return [dfl.mul(r, pref) for r in R]


def _r2m_emission(vals, idx, sign, neg):
    """Static (s1, s2) -> ±vals[idx[s1, s2]] register-write plan of the fused
    kernel: dict mapping output slot to the (possibly negated) R value, with
    negations computed once per Hermite entry. Pure Python over opaque
    values — CPU-testable without Mosaic (tests/test_eri_pallas.py)."""
    S1, S2 = idx.shape
    out: dict[tuple[int, int], object] = {}
    negs: dict[int, object] = {}
    for s2 in range(S2):
        flip = sign[s2] < 0
        for s1 in range(S1):
            h = int(idx[s1, s2])
            if flip:
                v = negs.get(h)
                if v is None:
                    v = negs[h] = neg(vals[h])
            else:
                v = vals[h]
            out[(s1, s2)] = v
    return out


def _reorder_htab(hi, lo, Lb: int, Lk: int, a: int, c: int):
    """XLA-side (s1, s2) reorder + ket parity signs for the fallback H-table
    layout: (H, a, c, T1, T2) -> (a*S1, c*S2, T1, T2) pairs, where
    out[ai*S1+s1, cj*S2+s2] = sign[s2] * htab[idx[s1, s2], ai, cj]."""
    idx, sign = _r2_gather(Lb, Lk)
    S1, S2 = idx.shape
    hidx = jnp.asarray(np.tile(idx, (a, c)))  # (a*S1, c*S2)
    ai = jnp.repeat(jnp.arange(a), S1)[:, None]
    cj = jnp.repeat(jnp.arange(c), S2)[None, :]
    sgn = jnp.asarray(np.tile(sign, c), jnp.float32)[None, :, None, None]
    return hi[hidx, ai, cj] * sgn, lo[hidx, ai, cj] * sgn


def _kernel_fused(Lb, Lk, BT1, *refs):
    """grid (T1//BT1, a, c): emit the contraction-ready R2m brick
    (S1, S2, BT1, T2) for one (t1-block, ia, ic) — the (s1, s2) reorder and
    ket parity signs unrolled as register writes."""
    bra_refs, ket_refs = refs[:8], refs[8:16]
    out_h, out_l = refs[16], refs[17]
    S1, S2 = nhermite(Lb), nhermite(Lk)
    idx, sign = _r2_gather(Lb, Lk)
    T2 = ket_refs[0].shape[-1]
    t1, ia, ic = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    vals = _brick_vals(Lb + Lk, BT1, T2, bra_refs, ket_refs, ia, t1, ic)
    for (s1, s2), v in _r2m_emission(vals, idx, sign, dfl.neg).items():
        out_h[s1, s2] = v[0]
        out_l[s1, s2] = v[1]


def _kernel_htab(Lb, Lk, BT1, *refs):
    """grid (T1//BT1, a, c): emit the raw H-axis R table (H, BT1, T2) for
    one brick — the (s1, s2) reorder happens as an XLA gather (fallback for
    classes whose (S1, S2) R2m block would overflow VMEM)."""
    bra_refs, ket_refs = refs[:8], refs[8:16]
    out_h, out_l = refs[16], refs[17]
    T2 = ket_refs[0].shape[-1]
    t1, ia, ic = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    vals = _brick_vals(Lb + Lk, BT1, T2, bra_refs, ket_refs, ia, t1, ic)
    for h, v in enumerate(vals):
        out_h[h, 0, 0] = v[0]
        out_l[h, 0, 0] = v[1]


def _kernel_fused_e1(Lb, Lk, BT1, A, *refs):
    """grid (T1//BT1, c, a) — note the ORDER: ia is the innermost/fastest
    grid dim so the output block (indexed by (t1, ic) only) stays VMEM-
    resident across the bra-primitive loop and ACCUMULATES the contraction

        out[alpha, s2] += sum_s1 E1[bt1, ia, alpha, s1] * R2m[s1, s2]

    in df arithmetic. This eliminates the XLA f64 dot1 (the lane-starved
    N=A contraction that is ~80% of the dot FLOPs) and shrinks the kernel
    output from (a*S1, c*S2, ...) to (A, c*S2, ...).

    E1 arrives as (hi, lo) f32 pairs shaped (T1, a, A*S1) — the bra columns
    are extracted by the same one-hot masked lane reduction the bra p/P
    pick uses (static column index; dynamic lane indexing is not lowerable,
    and this known-lowerable pattern costs 3 VPU ops per (alpha, s1), paid
    once per grid step)."""
    bra_refs, ket_refs = refs[:8], refs[8:16]
    e1h_ref, e1l_ref = refs[16], refs[17]
    out_h, out_l = refs[18], refs[19]
    S1, S2 = nhermite(Lb), nhermite(Lk)
    idx, sign = _r2_gather(Lb, Lk)
    T2 = ket_refs[0].shape[-1]
    t1, ic, ia = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    vals = _brick_vals(Lb + Lk, BT1, T2, bra_refs, ket_refs, ia, t1, ic)

    # hoisted bra-coefficient extraction: (BT1, 1) df per (alpha, s1); the
    # e1 refs are blocked to (1, BT1, A*S1) per grid step by their BlockSpec
    # (leading grid-sliced ia dim — Mosaic constrains only the LAST TWO
    # block dims, so a must not sit there)
    ASl = e1h_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (BT1, ASl), 1)
    eh_blk = e1h_ref[0, :, :]
    el_blk = e1l_ref[0, :, :]
    def col(blk, k):
        return jnp.sum(jnp.where(lane == k, blk, 0.0), axis=1, keepdims=True)

    @pl.when(ia == 0)
    def _():
        z = jnp.zeros((A, S2, BT1, T2), jnp.float32)
        out_h[...] = z
        out_l[...] = z

    for alpha in range(A):
        e1 = [
            (col(eh_blk, alpha * S1 + s1), col(el_blk, alpha * S1 + s1))
            for s1 in range(S1)
        ]
        for s2 in range(S2):
            acc = dfl.mul(e1[0], vals[int(idx[0, s2])])
            for s1 in range(1, S1):
                acc = dfl.madd(acc, e1[s1], vals[int(idx[s1, s2])])
            if sign[s2] < 0:
                acc = dfl.neg(acc)
            cur = (out_h[alpha, s2], out_l[alpha, s2])
            new = dfl.add_(cur, acc)
            out_h[alpha, s2] = new[0]
            out_l[alpha, s2] = new[1]


def _pick_bt1(T1: int, block_bytes_per_row: int) -> int:
    """Biggest multiple-of-8 divisor of T1 whose double-buffered output
    block stays under the VMEM budget (T1 itself when not 8-divisible)."""
    if T1 % 8:
        return T1
    BT1 = max(8, min(T1, (_VMEM_OUT_BUDGET // max(block_bytes_per_row, 1)) // 8 * 8))
    while T1 % BT1:
        BT1 -= 8
    return BT1


@functools.partial(jax.jit, static_argnums=(0, 1))
def r2m_tiles_pallas(Lb: int, Lk: int, p1, P1, p2, P2):
    """Contraction-ready df R2m for one tile: (hi, lo) f32 arrays of shape
    (a*S1, c*S2, T1, T2). p1/P1 are df pairs shaped (T1, a)/(T1, a, 3);
    p2/P2 df pairs shaped (T2, c)/(T2, c, 3).

    Two kernel variants, chosen by VMEM footprint: the fused kernel emits
    R2m directly (saves a full-size XLA gather pass); classes whose
    (S1, S2, BT1, T2) block cannot fit VMEM fall back to the raw H-table
    kernel plus the gather (only the highest-L classes, tiny pair counts).
    """
    T1, a = p1[0].shape
    T2, c = p2[0].shape
    S1, S2 = nhermite(Lb), nhermite(Lk)
    H = len(hermite_components(Lb + Lk))

    fused_row = S1 * S2 * T2 * 4 * 2 * 2  # hi+lo, double-buffered
    htab_row = H * T2 * 4 * 2 * 2
    fused = fused_row * 8 <= _VMEM_OUT_BUDGET
    BT1 = _pick_bt1(T1, fused_row if fused else htab_row)

    # bra operands as (T1, a); ket transposed to (c, T2) so ket lanes = T2
    bra_ops = [p1[0], p1[1]] + [
        P1[k][:, :, d] for d in range(3) for k in range(2)
    ]
    ket_ops = [p2[0].T, p2[1].T] + [
        P2[k][:, :, d].T for d in range(3) for k in range(2)
    ]

    # full-array input blocks: bra (T1, a) and ket (c, T2) are tiny (<= 128
    # x 36 f32) and stay VMEM-resident across the whole grid; the kernel
    # slices its brick itself (blocked specs would need 8/128-divisible
    # trailing dims, which a and T2 generally are not)
    bra_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ket_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if fused:
        out_spec = pl.BlockSpec(
            (S1, S2, BT1, T2),
            lambda t1, ia, ic: (ia, ic, t1, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((a * S1, c * S2, T1, T2), jnp.float32)
        kern = functools.partial(_kernel_fused, Lb, Lk, BT1)
    else:
        out_spec = pl.BlockSpec(
            (H, 1, 1, BT1, T2),
            lambda t1, ia, ic: (0, ia, ic, t1, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((H, a, c, T1, T2), jnp.float32)
        kern = functools.partial(_kernel_htab, Lb, Lk, BT1)

    flops_per_pt = 40 * H * max(Lb + Lk, 1) + 600  # df recursion + Boys, rough
    # the package runs with jax_enable_x64 on; index maps traced under x64
    # produce i64 block indices, which Mosaic refuses to legalize — trace
    # the kernel call in an x64-off scope (everything inside is f32/i32)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            kern,
            grid=(T1 // BT1, a, c),
            in_specs=[bra_spec] * 8 + [ket_spec] * 8,
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_pt * a * c * T1 * T2,
                bytes_accessed=2 * (a * S1 * c * S2 * T1 * T2 * 4)
                + (a * T1 + c * T2) * 64,
                transcendentals=2 * a * c * T1 * T2,
            ),
            # Mosaic is TPU-only; CPU (tests, virtual meshes) interprets
            interpret=jax.default_backend() != "tpu",
        )
        hi, lo = call(*(bra_ops + ket_ops))
    if not fused:
        hi, lo = _reorder_htab(hi, lo, Lb, Lk, a, c)
    return hi, lo


@functools.partial(jax.jit, static_argnums=(0, 1))
def fused_e1_tiles_pallas(Lb: int, Lk: int, E1h, E1l, p1, P1, p2, P2):
    """Bra-contracted df tile tensor: (hi, lo) f32 arrays of shape
    (A, c*S2, T1, T2) with out[alpha, ic*S2+s2] = sum_{ia,s1} E1 R2m.
    E1h/E1l are f32 (T1, a, A*S1); p/P as in r2m_tiles_pallas."""
    T1, a, ASl = E1h.shape
    T2, c = p2[0].shape
    S1, S2 = nhermite(Lb), nhermite(Lk)
    A = ASl // S1

    out_row = A * S2 * T2 * 4 * 2 * 2  # hi+lo, double-buffered
    BT1 = _pick_bt1(T1, out_row)

    bra_ops = [p1[0], p1[1]] + [
        P1[k][:, :, d] for d in range(3) for k in range(2)
    ]
    ket_ops = [p2[0].T, p2[1].T] + [
        P2[k][:, :, d].T for d in range(3) for k in range(2)
    ]
    # (a, T1, ASl): Mosaic blocks constrain the LAST TWO dims, so the
    # grid-sliced ia axis must lead (a cheap f32 transpose per tile call)
    e1_ops = [jnp.transpose(E1h, (1, 0, 2)), jnp.transpose(E1l, (1, 0, 2))]

    bra_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ket_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    e1_spec = pl.BlockSpec(
        (1, BT1, ASl), lambda t1, ic, ia: (ia, t1, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (A, S2, BT1, T2),
        lambda t1, ic, ia: (0, ic, t1, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((A, c * S2, T1, T2), jnp.float32)
    kern = functools.partial(_kernel_fused_e1, Lb, Lk, BT1, A)

    H = len(hermite_components(Lb + Lk))
    flops_per_pt = 40 * H * max(Lb + Lk, 1) + 600 + 40 * A * S1 * S2 // max(a, 1)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            kern,
            grid=(T1 // BT1, c, a),
            in_specs=[bra_spec] * 8 + [ket_spec] * 8 + [e1_spec, e1_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_pt * a * c * T1 * T2,
                bytes_accessed=2 * (A * c * S2 * T1 * T2 * 4)
                + (a * T1 * (8 + ASl) + c * T2) * 8,
                transcendentals=2 * a * c * T1 * T2,
            ),
            interpret=jax.default_backend() != "tpu",
        )
        hi, lo = call(*(bra_ops + ket_ops + e1_ops))
    return hi, lo


def tile_vals_pallas_e1(Lb: int, Lk: int, E1df, p1, P1, E2, p2, P2):
    """Fused-E1 drop-in for tile_vals_pallas: the bra Hermite->Cartesian
    contraction runs INSIDE the Mosaic kernel (df accumulation over the ia
    grid dim — see _kernel_fused_e1); only the small ket-side contraction
    (~18% of the dot FLOPs) stays in XLA f64. E1df = (E1h, E1l) f32
    (T1, a, A*S1); E2 is the f64 ket Hermite table (T2, c, C, S2)."""
    E1h, E1l = E1df
    T2, c, C, S2 = E2.shape
    T1 = E1h.shape[0]
    hi, lo = fused_e1_tiles_pallas(Lb, Lk, E1h, E1l, p1, P1, p2, P2)
    tA = hi.astype(jnp.float64) + lo.astype(jnp.float64)  # (A, c*S2, T1, T2)
    A = tA.shape[0]
    E2m = E2.transpose(1, 3, 2, 0).reshape(c * S2, C, T2)
    out = jax.lax.dot_general(
        tA, E2m, (((1,), (0,)), ((3,), (2,))), preferred_element_type=tA.dtype
    )  # (T2, A, T1, C)
    return out.transpose(2, 1, 0, 3).reshape(T1 * A, T2 * C)


def tile_vals_pallas(Lb: int, Lk: int, E1, p1, P1, E2, p2, P2):
    """Drop-in for eri_tiled._tile_vals_df with the elementwise chain in the
    Pallas kernel. E1/E2 are f64 Hermite tables (T, n, A, S); p/P are df
    pairs. Returns the (T1*A, T2*C) f64 tile block."""
    T1, a, A, S1 = E1.shape
    T2, c, C, S2 = E2.shape
    Rhi, Rlo = r2m_tiles_pallas(Lb, Lk, p1, P1, p2, P2)
    R2m = Rhi.astype(jnp.float64) + Rlo.astype(jnp.float64)

    E1m = E1.transpose(1, 3, 2, 0).reshape(a * S1, A, T1)
    E2m = E2.transpose(1, 3, 2, 0).reshape(c * S2, C, T2)
    t1 = jax.lax.dot_general(
        R2m, E1m, (((0,), (0,)), ((2,), (2,))), preferred_element_type=R2m.dtype
    )
    out = jax.lax.dot_general(
        t1, E2m, (((1,), (0,)), ((2,), (2,))), preferred_element_type=R2m.dtype
    )
    return out.transpose(1, 2, 0, 3).reshape(T1 * A, T2 * C)
