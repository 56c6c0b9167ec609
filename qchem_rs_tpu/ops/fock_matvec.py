"""Pallas TPU double-float matvec for the in-core Fock build.

The in-core RHF iteration is one matvec G = terms @ vec(D) with terms the
(n^2, n^2) antisymmetrized ERI table (rhf.rs:58-62's precompute, kept as a
matrix so the per-iteration contraction rhf.rs:152-167 is a single matmul).
On TPU that matvec runs in XLA's EMULATED f64 dot_general at ~2.6 logical
GFLOP/s (measured, docs/PROFILE_r05.md dot probe) — 0.16 s per iteration on
benzene/cc-pVDZ, i.e. essentially all of scf_s.

This module evaluates the same contraction in (hi, lo)-f32 double-float
arithmetic (ops/dfloat.py, ~2^-45 effective mantissa) on the VPU:

- ``split_terms`` pads terms to the block grid and splits it ONCE per ERI
  build into an (hi, lo) f32 pair (the f64 source can then be freed).
- ``matvec_df`` splits vec(D) per iteration and runs one ``pl.pallas_call``:
  grid (Mp//BJ, Mp//BK) with the reduction axis innermost; each step forms
  the exact two_prod products of a (BK, BJ) tile of terms^T with a (BK, 1)
  slice of d, tree-reduces them in df over the BK rows, and accumulates
  into the (1, BJ) output block that stays VMEM-resident across the k loop.

terms is symmetric ((ij|kl)-half-exchange inherits the real-integral pair
permutation symmetry), so the kernel computes G^T = d^T @ terms with terms
in its natural layout — no transpose pass.

Accuracy: products are error-free (Dekker two_prod); the tree + k-loop is
~66 sequential sloppy df adds -> ~7e-13 relative worst case, measured
~1e-13 abs against the f64 matvec (tests/test_fock_matvec.py) — two orders
below the 1e-8 Eh SCF target. NOT differentiable (Mosaic kernels define no
VJP): the AD paths (gradients, response) keep the f64 matvec.

Replaces the nalgebra f64 GEMV the reference gets natively on CPU
(/root/reference/core/src/hf/rhf.rs:67-68 -> rhf.rs:152-167).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qchem_rs_tpu.ops import dfloat as dfl

__all__ = ["block_sizes", "padded_m", "split_terms", "matvec_df"]


def block_sizes() -> tuple[int, int]:
    """(BK, BJ): reduction-rows x output-lanes per grid step. BK must be a
    power of two (df tree reduction); BJ a multiple of 128 (f32 lane tile).
    Defaults sized to ~2 MB of double-buffered VMEM blocks."""
    bk = int(os.environ.get("QCHEM_MV_BK", 256))
    bj = int(os.environ.get("QCHEM_MV_BJ", 512))
    if bk & (bk - 1):
        raise ValueError(f"QCHEM_MV_BK={bk} must be a power of two")
    return bk, bj


def padded_m(m: int) -> int:
    """m rounded up to the block grid (zero padding contributes zeros)."""
    bk, bj = block_sizes()
    step = max(bk, bj) if max(bk, bj) % min(bk, bj) == 0 else bk * bj
    return -(-m // step) * step


@jax.jit
def split_terms(terms: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pad (m, m) f64 terms to (Mp, Mp) and split into (hi, lo) f32.

    One elementwise pass, done once per ERI build; callers should let the
    f64 source die afterwards (jit donation frees it)."""
    m = terms.shape[0]
    mp = padded_m(m)
    hi = terms.astype(jnp.float32)
    lo = (terms - hi.astype(jnp.float64)).astype(jnp.float32)
    pad = ((0, mp - m), (0, mp - m))
    return jnp.pad(hi, pad), jnp.pad(lo, pad)


def _kernel(bk: int, t_hi, t_lo, d_hi, d_lo, o_hi, o_lo):
    k = pl.program_id(1)
    # exact products of the (BK, BJ) terms tile with the (BK, 1) d slice
    # (dfl.mul inlined over the broadcast — all f32 VPU)
    h, l = dfl.mul((t_hi[...], t_lo[...]), (d_hi[...], d_lo[...]))
    rows = bk
    while rows > 1:  # df tree reduction over the BK rows -> (1, BJ)
        half = rows // 2
        h, l = dfl.add_(
            (h[:half, :], l[:half, :]), (h[half:rows, :], l[half:rows, :])
        )
        rows = half

    @pl.when(k == 0)
    def _init():
        o_hi[...] = h
        o_lo[...] = l

    @pl.when(k != 0)
    def _acc():
        nh, nl = dfl.add_((o_hi[...], o_lo[...]), (h, l))
        o_hi[...] = nh
        o_lo[...] = nl


@functools.partial(jax.jit, static_argnums=(3,))
def matvec_df(t_hi: jax.Array, t_lo: jax.Array, d: jax.Array, m: int):
    """G = terms @ d with split terms (from ``split_terms``) and (m,) f64 d.

    Returns (m,) f64. Traceable under jit (the SCF while_loop body calls it
    every iteration)."""
    mp = t_hi.shape[0]
    bk, bj = block_sizes()
    d_hi, d_lo = dfl.split_f64(jnp.pad(d, (0, mp - m)))
    d_hi = d_hi.reshape(mp, 1)
    d_lo = d_lo.reshape(mp, 1)

    t_spec = pl.BlockSpec((bk, bj), lambda j, k: (k, j), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((bk, 1), lambda j, k: (k, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, bj), lambda j, k: (0, j), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((1, mp), jnp.float32)

    with jax.enable_x64(False):
        call = pl.pallas_call(
            functools.partial(_kernel, bk),
            grid=(mp // bj, mp // bk),
            in_specs=[t_spec, t_spec, d_spec, d_spec],
            out_specs=(o_spec, o_spec),
            out_shape=(out_shape, out_shape),
            cost_estimate=pl.CostEstimate(
                flops=40 * mp * mp,
                bytes_accessed=2 * mp * mp * 4 + 3 * mp * 2 * 4,
                transcendentals=0,
            ),
            # Mosaic is TPU-only; CPU (tests, virtual meshes) interprets
            interpret=jax.default_backend() != "tpu",
        )
        g_hi, g_lo = call(t_hi, t_lo, d_hi, d_lo)
    return (
        g_hi[0, :m].astype(jnp.float64) + g_lo[0, :m].astype(jnp.float64)
    )
