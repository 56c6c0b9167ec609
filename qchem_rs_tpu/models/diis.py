"""Pulay (commutator) DIIS as a jit-compatible fixed-size ring buffer.

Mirrors the reference's ``Diis`` (/root/reference/core/src/diis.rs:19-59):
push the newest (error, fock) sample, keep at most ``max_len`` newest samples,
pass the newest Fock through until ``min_len`` samples exist, otherwise solve
the bordered system

    [ <e_i, e_j>  1 ] [c]   [0]
    [    1        0 ] [λ] = [1]

and return sum_i c_i F_i. The reference solves by QR (diis.rs:50); here we
use an SVD least-squares solve, which degrades gracefully when the error
vectors become linearly dependent (same solution when well-conditioned).

TPU-first shape discipline: the history lives in fixed (M, n, n) buffers
inside the jitted SCF ``lax.while_loop``; empty slots are masked out of the
B matrix with identity rows forcing their coefficients to zero. vmap over a
leading spin axis gives the UHF per-spin DIIS stacks (uhf.rs:76-78) for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiisState(NamedTuple):
    errors: jax.Array  # (M, n, n)
    focks: jax.Array  # (M, n, n)
    count: jax.Array  # () int32 — total samples pushed


def diis_init(max_len: int, n: int, dtype=jnp.float64) -> DiisState:
    return DiisState(
        errors=jnp.zeros((max_len, n, n), dtype=dtype),
        focks=jnp.zeros((max_len, n, n), dtype=dtype),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def diis_apply(state: DiisState, error: jax.Array, fock: jax.Array, min_len: int) -> tuple[jax.Array, DiisState]:
    """Push a sample and return the (possibly extrapolated) Fock matrix."""
    M = state.errors.shape[0]
    slot = state.count % M
    errors = state.errors.at[slot].set(error)
    focks = state.focks.at[slot].set(fock)
    count = state.count + 1
    new_state = DiisState(errors, focks, count)

    m = jnp.minimum(count, M)  # current window size
    valid = jnp.arange(M) < m  # which slots hold real samples

    # B matrix with identity rows/cols for invalid slots
    B = jnp.einsum("iab,jab->ij", errors, errors)
    vv = valid[:, None] & valid[None, :]
    B = jnp.where(vv, B, 0.0)
    B = B + jnp.where(
        jnp.eye(M, dtype=bool) & ~valid[:, None], 1.0, 0.0
    )
    # border
    Bfull = jnp.zeros((M + 1, M + 1), dtype=B.dtype)
    Bfull = Bfull.at[:M, :M].set(B)
    border = jnp.where(valid, 1.0, 0.0)
    Bfull = Bfull.at[:M, M].set(border)
    Bfull = Bfull.at[M, :M].set(border)
    rhs = jnp.zeros(M + 1, dtype=B.dtype).at[M].set(1.0)

    coef = jnp.linalg.lstsq(Bfull, rhs)[0][:M]
    coef = jnp.where(valid, coef, 0.0)
    f_diis = jnp.einsum("i,iab->ab", coef, focks)

    f_out = jnp.where(m < min_len, fock, f_diis)
    return f_out, new_state
