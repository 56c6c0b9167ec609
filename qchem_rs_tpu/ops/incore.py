"""Modular in-core assembly with thread-parallel precompilation.

The axon TPU backend's per-program compile latency is the dominant cold-start
cost (~60x the XLA:CPU compile time for the same HLO), but its remote compile
service processes concurrent requests in parallel. So instead of one mega
program per molecule, the concrete-geometry path splits the work into
per-quartet-class programs plus one SCF program, and ``precompile`` lowers
and compiles them all from a thread pool. The persistent compilation cache
then makes subsequent processes cheap.

The fully-traceable single-program path (ops/eri.py, ops/fock.eri_terms)
remains for vmapped/sharded conformer sweeps.
"""

from __future__ import annotations

import concurrent.futures as cf
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.angular import ncart
from qchem_rs_tpu.ops.eri import _eri_chunk_core, build_pair_groups
from qchem_rs_tpu.ops.fock import (
    _gather_block_args,
    block_chunks,
    schwarz_bounds,
    screened_quartets,
)
from qchem_rs_tpu.utils.system import MolecularSystem


class TermsAssembler:
    """Assemble terms[i,j,k,l] = (ij|kl) - 1/2 (ik|jl) via one compiled
    program per quartet class-pair (scan over chunks, donated flat buffer)."""

    def __init__(
        self,
        system: MolecularSystem,
        screening_threshold: float = 0.0,
        chunk_quartets: int = 4096,
    ):
        self.system = system
        self.nao = system.n_basis_cart()
        nao = self.nao
        groups = build_pair_groups(system, None)
        schwarz = schwarz_bounds(groups) if screening_threshold > 0 else None
        blocks = screened_quartets(
            groups, schwarz, screening_threshold, chunk_multiple=1
        )
        #: compute budget per executable invocation, in primitive-quartet x
        #: Hermite units (measured throughput ~12M units/s on one v5e in
        #: emulated f64 -> ~20 s per call). Two backend constraints pull in
        #: opposite directions: executions running ~60 s+ are killed by a
        #: watchdog, while each invocation costs ~1.4 s of fixed overhead
        #: (the n^4 carry is not donatable on this backend), so segments
        #: should be as large as the watchdog allows.
        SEG_UNITS = 250_000_000
        from qchem_rs_tpu.ops.mcmurchie import nhermite

        self._tasks = []
        for blk in blocks:
            g1, g2 = groups[blk.g1], groups[blk.g2]
            ncA, ncB = ncart(g1.la), ncart(g1.lb)
            ncC, ncD = ncart(g2.la), ncart(g2.lb)
            xs = block_chunks(blk, g1, g2, cap=chunk_quartets)
            nchunks = xs[0].shape[0]
            a = g1.p.shape[1]
            c = g2.p.shape[1]
            units_per_chunk = (
                xs[0].shape[1] * a * c
                * max(nhermite(g1.L + g2.L), nhermite(g1.L) * nhermite(g2.L))
            )
            seg = min(max(1, SEG_UNITS // max(1, units_per_chunk)), nchunks)
            self._max_elems = max(
                getattr(self, "_max_elems", 1),
                xs[0].shape[1] * ncA * ncB * ncC * ncD,
            )
            npad = (-nchunks) % seg
            if npad:
                # pad extra chunks with weight-0 / index-0 rows
                def _padc(x, fill):
                    return jnp.concatenate(
                        [x, jnp.full((npad,) + x.shape[1:], fill, x.dtype)]
                    )

                xs = (_padc(xs[0], 0), _padc(xs[1], 0), _padc(xs[2], 0.0))
            nseg = xs[0].shape[0] // seg
            xs = tuple(x.reshape((nseg, seg) + x.shape[1:]) for x in xs)

            def block_program(flat, xs, g1=g1, g2=g2, ncA=ncA, ncB=ncB, ncC=ncC, ncD=ncD):
                def body(carry, x):
                    br, kt, w = x
                    args = _gather_block_args(g1, g2, br, kt, w)
                    vals = _eri_chunk_core(
                        g1.L, g2.L, args["E1"], args["p1"], args["P1"],
                        args["E2"], args["p2"], args["P2"],
                    )
                    n = vals.shape[0]
                    vals = vals.reshape(n, ncA, ncB, ncC, ncD) * w[:, None, None, None, None]
                    shape = vals.shape
                    b_ = lambda q: jnp.broadcast_to(q, shape).ravel()
                    ii = b_(args["ii"][:, :, None, None, None])
                    jj = b_(args["jj"][:, None, :, None, None])
                    kk = b_(args["kk"][:, None, None, :, None])
                    ll = b_(args["ll"][:, None, None, None, :])
                    v = vals.ravel()
                    # 16 scatters (8 Coulomb +v, 8 exchange -v/2), each with
                    # UNIQUE indices: XLA:TPU serializes scatter-adds whose
                    # indices may collide (~1.3 us/element — this was ~100%
                    # of the ERI build time); with unique_indices=True it
                    # vectorizes. Uniqueness within an image holds because
                    # distinct shell quartets touch disjoint AO blocks;
                    # padding rows (w == 0) are routed to per-element dump
                    # slots beyond nao^4 so they cannot collide either.
                    nelem = v.shape[0]
                    valid = b_((w > 0)[:, None, None, None, None])
                    dump = nao**4 + jax.lax.broadcasted_iota(jnp.int32, (nelem, 1), 0)[:, 0]
                    for (a_, b2, c_, d_) in (
                        (ii, jj, kk, ll), (jj, ii, kk, ll), (ii, jj, ll, kk), (jj, ii, ll, kk),
                        (kk, ll, ii, jj), (ll, kk, ii, jj), (kk, ll, jj, ii), (ll, kk, jj, ii),
                    ):
                        idx_c = ((a_ * nao + b2) * nao + c_) * nao + d_
                        idx_x = ((a_ * nao + c_) * nao + b2) * nao + d_
                        carry = carry.at[jnp.where(valid, idx_c, dump)].add(
                            v, unique_indices=True
                        )
                        carry = carry.at[jnp.where(valid, idx_x, dump)].add(
                            -0.5 * v, unique_indices=True
                        )
                    return carry, None

                flat, _ = jax.lax.scan(body, flat, xs)
                return flat

            self._tasks.append((jax.jit(block_program, donate_argnums=(0,)), xs))

        # final reshape (+ optional spherical projection) as its own program
        def finish(flat):
            out = flat[: nao**4].reshape(nao, nao, nao, nao)
            if system.spherical:
                T = jnp.asarray(system.sph_T)
                out = jnp.einsum("pqrs,pi->iqrs", out, T)
                out = jnp.einsum("iqrs,qj->ijrs", out, T)
                out = jnp.einsum("ijrs,rk->ijks", out, T)
                out = jnp.einsum("ijks,sl->ijkl", out, T)
            ns = out.shape[0]
            return out.reshape(ns * ns, ns * ns)

        self._finish = jax.jit(finish, donate_argnums=(0,) if not system.spherical else ())

    def programs(self):
        """(name, jitted_fn, abstract_args) for precompilation. One program
        per block, executed once per scan segment (build())."""
        flat_spec = jax.ShapeDtypeStruct((self.nao**4 + self._max_elems,), jnp.float64)
        out = []
        for i, (fn, xs) in enumerate(self._tasks):
            seg_spec = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), xs
            )
            out.append((f"terms{i}", fn, (flat_spec, seg_spec)))
        out.append(("finish", self._finish, (flat_spec,)))
        return out

    def prewarm(self, max_workers: int | None = None) -> None:
        """Compile all block programs; build() then calls them directly."""
        self._compiled = precompile(self.programs(), max_workers=max_workers)

    def build(self) -> jax.Array:
        """Run the assembly; returns the (n^2, n^2) terms operator.

        Each block program is invoked once per scan segment so no single
        device execution exceeds the backend's ~60 s execution watchdog; the
        donated flat buffer stays device-resident across calls.
        """
        compiled = getattr(self, "_compiled", {})
        flat = jnp.zeros(self.nao**4 + self._max_elems, dtype=jnp.float64)
        for i, (fn, xs) in enumerate(self._tasks):
            runner = compiled.get(f"terms{i}", fn)
            for k in range(xs[0].shape[0]):
                flat = runner(flat, tuple(x[k] for x in xs))
        return compiled.get("finish", self._finish)(flat)


def precompile(programs, max_workers: int | None = None) -> dict:
    """Lower+compile jitted programs; returns {name: Compiled}.

    Default is SERIAL: the axon remote compile service handles concurrent
    requests, but its helper subprocesses can lose their TPU environment
    under concurrency and then fail stickily with bogus hostname/OOM errors
    — and with the fused-scatter modular programs each compile is only a few
    seconds anyway. Set QCHEM_COMPILE_WORKERS>1 (or max_workers) to opt into
    parallel compilation. Failures retry with backoff; a program that still
    fails is skipped (the call path compiles it on demand).
    """
    import os
    import time

    if max_workers is None:
        max_workers = int(os.environ.get("QCHEM_COMPILE_WORKERS", "1"))

    def _one(item):
        name, fn, args = item
        return name, fn.lower(*args).compile()

    results: dict = {}
    failed = []
    if max_workers <= 1:
        for it in programs:
            try:
                name, compiled = _one(it)
                results[name] = compiled
            except Exception:
                failed.append(it)
    else:
        with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
            futs = {ex.submit(_one, it): it for it in programs}
            for fut in cf.as_completed(futs):
                try:
                    name, compiled = fut.result()
                    results[name] = compiled
                except Exception:
                    failed.append(futs[fut])
    for it in failed:  # serial retries with backoff
        for attempt in range(3):
            try:
                name, compiled = _one(it)
                results[name] = compiled
                break
            except Exception:
                if attempt == 2:
                    break
                time.sleep(5.0 * (attempt + 1))
    return results
