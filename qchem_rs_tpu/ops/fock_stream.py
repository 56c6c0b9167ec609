"""Streaming integral-direct Fock build on the tile engine.

True direct SCF — nothing pair-space-sized is ever stored — at tile-engine
speed. The round-1 ``DirectFockBuilder`` recomputed integrals through an
8-image gather/scatter-add architecture that profiling measured at ~99%
digestion overhead (docs/PROFILE_r02.md); here every tile block of the
pair-space ERI matrix is digested into J/K THE MOMENT it is computed:

- J accumulates in pair space: ``Jp[rows] += vals @ dJ[cols]`` and the
  transpose role ``Jp[cols] += vals.T @ dJ[rows]`` — contiguous
  dynamic-slice add-updates, no scatters (rows/cols of a tile are
  contiguous V2 row ranges).
- K accumulates as a dense (nao, nao) carry via ONE-HOT MXU reductions:
  for a block with row AO ids (i, j) and column AO ids (k, l),
  ``K += Oh(i)^T [vals * D[j, l]] Oh(k)`` and the three sibling
  orientations — matmuls against {0,1} one-hot matrices instead of
  scatter-adds (the round-2 lesson: TPU scatters are catastrophically
  slow, matmuls are free).

Coverage bookkeeping: tasks enumerate class pairs i1 <= i2 and, within a
same-class pair, SQUARE tiles on/above the diagonal. Every block is
digested in both roles (block and transpose); self-transposed diagonal
tiles are pre-scaled by 1/2, so the total equals the full mirrored-V2f
contraction exactly (ops/fock_pair.py's J/K formulas). K's transpose role
is algebraic: role2 of every block is the transpose of role1 (D symmetric),
so K = K1 + K1^T at the end — digested once, not twice.

Memory: carries are Jp (M,) + K (nao, nao) — the reference's design wall
(dense n^4 materialization, /root/reference/core/src/hf/rhf.rs:45,58-62)
and even the pair-space matrices are gone; system size is bounded only by
the O(n^2) pair tensors.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from qchem_rs_tpu.ops.eri_tiled import (
    TiledEriEngine,
    _tile_list,
    _tile_shapes,
    _tile_units,
    SEG_UNITS,
    DONATE_CARRY,
    _PL_MAX_L,
    _tile_vals,
    _tile_vals_df,
    _kernel_mode,
)
from qchem_rs_tpu.ops.fock_pair import pair_row_ao
from qchem_rs_tpu.utils.system import MolecularSystem


class StreamingFockBuilder:
    """Integral-direct J/K: recompute screened tile blocks every call and
    digest them immediately. ``jk(D) -> (J, K)`` in the working basis."""

    def __init__(
        self,
        system: MolecularSystem,
        threshold: float = 1e-12,
        positions=None,
        mesh=None,
        axis: str = "q",
    ):
        """``mesh``: optional jax.sharding.Mesh — tile lists are sharded over
        ``axis`` (shell-quartet data parallelism, SURVEY.md §2.2 item 1) and
        each device digests its tiles into local J/K partials reduced with
        psum over ICI."""
        self.system = system
        self.mesh = mesh
        self.axis = axis
        self.ndev = 1 if mesh is None else mesh.shape[axis]
        self.nao = system.n_basis_cart()
        eng = TiledEriEngine(system, threshold, positions=positions)
        self.engine = eng
        layout = eng.layout
        self.M = layout.M
        row_i, row_j, dup = pair_row_ao(layout)
        nao = self.nao
        pad = row_i < 0
        ci = np.where(pad, 0, row_i).astype(np.int32)
        cj = np.where(pad, 0, row_j).astype(np.int32)
        dead = pad | dup
        # J ket weight 2 - delta (fock_pair._wj) and the K orientation
        # weight u: 1 off-diagonal AO pair, 1/2 diagonal, 0 dead
        self._wj = jnp.asarray(np.where(dead, 0.0, np.where(ci == cj, 1.0, 2.0)))
        self._uk = jnp.asarray(np.where(dead, 0.0, np.where(ci == cj, 0.5, 1.0)))
        self._ri = jnp.asarray(ci)
        self._rj = jnp.asarray(cj)
        self._pidx = jnp.asarray((ci * nao + cj).astype(np.int32))
        self._pmap = jnp.asarray(layout.pmap)

        # tasks: like the engine's, but same-class tiles are SQUARE so every
        # kept tile is strictly-upper or exactly diagonal (the coverage
        # argument above needs self-transposed diagonal tiles)
        mode = _kernel_mode()
        metas = eng.layout.metas
        self._tasks = []
        for i1, m1 in enumerate(metas):
            for i2 in range(i1, len(metas)):
                m2 = metas[i2]
                kmode = mode
                if mode in ("df", "pallas") and not eng._df_in_range(m1, m2):
                    kmode = "f64"
                if (
                    kmode == "pallas"
                    and m1.la + m1.lb + m2.la + m2.lb > _PL_MAX_L
                ):
                    kmode = "f64"  # cf. eri_tiled: unrolled Mosaic body cap
                T1, T2 = _tile_shapes(m1, m2)
                same = i2 == i1
                if same:
                    T1 = T2 = min(T1, T2)
                b1 = b2 = None
                if eng.threshold > 0 and eng._sorted_bounds is not None:
                    b1 = eng._sorted_bounds[i1]
                    b2 = eng._sorted_bounds[i2]
                ti, tj, _ = _tile_list(
                    m1, m2, T1, T2, b1, b2, eng.threshold, same=same
                )
                if len(ti) == 0:
                    continue
                self._tasks.append(
                    self._make_task(i1, i2, m1, m2, T1, T2, ti, tj, same, kmode)
                )
        self._compiled_jk = None

    def _make_task(self, i1, i2, m1, m2, T1, T2, ti, tj, same, kernel):
        A, C = m1.A, m2.A
        rb, cb = m1.row_base, m2.row_base
        Lb, Lk = m1.la + m1.lb, m2.la + m2.lb
        nao = self.nao
        ri, rj, uk, wj, pidx = self._ri, self._rj, self._uk, self._wj, self._pidx

        def digest(D, xs, *ops):
            """Scan the (ti, tj) tile list from ZERO carries; returns the
            (dJp, dK) contribution for a DENSITY STACK D (nd, nao, nao) —
            UHF digests both spins against one integral recomputation.
            Sentinel tiles (ti < 0, mesh padding) digest with weight zero."""
            nd = D.shape[0]
            dJ_all = (D.reshape(nd, -1)[:, pidx] * wj[None]).T  # (M, nd)

            def body(carry, x):
                Jp, K = carry
                t_i, t_j = x
                valid = (t_i >= 0).astype(jnp.float64)
                t_i = jnp.maximum(t_i, 0)
                t_j = jnp.maximum(t_j, 0)
                zero = jnp.zeros((), t_i.dtype)
                sl = lambda arr, t, T: jax.lax.dynamic_slice(
                    arr, (t,) + (zero,) * (arr.ndim - 1), (T,) + arr.shape[1:]
                )
                if kernel in ("df", "pallas"):
                    from qchem_rs_tpu.ops.eri_pallas import tile_vals_pallas

                    tile_fn = tile_vals_pallas if kernel == "pallas" else _tile_vals_df
                    E1, p1h, p1l, P1h, P1l, E2, p2h, p2l, P2h, P2l = ops
                    vals = tile_fn(
                        Lb, Lk,
                        sl(E1, t_i, T1),
                        (sl(p1h, t_i, T1), sl(p1l, t_i, T1)),
                        (sl(P1h, t_i, T1), sl(P1l, t_i, T1)),
                        sl(E2, t_j, T2),
                        (sl(p2h, t_j, T2), sl(p2l, t_j, T2)),
                        (sl(P2h, t_j, T2), sl(P2l, t_j, T2)),
                    )
                else:
                    E1, p1, P1, E2, p2, P2 = ops
                    vals = _tile_vals(
                        Lb, Lk,
                        sl(E1, t_i, T1), sl(p1, t_i, T1), sl(P1, t_i, T1),
                        sl(E2, t_j, T2), sl(p2, t_j, T2), sl(P2, t_j, T2),
                    )
                r0 = rb + t_i * A  # first global V2 row of this block
                c0 = cb + t_j * C
                if same:
                    # self-transposed diagonal tiles count every ordered
                    # element twice across the two roles: halve them
                    vals = vals * jnp.where(t_i == t_j, 0.5, 1.0)
                vals = vals * valid  # sentinel (mesh-padding) tiles: zero
                zi = jnp.zeros((), t_i.dtype)
                sl1 = lambda a, s, n: jax.lax.dynamic_slice(
                    a, (s,) + (zi,) * (a.ndim - 1), (n,) + a.shape[1:]
                )
                nr, nc = T1 * A, T2 * C
                # --- J: pair-space contiguous accumulation, both roles ---
                Jrow = vals @ sl1(dJ_all, c0, nc)  # (nr, nd)
                Jcol = vals.T @ sl1(dJ_all, r0, nr)  # (nc, nd)
                Jp2 = jax.lax.dynamic_update_slice(
                    Jp, sl1(Jp, r0, nr) + Jrow, (r0, zi)
                )
                Jp2 = jax.lax.dynamic_update_slice(
                    Jp2, sl1(Jp2, c0, nc) + Jcol, (c0, zi)
                )
                # --- K: one-hot MXU digestion (role1 only; role2 is the
                # final transpose) ---
                bri = sl1(ri, r0, nr)
                brj = sl1(rj, r0, nr)
                bur = sl1(uk, r0, nr)
                cki = sl1(ri, c0, nc)
                clj = sl1(rj, c0, nc)
                cuq = sl1(uk, c0, nc)
                lanes = jnp.arange(nao)
                oh = lambda ids, w: (lanes[None, :] == ids[:, None]) * w[:, None]
                Ori = oh(bri, bur)  # (nr, nao), orientation weight folded
                Orj = oh(brj, bur)
                Ock = oh(cki, cuq)
                Ocl = oh(clj, cuq)
                # (nd, nr, nc) density gathers; matmuls broadcast over nd
                g = lambda jj, ll: D[:, jj, :][:, :, ll]
                t1 = Ori.T @ (vals[None] * g(brj, clj)) @ Ock
                t2 = Ori.T @ (vals[None] * g(brj, cki)) @ Ocl
                t3 = Orj.T @ (vals[None] * g(bri, clj)) @ Ock
                t4 = Orj.T @ (vals[None] * g(bri, cki)) @ Ocl
                K2 = K + (t1 + t2 + t3 + t4)
                return (Jp2, K2), None

            Jp0 = jnp.zeros((self.M, nd), jnp.float64)
            K0 = jnp.zeros((nd, nao, nao), jnp.float64)
            (dJp, dK), _ = jax.lax.scan(body, (Jp0, K0), xs)
            return dJp, dK

        if self.mesh is None:

            def stream_program(Jp, K, D, xs, *ops):
                dJp, dK = digest(D, xs, *ops)
                return Jp + dJp, K + dK

        else:
            try:
                from jax import shard_map as _shard_map  # jax >= 0.8

                def shard_map(f, mesh, in_specs, out_specs):
                    return _shard_map(
                        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                        check_vma=False,
                    )
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            mesh, ax = self.mesh, self.axis

            def stream_program(Jp, K, D, xs, *ops):
                def local(D, xs, *ops):
                    dJp, dK = digest(D, xs, *ops)
                    return (
                        jax.lax.psum(dJp, ax),
                        jax.lax.psum(dK, ax),
                    )

                dJp, dK = shard_map(
                    local,
                    mesh,
                    in_specs=(P(), (P(ax), P(ax))) + tuple(P() for _ in ops),
                    out_specs=(P(), P()),
                )(D, xs, *ops)
                return Jp + dJp, K + dK

        per_tile = _tile_units(m1, m2, T1, T2)
        seg = min(len(ti), max(1, int(SEG_UNITS // max(per_tile, 1.0))))
        # each device scans seg tiles: a segment holds seg * ndev
        seg_total = seg * self.ndev
        nseg = -(-len(ti) // seg_total)
        # NO repeat-padding (the V2 engine's idempotent re-write trick would
        # DOUBLE-DIGEST here): pad with sentinel (-1) tiles, digested with
        # weight zero
        pad = nseg * seg_total - len(ti)
        if pad:
            ti = np.concatenate([ti, np.full(pad, -1, ti.dtype)])
            tj = np.concatenate([tj, np.full(pad, -1, tj.dtype)])
        segments = [
            (jnp.asarray(ti[s * seg_total : (s + 1) * seg_total]),
             jnp.asarray(tj[s * seg_total : (s + 1) * seg_total]))
            for s in range(nseg)
        ]
        name = f"jk_{m1.la}{m1.lb}_{m2.la}{m2.lb}"
        okind = "df" if kernel in ("df", "pallas") else "f64"
        return (
            name,
            jax.jit(
                stream_program,
                donate_argnums=(0, 1) if DONATE_CARRY else (),
            ),
            segments,
            (i1, i2, okind),
        )

    # --- public API ---------------------------------------------------------

    def jk_stack_cart(self, D):
        """Cartesian J/K for a density STACK (nd, nao, nao) — one integral
        recomputation digests every density (UHF: both spins). Host-driven
        loop over compiled per-class-pair programs (each segment one device
        call)."""
        nao = self.nao
        D = jnp.asarray(D)
        nd = D.shape[0]
        Jp = jnp.zeros((self.M, nd), jnp.float64)
        K1 = jnp.zeros((nd, nao, nao), jnp.float64)
        for name, fn, segments, ospec in self._tasks:
            operands = self.engine.operand_arrays(*ospec)
            for xs in segments:
                Jp, K1 = fn(Jp, K1, D, xs, *operands)
        J = jnp.take(Jp, self._pmap, axis=0).T.reshape(nd, nao, nao)
        K = K1 + K1.transpose(0, 2, 1)
        return J, K

    def jk_stack(self, D):
        """J/K stacks in the working basis."""
        D = jnp.asarray(D)
        if self.system.spherical:
            T = jnp.asarray(self.system.sph_T)
            J, K = self.jk_stack_cart(T[None] @ D @ T.T[None])
            return T.T[None] @ J @ T[None], T.T[None] @ K @ T[None]
        return self.jk_stack_cart(D)

    def jk_cart(self, D):
        J, K = self.jk_stack_cart(jnp.asarray(D)[None])
        return J[0], K[0]

    def jk(self, D):
        J, K = self.jk_stack(jnp.asarray(D)[None])
        return J[0], K[0]
