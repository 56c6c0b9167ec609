"""Column-sharded V2 build: the pair-space Fock path with NO single-device
(M, M) high-water mark.

``ops/fock_pair.PairSpaceShardedFockBuilder`` shards the pair matrices for
the SCF iterations, but its one-time build still materializes the full
(M, M) V2 carry on the default device before GSPMD redistributes — the
documented memory bottleneck exactly where multi-chip should help
(round-3 VERDICT weak #8). This module removes it:

- Each device owns a set of KET TILE-COLUMNS (whole class-pair tile grid
  columns, LPT-balanced by Schwarz-screened tile cost) and builds its slab
  ``V2f[:, cols(d)]`` directly: every (bra class, ket class) ORDERED pair
  runs its tile scans per device under ``shard_map``, writing with
  dynamic_update_slice into the local (M, Mcap) slab. No (M, M) array ever
  exists; per-device peak is (M, Mcap + scratch) ~= M^2/ndev.
- Both tile orientations are computed instead of mirrored ((ab|cd) tiles
  for bra rows x local ket columns): ~2x the single-chip integral FLOPs,
  in exchange for perfect 1/ndev wall-time AND memory scaling — the right
  trade from 4 chips up, and the only build that fits when M^2 doesn't.
- The device slab keeps a PERMUTED column layout (its tile-columns,
  concatenated). A host-side ``colperm`` records local slot -> canonical
  V2 column; all downstream consumers (W build, J/K matvecs) address
  through it, so no re-layout collective is ever paid.
- The exchange matrix W is built sharded too: per AO row, the (nao, Mcap)
  row-slab is ``all_gather``-ed along the pair axis (one (nao, M) tile per
  scan step riding ICI), reordered once through the precomputed
  permutation, and the two exchange column-takes produce only the LOCAL
  W columns.
- J/K are local matvecs + one psum each (SURVEY.md §2.2-1's collective
  story): J[(ij)] = psum_d(V2f_d @ dJ_d), K = psum_d(W_d @ dK_d).

Padding rules (shard_map needs identical per-device shapes):
- devices' tile lists are right-padded by REPEATING their last real tile —
  idempotent re-writes, the same trick the single-device engine uses for
  segment tails (ops/eri_tiled.py _make_task);
- a device with NO tiles for a class pair writes its (repeated) dummy tile
  into a scratch strip appended to the slab (columns [Mcap, Mcap+Wscr));
- padding COLUMN slots carry weight 0 in every matvec and are never
  referenced by the W permutation.

Reference parity: same (ij|kl) surface as molint::eri
(/root/reference/core/src/hf/rhf.rs:45) — at a scale the reference's
single-host dense tensor cannot reach.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from qchem_rs_tpu.ops.eri_tiled import (
    _PL_MAX_L,
    DONATE_CARRY,
    SEG_UNITS,
    TiledEriEngine,
    _tile_shapes,
    _tile_units,
    _tile_vals,
    _tile_vals_df,
)
from qchem_rs_tpu.ops.fock_pair import pair_row_ao
from qchem_rs_tpu.utils.system import MolecularSystem


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm  # jax >= 0.8

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


@dataclasses.dataclass
class _TileColumn:
    """One ket tile-column: T2 consecutive pairs of one class."""

    cls: int  # ket class index
    tj: int  # pair offset (multiple of T2)
    width: int  # canonical column count = T2 * A
    base: int  # canonical V2 column base = row_base + tj * A
    cost: float = 0.0
    device: int = -1
    local: int = -1  # local column base on its device


class ColumnShardedPairFockBuilder:
    """Pair-space J/K over a device mesh with the V2 build itself sharded.

    Usage matches PairSpaceFockBuilder's traceable form:

        b = ColumnShardedPairFockBuilder(system, mesh, axis="q", threshold=t)
        V2f, W = b.prepare()          # sharded (M, ndev*Mcap), (nao^2, ndev*Mcap)
        J, K = b.jk(D)                # or b.jk_sph(D, V2f, W) inside jit

    V2f/W column layouts are DEVICE-LOCAL (permuted); use this builder's own
    consumers, not the canonical-layout PairSpaceFockBuilder helpers.
    """

    def __init__(
        self,
        system: MolecularSystem,
        mesh,
        axis: str = "q",
        threshold: float = 1e-12,
        positions=None,
        engine: TiledEriEngine | None = None,
    ):
        self.system = system
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self.nao = system.n_basis_cart()
        self.engine = engine or TiledEriEngine(system, threshold, positions=positions)
        layout = self.engine.layout
        self.M = layout.M
        metas = layout.metas
        bounds = self.engine._sorted_bounds  # per class, sorted pair order
        thr = self.engine.threshold

        # --- host: enumerate ket tile-columns and their screened tile costs
        tcols: list[_TileColumn] = []
        tmax = []  # per class: per-tile-block max Schwarz bound (bra side too)
        T2s = []
        for i2, m2 in enumerate(metas):
            T2 = min(128, m2.npad)
            T2s.append(T2)
            nb = m2.npad // T2
            if bounds is not None:
                b = np.zeros(m2.npad)
                b[: m2.npairs] = bounds[i2]
                tmax.append(b.reshape(nb, T2).max(axis=1))
            else:
                tmax.append(np.ones(nb))
            for j in range(nb):
                if j * T2 >= m2.npairs:
                    break
                tcols.append(_TileColumn(
                    cls=i2, tj=j * T2, width=T2 * m2.A,
                    base=m2.row_base + j * T2 * m2.A,
                ))

        # cost of a ket tile-column = sum over bra classes of kept tiles
        for tc in tcols:
            m2 = metas[tc.cls]
            j = tc.tj // T2s[tc.cls]
            for i1, m1 in enumerate(metas):
                T1, _ = _tile_shapes(m1, m2)
                u = _tile_units(m1, m2, T1, T2s[tc.cls])
                t1max = tmax[i1] if T2s[i1] == T1 else None
                # bra tile maxima at stride T1 (recompute when T1 != T2s[i1])
                if bounds is not None:
                    b = np.zeros(m1.npad)
                    b[: m1.npairs] = bounds[i1]
                    t1max = b.reshape(m1.npad // T1, T1).max(axis=1)
                    kept = int(np.sum(t1max * tmax[tc.cls][j] > thr))
                else:
                    kept = sum(1 for i in range(m1.npad // T1) if i * T1 < m1.npairs)
                tc.cost += kept * u
        # LPT balance over devices
        load = np.zeros(self.ndev)
        width = np.zeros(self.ndev, dtype=np.int64)
        for tc in sorted(tcols, key=lambda t: -t.cost):
            d = int(np.argmin(load))
            tc.device = d
            load[d] += tc.cost
            width[d] += tc.width
        self.Mcap = int(width.max()) if tcols else 0
        # local bases, in (class, tj) order per device for locality
        cursor = np.zeros(self.ndev, dtype=np.int64)
        for tc in tcols:  # tcols already in (class, tj) order
            tc.local = int(cursor[tc.device])
            cursor[tc.device] += tc.width
        self._tcols = tcols

        # colperm: (ndev, Mcap) canonical column per local slot, -1 padding
        colperm = np.full((self.ndev, self.Mcap), -1, dtype=np.int64)
        for tc in tcols:
            colperm[tc.device, tc.local : tc.local + tc.width] = (
                tc.base + np.arange(tc.width)
            )
        self._colperm = colperm
        # permidx: canonical column -> position in the all-gathered slab
        permidx = np.full(self.M, -1, dtype=np.int64)
        for d in range(self.ndev):
            slots = colperm[d]
            live = slots >= 0
            permidx[slots[live]] = d * self.Mcap + np.flatnonzero(live)
        self._permidx = permidx

        # scratch strip: widest ket tile-column (target for all-pad devices)
        self.Wscr = max((tc.width for tc in tcols), default=0)

        # --- weights / index maps (canonical, then localized per device)
        row_i, row_j, dup = pair_row_ao(layout)
        nao = self.nao
        pad = row_i < 0
        ci = np.where(pad, 0, row_i).astype(np.int64)
        cj = np.where(pad, 0, row_j).astype(np.int64)
        dead = pad | dup
        wj = np.where(dead, 0.0, np.where(ci == cj, 1.0, 2.0))
        wk = np.where(dead, 0.0, np.where(ci == cj, 0.5, 1.0))
        pidx = ci * nao + cj
        colA = ci * nao + cj
        colB = cj * nao + ci
        cp = np.clip(colperm, 0, None).reshape(-1)
        padslot = (colperm < 0).reshape(-1)
        self._pidx_l = jnp.asarray(np.where(padslot, 0, pidx[cp]).astype(np.int32))
        self._wj_l = jnp.asarray(np.where(padslot, 0.0, wj[cp]))
        self._wk_l = jnp.asarray(np.where(padslot, 0.0, wk[cp]))
        self._colA_l = jnp.asarray(np.where(padslot, 0, colA[cp]).astype(np.int32))
        self._colB_l = jnp.asarray(np.where(padslot, 0, colB[cp]).astype(np.int32))
        self._pmap_flat = jnp.asarray(layout.pmap)
        self._pmap2 = jnp.asarray(layout.pmap.reshape(nao, nao))
        self._permidx_pmap2 = jnp.asarray(
            permidx[layout.pmap].astype(np.int32)
        )  # (nao^2,) — every real AO pair's column is assigned somewhere

        # --- ordered class-pair tasks with per-device tile lists
        self._tasks = self._plan_tasks(metas, bounds, thr, T2s, tmax)
        self._prepared = None

    # ------------------------------------------------------------------ plan

    def _plan_tasks(self, metas, bounds, thr, T2s, tmax):
        cols_by_cls: dict[int, list[_TileColumn]] = {}
        for tc in self._tcols:
            cols_by_cls.setdefault(tc.cls, []).append(tc)
        tasks = []
        mode = self.engine._mode
        for i1, m1 in enumerate(metas):
            for i2, m2 in enumerate(metas):
                if i2 not in cols_by_cls:
                    continue
                T1, _ = _tile_shapes(m1, m2)
                T2 = T2s[i2]
                kmode = mode
                if mode in ("df", "pallas") and not self.engine._df_in_range(m1, m2):
                    kmode = "f64"
                L_tot = m1.la + m1.lb + m2.la + m2.lb
                if kmode == "pallas" and L_tot > _PL_MAX_L:
                    kmode = "f64"
                if bounds is not None:
                    b = np.zeros(m1.npad)
                    b[: m1.npairs] = bounds[i1]
                    t1max = b.reshape(m1.npad // T1, T1).max(axis=1)
                else:
                    t1max = np.ones(m1.npad // T1)
                per_dev: list[list[tuple[int, int, int]]] = [
                    [] for _ in range(self.ndev)
                ]
                for tc in cols_by_cls[i2]:
                    jb = tmax[i2][tc.tj // T2]
                    for i in range(m1.npad // T1):
                        if i * T1 >= m1.npairs:
                            break
                        if bounds is not None and t1max[i] * jb <= thr:
                            continue
                        per_dev[tc.device].append((i * T1, tc.tj, tc.local))
                lmax = max(len(x) for x in per_dev)
                if lmax == 0:
                    continue
                # pad: repeat last real tile (idempotent); all-pad devices
                # aim their dummy tile at the scratch strip
                for d in range(self.ndev):
                    if per_dev[d]:
                        per_dev[d] += [per_dev[d][-1]] * (lmax - len(per_dev[d]))
                    else:
                        per_dev[d] = [(0, 0, self.Mcap)] * lmax
                per_tile = _tile_units(m1, m2, T1, T2)
                seg = min(lmax, max(1, int(SEG_UNITS // max(per_tile, 1.0))))
                nseg = -(-lmax // seg)
                arr = np.asarray(per_dev, dtype=np.int32)  # (ndev, lmax, 3)
                if nseg * seg > lmax:
                    padn = nseg * seg - lmax
                    arr = np.concatenate([arr, np.repeat(arr[:, -1:], padn, 1)], 1)
                segments = [
                    jnp.asarray(
                        arr[:, s * seg : (s + 1) * seg].reshape(self.ndev * seg, 3)
                    )
                    for s in range(nseg)
                ]
                tasks.append((
                    f"v2s_{m1.la}{m1.lb}_{m2.la}{m2.lb}",
                    self._make_program(i1, i2, m1, m2, T1, T2, kmode),
                    segments,
                    (i1, i2, "df" if kmode in ("df", "pallas") else "f64"),
                ))
        return tasks

    def _make_program(self, i1, i2, m1, m2, T1, T2, kernel):
        A, C = m1.A, m2.A
        rb = m1.row_base
        Lb, Lk = m1.la + m1.lb, m2.la + m2.lb
        mesh, ax = self.mesh, self.axis

        def block_program(slab, xs, *ops):
            def body(carry, x):
                ti, tj, cloc = x[0], x[1], x[2]
                zero = jnp.zeros((), ti.dtype)
                sl = lambda arr, t, T: jax.lax.dynamic_slice(
                    arr, (t,) + (zero,) * (arr.ndim - 1), (T,) + arr.shape[1:]
                )
                if kernel in ("df", "pallas"):
                    from qchem_rs_tpu.ops.eri_pallas import tile_vals_pallas

                    tile_fn = (
                        tile_vals_pallas if kernel == "pallas" else _tile_vals_df
                    )
                    E1, p1h, p1l, P1h, P1l, E2, p2h, p2l, P2h, P2l = ops
                    vals = tile_fn(
                        Lb, Lk,
                        sl(E1, ti, T1),
                        (sl(p1h, ti, T1), sl(p1l, ti, T1)),
                        (sl(P1h, ti, T1), sl(P1l, ti, T1)),
                        sl(E2, tj, T2),
                        (sl(p2h, tj, T2), sl(p2l, tj, T2)),
                        (sl(P2h, tj, T2), sl(P2l, tj, T2)),
                    )
                else:
                    E1, p1, P1, E2, p2, P2 = ops
                    vals = _tile_vals(
                        Lb, Lk,
                        sl(E1, ti, T1), sl(p1, ti, T1), sl(P1, ti, T1),
                        sl(E2, tj, T2), sl(p2, tj, T2), sl(P2, tj, T2),
                    )
                carry = jax.lax.dynamic_update_slice(
                    carry, vals.astype(carry.dtype), (rb + ti * A, cloc)
                )
                return carry, None

            slab, _ = jax.lax.scan(body, slab, xs)
            return slab

        def sharded(slab, xs, *ops):
            return _shard_map(
                block_program, mesh,
                in_specs=(P(None, ax), P(ax)) + tuple(P() for _ in ops),
                out_specs=P(None, ax),
            )(slab, xs, *ops)

        return jax.jit(sharded, donate_argnums=(0,) if DONATE_CARRY else ())

    # ----------------------------------------------------------------- build

    def build(self):
        """All ordered class-pair tile scans -> sharded V2f (M, ndev*Mcap),
        device-local column layout, scratch strip dropped."""
        mesh, ax = self.mesh, self.axis
        wide = self.Mcap + self.Wscr
        slab = jax.device_put(
            jnp.zeros((self.M, self.ndev * wide), jnp.float64),
            NamedSharding(mesh, P(None, ax)),
        )
        for _name, prog, segments, ospec in self._tasks:
            i1, i2, okind = ospec
            ops = self.engine.operand_arrays(i1, i2, okind)
            for xs in segments:
                slab = prog(slab, xs, *ops)
        if self.Wscr == 0:
            return slab

        def drop_scratch(s):
            return s[:, : self.Mcap]

        return jax.jit(_shard_map(
            drop_scratch, mesh, in_specs=P(None, ax), out_specs=P(None, ax)
        ), donate_argnums=(0,))(slab)

    def _build_w(self, V2f):
        """Sharded exchange matrix W (nao^2, ndev*Mcap): AO-row scan; each
        step all-gathers one (nao, M) row-slab over ICI, reorders through
        the fixed permutation, and takes only the LOCAL exchange columns."""
        nao = self.nao
        mesh, ax = self.mesh, self.axis
        pmap2 = self._pmap2
        permsel = self._permidx_pmap2

        def local(Vloc, colA, colB):
            def row(_, pmap_i):
                y = jnp.take(Vloc, pmap_i, axis=0)  # (nao, Mcap) local rows
                y_all = jax.lax.all_gather(y, ax, axis=1, tiled=True)
                yf = jnp.take(y_all, permsel, axis=1)  # (nao, nao^2) canonical
                yt = yf.reshape(nao, nao, nao).transpose(1, 0, 2).reshape(
                    nao, nao * nao
                )
                Wb = jnp.take(yt, colA, axis=1) + jnp.take(yt, colB, axis=1)
                return None, Wb  # (nao, Mcap) local W columns

            _, W = jax.lax.scan(row, None, pmap2)
            return W.reshape(nao * nao, Vloc.shape[1])

        return jax.jit(_shard_map(
            local, mesh,
            in_specs=(P(None, ax), P(ax), P(ax)),
            out_specs=P(None, ax),
        ))(V2f, self._colA_l, self._colB_l)

    def prepare(self, force: bool = False):
        if force or self._prepared is None:
            V2f = self.build()
            self._prepared = (V2f, self._build_w(V2f))
        return self._prepared

    @property
    def jk_operands(self):
        return self.prepare()

    # ------------------------------------------------------------------- J/K

    def jk_cart(self, D, V2f, W):
        """Traceable J/K: local matvec + one psum each."""
        nao = self.nao
        mesh, ax = self.mesh, self.axis
        pmap_flat = self._pmap_flat

        def local(D, Vloc, Wloc, pidx_l, wj_l, wk_l):
            Dflat = D.reshape(-1)
            dpair = jnp.take(Dflat, pidx_l)  # (Mcap,)
            Jp = jax.lax.psum(Vloc @ (dpair * wj_l), ax)  # (M,)
            J = jnp.take(Jp, pmap_flat).reshape(nao, nao)
            K = jax.lax.psum(Wloc @ (dpair * wk_l), ax).reshape(nao, nao)
            return J, K

        return _shard_map(
            local, mesh,
            in_specs=(P(), P(None, ax), P(None, ax), P(ax), P(ax), P(ax)),
            out_specs=(P(), P()),
        )(D, V2f, W, self._pidx_l, self._wj_l, self._wk_l)

    def jk_sph(self, D, V2f, W):
        if self.system.spherical:
            T = jnp.asarray(self.system.sph_T)
            J, K = self.jk_cart(T @ D @ T.T, V2f, W)
            return T.T @ J @ T, T.T @ K @ T
        return self.jk_cart(D, V2f, W)

    def jk(self, D):
        V2f, W = self.prepare()
        if not hasattr(self, "_jk_jit"):
            self._jk_jit = jax.jit(self.jk_sph)
        return self._jk_jit(jnp.asarray(D), V2f, W)

    # ------------------------------------------------------- MO contractions

    def _v2f(self):
        """The sharded V2f alone — without paying the W build when only
        correlation transforms need the integrals (models/mp2.py)."""
        if self._prepared is not None:
            return self._prepared[0]
        if getattr(self, "_v2_only", None) is None:
            self._v2_only = self.build()
        return self._v2_only

    def mo_pair_contract(self, U):
        """U^T V2f U for an (M, m) MO pair-distribution matrix in CANONICAL
        row order (models/mp2.py builds it): each device contracts its
        column slab against the permuted-row copy of U, one psum at the
        end. Per-device peak: slab + U + the (m, Mcap) half-transform —
        the no-n^4 MP2 transform at 1/ndev memory with the V2 build itself
        already sharded."""
        mesh, ax = self.mesh, self.axis
        cp = np.clip(self._colperm, 0, None).reshape(-1).astype(np.int32)
        mask = (self._colperm >= 0).reshape(-1)
        V2f = self._v2f()

        def local(U, Vloc, cp_l, mask_l):
            Up = jnp.take(U, cp_l, axis=0) * mask_l[:, None]
            t = U.T @ Vloc  # (m, Mcap)
            return jax.lax.psum(t @ Up, ax)

        return jax.jit(_shard_map(
            local, mesh,
            in_specs=(P(), P(None, ax), P(ax), P(ax)),
            out_specs=P(),
        ))(U, V2f, jnp.asarray(cp), jnp.asarray(mask))
