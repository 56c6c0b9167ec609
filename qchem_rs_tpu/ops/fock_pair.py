"""Pair-space J/K Fock builds: the no-n^4 scale path.

The reference materializes the dense n^4 ERI tensor and an n^4 operator
table (/root/reference/core/src/hf/rhf.rs:45,58-62) — its binding scale
limit. The round-1 integral-direct builder here avoided the n^4 memory but
recomputed every integral each SCF iteration through a scatter-add
architecture the round-2 profiling measured at ~99% of runtime.

This module replaces both with two pair-space MATRICES built once per
geometry (no scatters, no recomputation, no n^4 tensor):

- ``V2f[(ij),(kl)] = (ij|kl)``: the symmetric pair-space ERI matrix from
  the tiled engine (ops/eri_tiled.py), mirrored. Coulomb is one matvec:
      J[(ij)] = sum_(kl) V2f[(ij),(kl)] * w_kl * D[kl],  w = 2 - delta_kl.
- ``W[(i,k),(jl)] = (ij|kl) + (il|kj)``: the exchange-ordered matrix, built
  once from V2f by an AO-row scan of row/column takes (the same
  gather pattern as the in-core finish programs — no scatters). Exchange is
  then also one matvec:
      K[(i,k)] = sum_(jl) W[(i,k),(jl)] * wk_jl * D[jl],
  with wk = 1 (j != l), 1/2 (j = l; W double-counts the diagonal column).

Memory: V2f is ~(n^2/2)^2 and W is n^2 x n^2/2 — together ~3/4 of ONE n^4
tensor, with no transpose peaks (the in-core terms path holds V2f + e4 +
terms). Per-iteration cost: two memory-bound matvecs (MXU-fed), no gathers.

W keys the rows by ORDERED (i,k) (full n^2) so the row-scan writes
contiguous (nao, M) blocks — pair-space rows would scatter.
"""

from __future__ import annotations

from functools import partial
import os

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine
from qchem_rs_tpu.utils.system import MolecularSystem


def pair_row_ao(layout) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-V2-row AO indices (row_i, row_j) with -1 on padding rows, plus a
    ``dup`` mask: True on the redundant orientation rows of DIAGONAL shell
    pairs (a shell paired with itself stores both component orientations
    (a,b) and (b,a) as distinct V2 rows holding the same unordered AO pair —
    column sums over all rows must count each pair once)."""
    M = layout.M
    row_i = np.full(M, -1, dtype=np.int32)
    row_j = np.full(M, -1, dtype=np.int32)
    dup = np.zeros(M, dtype=bool)
    from qchem_rs_tpu.ops.angular import ncart

    for g, m in zip(layout.groups, layout.metas):
        ncA, ncB = ncart(g.la), ncart(g.lb)
        comp_dup = (np.arange(ncA)[:, None] < np.arange(ncB)[None, :]).reshape(-1)
        for k in range(g.npairs):
            base = m.row_base + k * m.A
            ii = g.ao_i[k] + np.arange(ncA)
            jj = g.ao_j[k] + np.arange(ncB)
            rows = base + (np.arange(ncA)[:, None] * ncB + np.arange(ncB)[None, :])
            row_i[rows.reshape(-1)] = np.repeat(ii, ncB)
            row_j[rows.reshape(-1)] = np.tile(jj, ncA)
            if g.i_shell[k] == g.j_shell[k]:
                dup[rows.reshape(-1)] = comp_dup
    return row_i, row_j, dup


def _mirror(V2):
    M = V2.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    return jnp.where(r > c, V2.T, V2)


def mirror_inplace(V2, block: int = 2048):
    """V2f from the upper-valid V2 with NO second (M, M) buffer.

    The elementwise ``where(r > c, V2.T, V2)`` form reads a full transpose,
    so XLA cannot alias the donated input to the output — the runtime
    prints "donated buffers were not usable: float64[M,M]" and the prepare
    step holds TWO (M, M) buffers. At naphthalene/cc-pVDZ scale (M = 22272,
    4 GB each) that plus W (6.4 GB) RESOURCE_EXHAUSTED a 16 GB chip
    (round-5 session phase 4). This version fills the strictly-lower blocks
    by transposing the mirrored upper blocks with dynamic_update_slice —
    a carry-style program donation CAN alias — so peak is V2 + one
    (block, block) temp."""
    M = V2.shape[0]
    nb = -(-M // block)
    for bi in range(nb):  # target (lower-triangle) row block
        r0 = bi * block
        rh = min(block, M - r0)
        for bj in range(bi + 1):
            c0 = bj * block
            cw = min(block, M - c0)
            if bi == bj:
                blk = jax.lax.dynamic_slice(V2, (r0, c0), (rh, cw))
                r = jax.lax.broadcasted_iota(jnp.int32, (rh, cw), 0)
                c = jax.lax.broadcasted_iota(jnp.int32, (rh, cw), 1)
                blk = jnp.where(r > c, blk.T, blk)
            else:
                blk = jax.lax.dynamic_slice(V2, (c0, r0), (cw, rh)).T
            V2 = jax.lax.dynamic_update_slice(V2, blk, (r0, c0))
    return V2


def build_w(V2f, pmap2, colA, colB):
    """Exchange-ordered W (nao^2, M) from the mirrored pair matrix by an
    AO-row scan: per row i, gather the (nao, M) slab of (ij|..) rows, expand
    ket columns, transpose j<->k, and take the two exchange column maps.
    All data movement is row/column ``take`` — scatter-free."""
    nao = pmap2.shape[0]

    def row(_, pmap_i):
        y = jnp.take(V2f, pmap_i, axis=0)  # (nao, M): [(ij), (kl)-cols]
        yf = jnp.take(y, pmap2.reshape(-1), axis=1)  # (nao, nao^2): [j, k*n+l]
        yt = yf.reshape(nao, nao, nao).transpose(1, 0, 2).reshape(nao, nao * nao)
        Wb = jnp.take(yt, colA, axis=1) + jnp.take(yt, colB, axis=1)
        return None, Wb  # (nao, M): rows (i,k) for this i, all k

    _, W = jax.lax.scan(row, None, pmap2)
    return W.reshape(nao * nao, V2f.shape[1])


def exchange_lean_split(V2h, V2l, pmap2, D):
    """K from the (hi, lo)-f32 split pair matrix (lean mode's storage form,
    see ``PairSpaceFockBuilder._prep_jit``): the same AO-row gather pattern
    as ``exchange_lean``, with the f64 value reconstructed only at the
    (nao, nao^2) slab scale. No (M, M)-shaped f64 op ever exists in the
    program — the emulated-f64 buffers the AOT planner blew up on
    (f32[8, M, M] = 19.3 GB at naphthalene/cc-pVDZ, docs/PROFILE_r05.md)
    are structurally gone."""
    nao = pmap2.shape[0]
    pflat = pmap2.reshape(-1)

    def row(_, pmap_i):
        yh = jnp.take(V2h, pmap_i, axis=0)  # (nao_j, Mp) f32
        yl = jnp.take(V2l, pmap_i, axis=0)
        yfh = jnp.take(yh, pflat, axis=1)  # (nao_j, nao_k * nao_l)
        yfl = jnp.take(yl, pflat, axis=1)
        yf = yfh.astype(jnp.float64) + yfl.astype(jnp.float64)
        # yt[k, j, l] = (ij|kl);  K_row[k] = sum_jl yt[k,j,l] D[j,l]
        yt = yf.reshape(nao, nao, nao).transpose(1, 0, 2)
        return None, jnp.einsum("kjl,jl->k", yt, D)

    _, K = jax.lax.scan(row, None, pmap2)
    return K  # (nao, nao)


def exchange_lean(V2f, pmap2, D):
    """K directly from the mirrored pair matrix: the SAME AO-row gather
    pattern as build_w, but contracted with the density IMMEDIATELY instead
    of stored — K_ik = sum_jl (ij|kl) D_jl with no (nao^2, M) matrix.

    Per call this re-reads V2f once through gathers (~2 x V2f bytes of HBM
    traffic, nao^3-scale MACs) — tens of ms at naphthalene scale — in
    exchange for dropping W's nao^2 x M buffer (7.1 GB at naphthalene/
    cc-pVDZ, which with V2f RESOURCE_EXHAUSTED the 16 GB chip in the
    round-5 sessions). Traceable; lives inside the jitted SCF loop."""
    nao = pmap2.shape[0]
    pflat = pmap2.reshape(-1)

    def row(_, pmap_i):
        y = jnp.take(V2f, pmap_i, axis=0)  # (nao_j, M)
        yf = jnp.take(y, pflat, axis=1)  # (nao_j, nao_k * nao_l)
        # yt[k, j, l] = (ij|kl);  K_row[k] = sum_jl yt[k,j,l] D[j,l]
        yt = yf.reshape(nao, nao, nao).transpose(1, 0, 2)
        return None, jnp.einsum("kjl,jl->k", yt, D)

    _, K = jax.lax.scan(row, None, pmap2)
    return K  # (nao, nao)


class PairSpaceFockBuilder:
    """J/K builder backed by the pair-space matrices V2f and W.

    Usage:
        builder = PairSpaceFockBuilder(system, threshold=1e-12)
        builder.prepare()            # V2 tile scans + mirror + W build
        J, K = builder.jk(D)         # two matvecs

    ``jk_cart``/``jk_operands`` expose a traceable form for jitted SCF
    loops: the (V2f, W) matrices are passed as ARGUMENTS, not closure
    constants (closure constants at GB scale bloat the executable and
    defeat donation).
    """

    def __init__(
        self,
        system: MolecularSystem,
        threshold: float = 1e-12,
        positions=None,
        engine: TiledEriEngine | None = None,
        lean: bool | None = None,
    ):
        self.system = system
        self.nao = system.n_basis_cart()
        self.engine = engine or TiledEriEngine(
            system, threshold, positions=positions
        )
        layout = self.engine.layout
        self.M = layout.M
        # lean mode: skip the W matrix, compute K per iteration from V2f
        # (exchange_lean). Auto: on when V2f + W would overrun the device
        # budget (QCHEM_PAIR_BUDGET bytes; accelerator default 12 GB of the
        # v5e's 16 — naphthalene/cc-pVDZ needs this, benzene does not).
        if lean is None:
            env = os.environ.get("QCHEM_PAIR_LEAN")
            if env is not None:
                lean = env == "1"
            else:
                # accelerator default 9 GB of the v5e's 16: the V2 build
                # itself peaks at V2 + per-class tile buffers (~2-3 GB) and
                # the W build transiently holds V2f + W + row slabs, so the
                # resident pair matrices must leave real headroom
                # (naphthalene/cc-pVDZ needs 11.93 GB resident and
                # RESOURCE_EXHAUSTED a 16 GB chip twice)
                budget = float(os.environ.get(
                    "QCHEM_PAIR_BUDGET",
                    9e9 if jax.default_backend() != "cpu" else 48e9,
                ))
                need = 8.0 * (self.M * self.M + self.nao**2 * self.M)
                lean = need > budget
        self.lean = lean
        row_i, row_j, dup = pair_row_ao(layout)
        nao = self.nao
        pad = row_i < 0
        ci = np.where(pad, 0, row_i).astype(np.int32)
        cj = np.where(pad, 0, row_j).astype(np.int32)
        dead = pad | dup
        # J: D-vector weights 2 - delta (both orderings of the ket pair)
        self._wj = jnp.asarray(np.where(dead, 0.0, np.where(ci == cj, 1.0, 2.0)))
        # K: W double-counts j = l columns -> half weight there
        self._wk = jnp.asarray(np.where(dead, 0.0, np.where(ci == cj, 0.5, 1.0)))
        self._pidx = jnp.asarray((ci * nao + cj).astype(np.int32))  # (M,)
        self._pmap2 = jnp.asarray(layout.pmap.reshape(nao, nao))
        self._colA = jnp.asarray((ci * nao + cj).astype(np.int32))
        self._colB = jnp.asarray((cj * nao + ci).astype(np.int32))
        self._prepared = None

    # --- one-time builds ---------------------------------------------------

    @property
    def _prep_jit(self):
        if not hasattr(self, "_pj"):
            if self.lean:
                # lean storage is the (hi, lo)-f32 SPLIT of the mirrored
                # pair matrix (same bytes as f64, but every downstream op
                # is native f32): J rides the double-float Pallas matvec
                # (ops/fock_matvec.py) and K reconstructs f64 only at
                # (nao, nao^2) slab scale (exchange_lean_split). Keeping
                # V2f as a plain f64 (M, M) operand made the jk program's
                # emulated-f64 matvec plan an f32[8, M, M] = 4x V2 buffer
                # — RESOURCE_EXHAUSTED at naphthalene/cc-pVDZ (r5f).
                from qchem_rs_tpu.ops import fock_matvec as fm

                # THREE programs, not one: a fused mirror+split donates an
                # f64 V2 whose buffer CANNOT alias the f32 outputs ("donated
                # buffers were not usable"), so the single-program prep
                # transiently held V2 + V2f + hi + lo = 3x the pair matrix
                # (14.5 GB at naphthalene scale -> r5h RESOURCE_EXHAUSTED).
                # Split up: mirror aliases f64->f64 in place; hi keeps V2f
                # alive (2.5x); lo donates V2f (freed on completion, peak 3x
                # -> 9.7 GB, resident 1x after).
                mp = fm.padded_m(self.M)
                pad = ((0, mp - self.M), (0, mp - self.M))

                def _hi(V2f):
                    return jnp.pad(V2f.astype(jnp.float32), pad)

                def _lo(V2f, hi):
                    unpad = hi[: self.M, : self.M]
                    return jnp.pad(
                        (V2f - unpad.astype(jnp.float64)).astype(jnp.float32),
                        pad,
                    )

                mirror_j = jax.jit(mirror_inplace, donate_argnums=(0,))
                hi_j = jax.jit(_hi)
                lo_j = jax.jit(_lo, donate_argnums=(0,))

                def prep(V2):
                    V2f = mirror_j(V2)
                    hi = hi_j(V2f)
                    lo = lo_j(V2f, hi)
                    return (hi, lo), None

                self._pj = prep
                return self._pj
            else:
                def prep(V2):
                    V2f = mirror_inplace(V2)
                    W = build_w(V2f, self._pmap2, self._colA, self._colB)
                    return V2f, W

            self._pj = jax.jit(prep, donate_argnums=(0,))
        return self._pj

    def prepare(self, force: bool = False):
        """Build V2 (tile scans), mirror, and the exchange matrix W.

        ``force`` rebuilds even when cached — run entry points use it so a
        warm `restricted_hartree_fock` call still measures/performs the
        integral build (builder instances are cached per system)."""
        if force or self._prepared is None:
            from qchem_rs_tpu.ops.eri_tiled import _mem_log

            V2 = self.engine.build()
            _mem_log("pre-prep (V2 built)")
            self._prepared = self._prep_jit(V2)
            _mem_log("post-prep")
        return self._prepared

    @property
    def jk_operands(self):
        return self.prepare()

    # --- traceable J/K -----------------------------------------------------

    def jk_cart(self, D, V2f, W):
        """Cartesian-AO J and K from density D (nao, nao). Traceable; V2f/W
        arrive as operands (W is None in lean mode -> row-scan exchange)."""
        nao = self.nao
        Dflat = D.reshape(-1)
        dJ = jnp.take(Dflat, self._pidx) * self._wj  # (M,)
        if W is None:
            # lean: V2f is the (hi, lo)-f32 split (padded to the matvec
            # block grid); J through the Pallas df matvec, K through the
            # slab-scale row scan — no (M, M) f64 op in the program
            from qchem_rs_tpu.ops import fock_matvec as fm

            V2h, V2l = V2f
            m = int(self._pidx.shape[0])
            Jp = fm.matvec_df(V2h, V2l, dJ, m)  # (M,)
            K = exchange_lean_split(V2h, V2l, self._pmap2, D)
        else:
            Jp = V2f @ dJ  # (M,)
            dK = jnp.take(Dflat, self._pidx) * self._wk
            K = (W @ dK).reshape(nao, nao)
        J = jnp.take(Jp, self._pmap2.reshape(-1)).reshape(nao, nao)
        return J, K

    def jk_sph(self, D, V2f, W):
        """J/K in the system's working basis: spherical densities are mapped
        to Cartesian and back (the pair matrices are Cartesian — the
        spherical projection is two cheap (nsph, ncart) sandwiches, exactly
        as the direct builder did)."""
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


class PairSpaceShardedFockBuilder(PairSpaceFockBuilder):
    """Pair-space J/K with the pair axis (M) sharded over a device mesh.

    Both matrices are column-sharded on the pair axis — V2f (M, M/ndev) and
    W (nao^2, M/ndev) per device — so per-device HBM scales as 1/ndev (the
    multi-chip continuation of the no-n^4 design; the reference is bound by
    one host's memory, rhf.rs:45,58-62). J and K are then
    contraction-over-M matvecs: each device contracts its column slab and
    XLA/GSPMD inserts the psum over ICI (SURVEY.md §2.2 item 1). No
    shard_map needed — the shardings on the operands drive the partitioner,
    which is the idiomatic sharding story for plain dense algebra.

    M is always a multiple of 8 (pair counts pad to powers of two >= 8, or
    to 128 on accelerators — eri_tiled.PairSpaceLayout), so any power-of-two
    mesh divides it evenly.
    """

    def __init__(self, system, mesh, axis: str = "q", **kw):
        # sharded columns already divide the footprint by ndev; the lean
        # trade (per-iteration gathers for W's memory) is a single-device
        # concern — keep the matvec form unless explicitly requested
        kw.setdefault("lean", False)
        super().__init__(system, **kw)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape[axis]
        if self.M % ndev:
            raise ValueError(f"pair count M={self.M} not divisible by mesh axis {ndev}")
        self._col_sharding = NamedSharding(mesh, P(None, axis))

    @property
    def _prep_jit(self):
        # mirror + W build with SHARDED outputs: GSPMD partitions the column
        # gathers so W (the largest matrix) is produced directly into its
        # 1/ndev-per-device layout instead of materializing unsharded and
        # re-distributing. The V2 tile scans themselves still run on the
        # default device — the O(M^2) V2 carry is this builder's
        # single-device high-water mark; when even that doesn't fit, use
        # parallel/v2_sharded.ColumnShardedPairFockBuilder, which assembles
        # the slabs directly on their devices (no (M, M) anywhere, at 2x
        # the integral FLOPs).
        if not hasattr(self, "_pj"):
            def prep(V2):
                V2f = mirror_inplace(V2)
                W = build_w(V2f, self._pmap2, self._colA, self._colB)
                return V2f, W

            self._pj = jax.jit(
                prep,
                donate_argnums=(0,),
                out_shardings=(self._col_sharding, self._col_sharding),
            )
        return self._pj
