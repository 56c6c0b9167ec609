"""Integral-direct Fock builds: Schwarz-screened J/K without materializing
the ERI tensor.

This is the scale path the reference lacks entirely — it always materializes
the dense n^4 tensor (rhf.rs:45,58-62, its binding scale limit; SURVEY.md §5
"long-context" analogue). Here shell quartets are enumerated once per
geometry, Schwarz-screened with |(P|Q)| <= q_P q_Q, packed into static-shape
chunks, and every SCF iteration recomputes ERI values on the fly and
contracts them straight into J and K.

8-fold symmetry handling: each unique shell quartet is applied through all 8
index images with its value pre-scaled by 1/((1+d_ij)(1+d_kl)(1+d_PQ)) so
coincident images sum to weight one. J and K accumulate via scatter-add.

The same chunk machinery backs the multi-chip sharded Fock build
(qchem_rs_tpu/parallel/fock_sharded.py): quartet chunks are sharded across
the mesh and partial J/K reduced with psum over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.angular import ncart
from qchem_rs_tpu.ops.eri import PairGroup, _eri_chunk_core, build_pair_groups
from qchem_rs_tpu.utils.system import MolecularSystem


def schwarz_bounds(groups: list[PairGroup]) -> list[np.ndarray]:
    """q_P = sqrt(max_component (P|P)) per pair, per group (host numpy).

    One jitted program for all groups (fewer compiles exposed to the flaky
    remote compile helper)."""

    def all_bounds():
        out = []
        for g in groups:
            vals = _eri_chunk_core(g.L, g.L, g.E, g.p, g.P, g.E, g.p, g.P)  # (n, A, A)
            out.append(jnp.max(jnp.abs(jnp.diagonal(vals, axis1=1, axis2=2)), axis=1))
        return tuple(out)

    return [np.sqrt(np.asarray(q)) for q in jax.jit(all_bounds)()]


@dataclasses.dataclass
class QuartetBlock:
    """A screened, padded batch of shell quartets for one class pair."""

    g1: int  # index into the pair-group list
    g2: int
    br: np.ndarray  # (nq_padded,) bra pair index (into group g1)
    kt: np.ndarray  # (nq_padded,) ket pair index (into group g2)
    weight: np.ndarray  # (nq_padded,) symmetry weight (0 for padding)
    nq: int  # true quartet count


def screened_quartets(
    groups: list[PairGroup],
    schwarz: list[np.ndarray] | None = None,
    threshold: float = 1e-12,
    chunk_multiple: int = 256,
) -> list[QuartetBlock]:
    """Enumerate unique shell quartets above the Schwarz threshold.

    Host-side O(npairs^2) work, done in the C++ runtime (cxx/screen.cpp via
    ctypes) when available, numpy otherwise. Weights fold the 8-fold
    coincidence scaling: w = 1/((1+d_ij)(1+d_kl)(1+d_PQ)).
    """
    from qchem_rs_tpu.utils.native import screened_quartets_native

    blocks: list[QuartetBlock] = []
    for i1, g1 in enumerate(groups):
        for i2 in range(i1, len(groups)):
            g2 = groups[i2]
            same_group = i2 == i1
            q1 = schwarz[i1] if schwarz is not None else np.ones(g1.npairs)
            q2 = schwarz[i2] if schwarz is not None else np.ones(g2.npairs)
            tau = threshold if schwarz is not None else 0.0
            native = screened_quartets_native(
                g1.i_shell, g1.j_shell, g2.i_shell, g2.j_shell,
                q1, q2, same_group, tau,
            )
            if native is not None:
                br, kt, w = native
            else:
                if same_group:
                    br, kt = np.triu_indices(g1.npairs)
                else:
                    br, kt = np.meshgrid(
                        np.arange(g1.npairs), np.arange(g2.npairs), indexing="ij"
                    )
                    br, kt = br.ravel(), kt.ravel()
                if tau > 0:
                    keep = q1[br] * q2[kt] > tau
                    br, kt = br[keep], kt[keep]
                w = np.ones(len(br))
                w /= 1.0 + (g1.i_shell[br] == g1.j_shell[br])
                w /= 1.0 + (g2.i_shell[kt] == g2.j_shell[kt])
                if same_group:
                    w /= 1.0 + (br == kt)
            if len(br) == 0:
                continue
            nq = len(br)
            npad = (-nq) % chunk_multiple
            if npad:
                br = np.concatenate([br, np.zeros(npad, dtype=br.dtype)])
                kt = np.concatenate([kt, np.zeros(npad, dtype=kt.dtype)])
                w = np.concatenate([w, np.zeros(npad)])
            blocks.append(QuartetBlock(g1=i1, g2=i2, br=br, kt=kt, weight=w, nq=nq))
    return blocks


def block_chunks(blk: QuartetBlock, g1: PairGroup, g2: PairGroup, cap: int = 4096):
    """Pad a block's quartet list into (nchunks, chunk) device arrays with a
    class-specific chunk size (see eri._chunk_size)."""
    from qchem_rs_tpu.ops.eri import _chunk_size

    n = blk.nq
    # Chunk must be a power-of-two >= 1024: odd sizes (256, 1278) triggered
    # TPU kernel faults on this backend (miscompiles in the scan body), and
    # larger chunks reduce scan serialization. Capped by the padded-footprint
    # memory budget (_chunk_size).
    chunk = 1024
    while chunk * 2 <= min(cap, _chunk_size(g1, g2)):
        chunk *= 2
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    br = np.concatenate([blk.br[:n], np.zeros(pad, blk.br.dtype)])
    kt = np.concatenate([blk.kt[:n], np.zeros(pad, blk.kt.dtype)])
    w = np.concatenate([blk.weight[:n], np.zeros(pad)])
    return (
        jnp.asarray(br.astype(np.int32).reshape(nchunks, chunk)),
        jnp.asarray(kt.astype(np.int32).reshape(nchunks, chunk)),
        jnp.asarray(w.reshape(nchunks, chunk)),
    )


def _gather_block_args(g1: PairGroup, g2: PairGroup, br, kt, w):
    """Per-quartet device arrays for a chunk, gathered from group arrays.

    br/kt may be traced (e.g. inside lax.scan); w is the symmetry weight.
    Gathers run on 2D views with the trailing dims fused: gathering the 4D E
    directly materializes its tile-padded layout (small trailing dims pad to
    (8,128) under f64 emulation — gigabytes per chunk for s-classes).
    """
    ncA, ncB = ncart(g1.la), ncart(g1.lb)
    ncC, ncD = ncart(g2.la), ncart(g2.lb)
    ao_i = jnp.asarray(g1.ao_i.astype(np.int32))[br]
    ao_j = jnp.asarray(g1.ao_j.astype(np.int32))[br]
    ao_k = jnp.asarray(g2.ao_i.astype(np.int32))[kt]
    ao_l = jnp.asarray(g2.ao_j.astype(np.int32))[kt]
    n1 = br.shape[0]
    n2 = kt.shape[0]

    def g2d(arr, idx, n):
        flat = arr.reshape(arr.shape[0], -1)
        return flat[idx].reshape((n,) + arr.shape[1:])

    return dict(
        E1=g2d(g1.E, br, n1),
        p1=g1.p[br],
        P1=g2d(g1.P, br, n1),
        E2=g2d(g2.E, kt, n2),
        p2=g2.p[kt],
        P2=g2d(g2.P, kt, n2),
        w=w,
        ii=ao_i[:, None] + jnp.arange(ncA, dtype=jnp.int32)[None, :],  # (n, ncA)
        jj=ao_j[:, None] + jnp.arange(ncB, dtype=jnp.int32)[None, :],
        kk=ao_k[:, None] + jnp.arange(ncC, dtype=jnp.int32)[None, :],
        ll=ao_l[:, None] + jnp.arange(ncD, dtype=jnp.int32)[None, :],
    )


def _jk_block(Lbra, Lket, shape4, args, D, J, K, nao):
    """Accumulate one chunk's screened quartets into J and K."""
    vals = _eri_chunk_core(
        Lbra, Lket, args["E1"], args["p1"], args["P1"], args["E2"], args["p2"], args["P2"]
    )
    ncA, ncB, ncC, ncD = shape4
    n = vals.shape[0]
    vals = vals.reshape(n, ncA, ncB, ncC, ncD) * args["w"][:, None, None, None, None]
    ii, jj, kk, ll = args["ii"], args["jj"], args["kk"], args["ll"]

    # all 8 symmetry images: (bra-slot pair, ket-slot pair) with value axes
    # tracking which AO array fills which slot; fused into ONE scatter-add
    # each for J and K (scatters dominate TPU compile time)
    images = (
        (ii, jj, kk, ll, "nabcd"),
        (jj, ii, kk, ll, "nbacd"),
        (ii, jj, ll, kk, "nabdc"),
        (jj, ii, ll, kk, "nbadc"),
        (kk, ll, ii, jj, "ncdab"),
        (ll, kk, ii, jj, "ndcab"),
        (kk, ll, jj, ii, "ncdba"),
        (ll, kk, jj, ii, "ndcba"),
    )
    j_idx, j_val, k_idx, k_val = [], [], [], []
    for (w_, x_, y_, z_, order) in images:
        o1, o2, o3, o4 = order[1], order[2], order[3], order[4]
        # J[w,x] += v * D[y,z]
        Dg = D[y_[:, :, None], z_[:, None, :]]  # (n, |y|, |z|)
        Jblk = jnp.einsum(f"nabcd,n{o3}{o4}->n{o1}{o2}", vals, Dg)
        j_idx.append((w_[:, :, None] * nao + x_[:, None, :]).reshape(-1))
        j_val.append(Jblk.reshape(-1))
        # K[w,y] += v * D[x,z]
        Dg2 = D[x_[:, :, None], z_[:, None, :]]
        Kblk = jnp.einsum(f"nabcd,n{o2}{o4}->n{o1}{o3}", vals, Dg2)
        k_idx.append((w_[:, :, None] * nao + y_[:, None, :]).reshape(-1))
        k_val.append(Kblk.reshape(-1))
    J = J.at[jnp.concatenate(j_idx)].add(jnp.concatenate(j_val))
    K = K.at[jnp.concatenate(k_idx)].add(jnp.concatenate(k_val))
    return J, K


def eri_terms(
    system: MolecularSystem,
    positions=None,
    screening_threshold: float = 0.0,
) -> jnp.ndarray:
    """The RHF operator tensor terms[i,j,k,l] = (ij|kl) - 1/2 (ik|jl)
    (rhf.rs:58-62) via the scatter-free tiled pair-space engine
    (ops/eri_tiled.py). Traceable in ``positions`` for conformer sweeps."""
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

    nao = system.n_basis()
    eng = TiledEriEngine(system, screening_threshold, positions=positions)
    terms = eng.finish_terms(eng.build())
    return terms.reshape(nao, nao, nao, nao)


class DirectFockBuilder:
    """Integral-direct screened J/K builder for one geometry.

    Usage:
        builder = DirectFockBuilder(system, threshold=1e-12)
        J, K = builder.jk(D)        # D (nao, nao) -> J, K (nao, nao)
    """

    def __init__(
        self,
        system: MolecularSystem,
        threshold: float = 1e-12,
        positions=None,
        chunk_quartets: int = 4096,
    ):
        self.system = system
        self.nao = system.n_basis_cart()
        self.groups = build_pair_groups(system, positions)
        self.schwarz = schwarz_bounds(self.groups)
        self.blocks = screened_quartets(
            self.groups, self.schwarz, threshold, chunk_multiple=1
        )
        self.chunk_quartets = chunk_quartets
        # per block: static meta + (nchunks, chunk) index/weight arrays; the
        # per-quartet data is gathered inside the scan body so the whole J/K
        # build is ONE compiled program with one HLO copy per quartet class.
        # Chunk sizes are class-specific (eri._chunk_size caps the padded
        # footprint of the dot-operand materialization).
        self._scan_blocks = []
        for blk in self.blocks:
            g1, g2 = self.groups[blk.g1], self.groups[blk.g2]
            shape4 = (ncart(g1.la), ncart(g1.lb), ncart(g2.la), ncart(g2.lb))
            xs = block_chunks(blk, g1, g2, cap=chunk_quartets)
            self._scan_blocks.append((g1, g2, shape4, xs))
        self._jk_jit = jax.jit(self._jk_impl)

    def _jk_impl(self, D):
        # component norms are already folded into the pair Hermite tensors
        # (ops/eri.py:_pair_hermite), so values are normalized-AO integrals
        if self.system.spherical:
            T = jnp.asarray(self.system.sph_T)
            J, K = self._jk_cart(T @ D @ T.T)
            return T.T @ J @ T, T.T @ K @ T
        return self._jk_cart(D)

    def _jk_cart(self, D):
        nao = self.nao
        J = jnp.zeros(nao * nao)
        K = jnp.zeros(nao * nao)

        for (g1, g2, shape4, xs) in self._scan_blocks:
            def body(carry, x, g1=g1, g2=g2, shape4=shape4):
                Jc, Kc = carry
                br, kt, w = x
                args = _gather_block_args(g1, g2, br, kt, w)
                Jc, Kc = _jk_block(g1.L, g2.L, shape4, args, D, Jc, Kc, nao)
                return (Jc, Kc), None

            (J, K), _ = jax.lax.scan(body, (J, K), xs)
        return J.reshape(nao, nao), K.reshape(nao, nao)

    def jk(self, D):
        return self._jk_jit(D)
