"""Two-electron repulsion integrals (ERI) and shell-pair machinery.

Replaces ``molint::eri`` / ``molint::storage::EriTensor`` (consumed at
/root/reference/core/src/hf/rhf.rs:45 and uhf.rs:55). Chemists' notation
(ij|kl) throughout, 8-fold permutational symmetry exploited at the
shell-quartet level.

TPU-first structure (see SURVEY.md §7): shell pairs are precomputed per
(la, lb) class into dense **Hermite charge distributions**
``E[pair, prim, compAB, tuv]`` (contraction coefficients and Cartesian
normalization folded in). A quartet batch then only needs

    R2[n, a, c, s1, s2] = pref * (-1)^{|s2|} * R_{s1+s2}(alpha, P - Q)
    (ij|kl)[n, A, C]    = E_bra[n,a,A,s1] . R2[n,a,c,s1,s2] . E_ket[n,c,C,s2]

i.e. a Boys/Hermite elementwise stage (VPU) followed by two batched
contractions (MXU). Everything is chunked with static shapes; padded quartets
scatter into a dump slot.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.angular import cart_components, component_norms, ncart
from qchem_rs_tpu.ops.mcmurchie import (
    hermite_components,
    hermite_expansion_dense,
    hermite_index,
    nhermite,
    r_table,
)
from qchem_rs_tpu.utils.system import MolecularSystem



@dataclasses.dataclass
class PairGroup:
    """All unique shell pairs of one (la, lb) class, la >= lb, as batched
    device arrays. Hermite charge distributions have contraction coefficients
    and per-component norms folded in."""

    la: int
    lb: int
    i_shell: np.ndarray  # (n,) global shell index (class la member)
    j_shell: np.ndarray  # (n,)
    ao_i: np.ndarray  # (n,) AO offset of shell i
    ao_j: np.ndarray  # (n,)
    p: jax.Array  # (n, Kab) combined exponents, prim axes merged
    P: jax.Array  # (n, Kab, 3) gaussian product centers
    E: jax.Array  # (n, Kab, ncompAB, nhermite(la+lb))

    @property
    def npairs(self) -> int:
        return len(self.ao_i)

    @property
    def L(self) -> int:
        return self.la + self.lb


@partial(jax.jit, static_argnums=(0, 1))
def _pair_hermite(la, lb, a, b, cc, A, B, AB):
    """E (n, Ka*Kb, ncompAB, S), p (n, Ka*Kb), P (n, Ka*Kb, 3)."""
    p = a + b  # (n, Ka, Kb)
    P = (a[..., None] * A[:, None, None, :] + b[..., None] * B[:, None, None, :]) / p[..., None]
    E = hermite_expansion_dense(la, lb, a, b, AB)  # (n, Ka, Kb, Acomp, S)
    E = E * cc[..., None, None]
    norms = np.kron(component_norms(la), component_norms(lb))
    E = E * jnp.asarray(norms)[None, None, None, :, None]
    n, Ka, Kb = p.shape
    return (
        E.reshape(n, Ka * Kb, E.shape[3], E.shape[4]),
        p.reshape(n, Ka * Kb),
        P.reshape(n, Ka * Kb, 3),
    )


def build_pair_groups(system: MolecularSystem, positions=None) -> list[PairGroup]:
    """Unique shell pairs {i, j} grouped by unordered class pair (la >= lb).

    ``positions`` may be a traced (natom, 3) array for conformer sweeps.
    All per-class Hermite charge distributions are produced by ONE jitted
    program (minimizes the number of compiles exposed to the flaky remote
    compile helper; each eager compile is a crash opportunity).
    """
    if positions is None:
        positions = jnp.asarray(system.positions)
    metas = []
    classes = system.shell_classes
    ls = sorted(classes)
    for la in ls:
        for lb in [l for l in ls if l <= la]:
            ca, cb = classes[la], classes[lb]
            if la == lb:
                ii, jj = np.triu_indices(ca.nshells)
            else:
                ii, jj = np.meshgrid(np.arange(ca.nshells), np.arange(cb.nshells), indexing="ij")
                ii, jj = ii.ravel(), jj.ravel()
            if len(ii) == 0:
                continue
            metas.append((la, lb, ca, cb, ii, jj))

    def all_pairs(positions):
        out = []
        for (la, lb, ca, cb, ii, jj) in metas:
            a = jnp.asarray(ca.alphas[ii])[:, :, None]
            b = jnp.asarray(cb.alphas[jj])[:, None, :]
            cc = jnp.asarray(ca.coefs[ii])[:, :, None] * jnp.asarray(cb.coefs[jj])[:, None, :]
            A = positions[ca.atom_indices[ii]]
            B = positions[cb.atom_indices[jj]]
            AB = (A - B)[:, None, None, :]
            out.append(_pair_hermite(la, lb, a, b, cc, A, B, AB))
        return tuple(out)

    # cache the jitted program on the system: metas derive solely from its
    # (immutable) shell structure, so every call — including geometry rebinds
    # (eri_tiled.rebind_positions) — reuses one executable per shape
    jfn = getattr(system, "_all_pairs_jit", None)
    if jfn is None:
        jfn = jax.jit(all_pairs)
        system._all_pairs_jit = jfn
    tensors = jfn(positions)
    groups: list[PairGroup] = []
    for (la, lb, ca, cb, ii, jj), (E, p, P) in zip(metas, tensors):
        groups.append(
            PairGroup(
                la=la,
                lb=lb,
                i_shell=ca.shell_indices[ii],
                j_shell=cb.shell_indices[jj],
                ao_i=ca.ao_offsets[ii],
                ao_j=cb.ao_offsets[jj],
                p=p,
                P=P,
                E=E,
            )
        )
    return groups


@lru_cache(maxsize=None)
def _r2_gather(Lbra: int, Lket: int) -> tuple[np.ndarray, np.ndarray]:
    """Static gather plan: R2[s1, s2] = sign[s2] * Rfull[idx[s1, s2]]."""
    hb = hermite_components(Lbra)
    hk = hermite_components(Lket)
    index = hermite_index(Lbra + Lket)
    idx = np.empty((len(hb), len(hk)), dtype=np.int32)
    sign = np.empty(len(hk))
    for s2, (t2, u2, v2) in enumerate(hk):
        sign[s2] = (-1.0) ** (t2 + u2 + v2)
        for s1, (t1, u1, v1) in enumerate(hb):
            idx[s1, s2] = index[(t1 + t2, u1 + u2, v1 + v2)]
    return idx, sign


@lru_cache(maxsize=None)
def _r2m_plan(Lbra: int, Lket: int, a: int, c: int):
    """Static plan mapping the leading-axis R table (H, n, a*c) onto the
    fused quartet contraction matrix R2m[(a,s1), (c,s2), n]:

        h_arr[k, m]  = hermite_index(s1 + s2)
        ac_arr[k, m] = a_i * c + c_j
        sign[m]      = (-1)^{|s2|}
    """
    S1 = nhermite(Lbra)
    S2 = nhermite(Lket)
    idx, sign = _r2_gather(Lbra, Lket)
    ai = np.arange(a)[:, None, None, None]
    cj = np.arange(c)[None, None, :, None]
    h_arr = np.broadcast_to(idx[None, :, None, :], (a, S1, c, S2))
    ac_arr = np.broadcast_to((ai * c + cj), (a, S1, c, S2))
    h_arr = np.ascontiguousarray(h_arr.reshape(a * S1, c * S2), dtype=np.int32)
    ac_arr = np.ascontiguousarray(ac_arr.reshape(a * S1, c * S2), dtype=np.int32)
    sign_m = np.tile(sign, c)  # (c*S2,)
    return h_arr, ac_arr, sign_m


def _eri_chunk_core(Lbra: int, Lket: int, E1, p1, P1, E2, p2, P2):
    """Contracted ERI block for one chunk of shell quartets (traceable core).

    E1 (n,a,A,s1), p1 (n,a), P1 (n,a,3); E2 (n,c,C,s2), p2 (n,c), P2 (n,c,3).
    Returns (n, A, C).

    NOTE (TPU): this formulation compiles fast on the axon backend (the
    alternative fused-matmul forms compiled 10-25x slower per class). Its
    Achilles heel is the dot operand materialization of the 5D R2 tensor
    when XLA must transpose it — f64 emulates as bf16[8] and small trailing
    dims pad to (16,128) tiles, inflating ~20x — the tiled pair-space engine
    (ops/eri_tiled.py) sizes its tile grid around exactly this.
    """
    ps = p1[:, :, None] + p2[:, None, :]  # (n,a,c)
    alpha = p1[:, :, None] * p2[:, None, :] / ps
    PQ = P1[:, :, None, :] - P2[:, None, :, :]  # (n,a,c,3)
    R = r_table(Lbra + Lket, alpha, PQ)  # (n,a,c,H)
    pref = 2.0 * jnp.pi**2.5 / (p1[:, :, None] * p2[:, None, :] * jnp.sqrt(ps))
    R = R * pref[..., None]
    idx, sign = _r2_gather(Lbra, Lket)
    R2 = R[..., jnp.asarray(idx)] * jnp.asarray(sign)[None, None, None, None, :]
    # (n,a,c,S1,S2) . (n,a,A,S1) -> (n,c,S2,A) -> with E2 (n,c,C,S2) -> (n,A,C)
    T1 = jnp.einsum("naAs,nacst->nctA", E1, R2)
    return jnp.einsum("nctA,ncCt->nAC", T1, E2)


def eri(
    system: MolecularSystem,
    positions=None,
    screening_threshold: float = 0.0,
) -> jnp.ndarray:
    """Full dense ERI tensor (nao, nao, nao, nao), chemists' (ij|kl).

    In-core path (reference parity: rhf.rs:45 materializes the full tensor
    too), built by the scatter-free tiled pair-space engine
    (ops/eri_tiled.py). With ``screening_threshold > 0`` tile blocks whose
    Schwarz bound product is below threshold are skipped (entries stay zero).
    For systems too large to hold nao^4 in HBM use the integral-direct Fock
    build instead (ops/fock_stream.py / parallel/fock_sharded.py).
    """
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

    eng = TiledEriEngine(system, screening_threshold, positions=positions)
    return eng.finish_eri(eng.build())


class EriTensor:
    """Thin indexable wrapper for reference-API parity with
    molint::storage::EriTensor ((i,j,k,l) chemists'-notation access,
    rhf.rs:61 / uhf.rs:220-222)."""

    def __init__(self, dense: jnp.ndarray):
        self.dense = dense

    def __getitem__(self, idx):
        i, j, k, l = idx
        return self.dense[i, j, k, l]
