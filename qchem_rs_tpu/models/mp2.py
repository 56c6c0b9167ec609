"""MP2 correlation energy on converged RHF orbitals.

A capability rung above the reference (qchem-rs stops at mean-field
energies, /root/reference/README.md:1-6), and a natural fit for the TPU:
the AO->MO integral transformation is four successive matmuls over the
pair-space-expanded ERI tensor — pure MXU work — and the amplitude sum is
one fused elementwise reduction.

    E_MP2 = sum_{ijab} (ia|jb) [ 2 (ia|jb) - (ib|ja) ]
            / (eps_i + eps_j - eps_a - eps_b)

Closed-shell RHF only (spin-adapted form above). The O(N^5) transform is
done one index at a time (never more than one n^4 buffer live, the same
memory discipline as the SCF engines).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.utils.system import MolecularSystem


@dataclasses.dataclass
class Mp2Output:
    scf_total_energy: float
    correlation_energy: float
    iterations: int

    def total_energy(self) -> float:
        return self.scf_total_energy + self.correlation_energy


#: chemical-core orbital counts per element (H..Ar; Z -> frozen spatial
#: orbitals). The standard frozen-core partition: 1s for Li-Ne, 1s2s2p for
#: Na-Ar. Used by frozen="auto".
_CORE_ORBITALS = {z: 0 for z in (1, 2)}
_CORE_ORBITALS.update({z: 1 for z in range(3, 11)})
_CORE_ORBITALS.update({z: 5 for z in range(11, 19)})


def _n_frozen(system, frozen) -> int:
    """Resolve the frozen-core orbital count; "auto" uses the chemical-core
    table, an int passes through (0 disables)."""
    if frozen == "auto":
        try:
            return sum(_CORE_ORBITALS[a.ordinal] for a in system.atoms)
        except KeyError as e:
            raise ValueError(
                f"no frozen-core count for element Z={e.args[0]}; pass an "
                "explicit integer"
            ) from None
    n = int(frozen)
    if n < 0:
        raise ValueError("frozen must be >= 0 or 'auto'")
    return n


@jax.jit
def _mp2_from_mo(eri_mo_ovov: jax.Array, eps_o: jax.Array, eps_v: jax.Array):
    """E_MP2 from (ia|jb) integrals, shape (no, nv, no, nv)."""
    denom = (
        eps_o[:, None, None, None]
        + eps_o[None, None, :, None]
        - eps_v[None, :, None, None]
        - eps_v[None, None, None, :]
    )
    t = eri_mo_ovov / denom
    return jnp.sum(t * (2.0 * eri_mo_ovov - eri_mo_ovov.transpose(0, 3, 2, 1)))


@jax.jit
def _transform_ovov(e4: jax.Array, Co: jax.Array, Cv: jax.Array):
    """(pq|rs) -> (ia|jb): four quarter-transforms, one buffer at a time."""
    x = jnp.einsum("pqrs,pi->iqrs", e4, Co)
    x = jnp.einsum("iqrs,qa->iars", x, Cv)
    x = jnp.einsum("iars,rj->iajs", x, Co)
    return jnp.einsum("iajs,sb->iajb", x, Cv)


def _pair_transform_matrix(builder, Co, Cv):
    """U[P, (ia)] such that (ia|jb) = U^T V2f U: the occupied-virtual MO
    pair distribution expressed over the unordered AO-pair rows of V2f.
    Row P holding AO pair (p, q) carries C_pi C_qa + (p != q) C_qi C_pa;
    dup/padding rows carry zero (their values duplicate the canonical row).
    """
    import numpy as np

    from qchem_rs_tpu.ops.fock_pair import pair_row_ao

    row_i, row_j, dup = pair_row_ao(builder.engine.layout)
    pad = row_i < 0
    p = jnp.asarray(np.where(pad, 0, row_i).astype(np.int32))
    q = jnp.asarray(np.where(pad, 0, row_j).astype(np.int32))
    dead = jnp.asarray((pad | dup))
    off = jnp.where(dead | (p == q), 0.0, 1.0)[:, None]
    live = jnp.where(dead, 0.0, 1.0)[:, None]
    no, nv = Co.shape[1], Cv.shape[1]
    # (M, no*nv) = live * Co[p] x Cv[q] + off * Co[q] x Cv[p]
    U = live * (Co[p][:, :, None] * Cv[q][:, None, :]).reshape(-1, no * nv)
    U = U + off * (Co[q][:, :, None] * Cv[p][:, None, :]).reshape(-1, no * nv)
    return U


def mp2_pair_space(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    frozen: int | str = 0,
    output=None,
    builder=None,
) -> Mp2Output:
    """MP2 through the pair-space ERI matrix — NO n^4 tensor anywhere.

    (ia|jb) = U^T V2f U with U the (M, no*nv) MO pair-distribution matrix:
    two MXU matmuls replace the four dense quarter-transforms, and peak
    memory is V2f (~3/4 n^4 / 2) + U + the (no*nv)^2 result — the same
    memory envelope that lets fock_mode="pair" run naphthalene/cc-pVDZ on
    one chip (docs/PROFILE_r03.md), now extended to correlation energies.

    ``builder``: an explicit PairSpaceFockBuilder to contract against —
    pass a PairSpaceShardedFockBuilder to run the transform matmuls over a
    device mesh (V2f column-sharded, GSPMD inserts the collectives;
    per-device memory 1/ndev). Defaults to the cached single-device
    builder.
    """
    from qchem_rs_tpu.models.rhf import _direct_tools, restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; MP2 would be meaningless")
    nocc = system.n_electrons(config.charge) // 2
    nfz = _n_frozen(system, frozen)
    if nfz >= nocc:
        raise ValueError(f"frozen={nfz} leaves no correlated occupied orbitals")
    C = jnp.asarray(out.coefficients)
    if system.spherical:
        # V2f is Cartesian: lift the MO coefficients to the Cartesian AOs
        C = jnp.asarray(system.sph_T) @ C
    eps = jnp.asarray(out.orbital_energies)
    builder = builder or _direct_tools(system, config, "pair")
    Co, Cv = C[:, nfz:nocc], C[:, nocc:]
    U = _pair_transform_matrix(builder, Co, Cv)
    no, nv = nocc - nfz, C.shape[1] - nocc
    if hasattr(builder, "mo_pair_contract"):
        # build-sharded V2f (parallel/v2_sharded.py): the slab columns are
        # device-local/permuted, so the contraction runs inside the
        # builder's own shard_map with U permuted per device
        ovov = builder.mo_pair_contract(U).reshape(no, nv, no, nv)
    else:
        if builder._prepared is not None:
            # SCF ran in pair mode: its (V2f, W) are already resident —
            # reuse V2f instead of a second peak-memory tile build + mirror
            V2f = builder._prepared[0]
        else:
            from qchem_rs_tpu.ops.fock_pair import mirror_inplace

            V2f = jax.jit(mirror_inplace, donate_argnums=(0,))(
                builder.engine.build()
            )

        @jax.jit
        def contract(V2f, U):
            half = V2f @ U  # (M, no*nv)
            return U.T @ half  # (no*nv, no*nv)

        ovov = contract(V2f, U).reshape(no, nv, no, nv)
    ecorr = float(_mp2_from_mo(ovov, eps[nfz:nocc], eps[nocc:]))
    return Mp2Output(
        scf_total_energy=out.total_energy(),
        correlation_energy=ecorr,
        iterations=out.iterations,
    )


@jax.jit
def _ump2_pair(ovov_ss_a, ovov_ss_b, ovov_os, eo_a, ev_a, eo_b, ev_b):
    """UMP2 energy from the three spin-block (ia|jb) tensors."""

    def denom(eo1, ev1, eo2, ev2):
        return (
            eo1[:, None, None, None]
            + eo2[None, None, :, None]
            - ev1[None, :, None, None]
            - ev2[None, None, None, :]
        )

    def same_spin(ovov, eo, ev):
        anti = ovov - ovov.transpose(0, 3, 2, 1)
        return 0.25 * jnp.sum(anti * anti / denom(eo, ev, eo, ev))

    e_os = jnp.sum(ovov_os * ovov_os / denom(eo_a, ev_a, eo_b, ev_b))
    return same_spin(ovov_ss_a, eo_a, ev_a) + same_spin(ovov_ss_b, eo_b, ev_b) + e_os


def ump2_pair_space(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    frozen: int | str = 0,
    output=None,
) -> Mp2Output:
    """UMP2 through the pair-space ERI matrix — NO n^4 tensor anywhere.

    The three spin-block (ia|jb) tensors are each two MXU matmuls against
    the resident V2f: same-spin via U_s^T V2f U_s, opposite-spin via
    U_a^T V2f U_b — extending the fock_mode="pair" memory envelope (which
    runs naphthalene/cc-pVDZ on one chip, docs/PROFILE_r03.md) from
    closed-shell MP2 to open shells."""
    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.rhf import _direct_tools
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    out = output or unrestricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; MP2 would be meaningless")
    nocc = scf_mod.electron_counts(
        system.n_electrons(config.charge), config.spin_multiplicity
    )
    nfz = _n_frozen(system, frozen)
    if nfz >= min(nocc):
        raise ValueError(f"frozen={nfz} leaves no correlated occupied orbitals")
    C = jnp.asarray(out.coefficients)  # (2, n, n)
    if system.spherical:
        C = jnp.einsum("pq,sqm->spm", jnp.asarray(system.sph_T), C)
    eps = jnp.stack(
        [jnp.asarray(out.orbital_energies_alpha), jnp.asarray(out.orbital_energies_beta)]
    )
    builder = _direct_tools(system, config, "pair")
    if builder._prepared is not None:
        V2f = builder._prepared[0]
    else:
        from qchem_rs_tpu.ops.fock_pair import _mirror

        V2f = jax.jit(_mirror, donate_argnums=(0,))(builder.engine.build())
    U = [
        _pair_transform_matrix(
            builder, C[s][:, nfz : nocc[s]], C[s][:, nocc[s] :]
        )
        for s in range(2)
    ]

    @jax.jit
    def contract(V2f, L, R):
        return L.T @ (V2f @ R)

    shapes = [(nocc[s] - nfz, C.shape[2] - nocc[s]) for s in range(2)]
    ss_a = contract(V2f, U[0], U[0]).reshape(*shapes[0], *shapes[0])
    ss_b = contract(V2f, U[1], U[1]).reshape(*shapes[1], *shapes[1])
    os_ab = contract(V2f, U[0], U[1]).reshape(*shapes[0], *shapes[1])
    ecorr = float(
        _ump2_pair(
            ss_a, ss_b, os_ab,
            eps[0][nfz : nocc[0]], eps[0][nocc[0] :],
            eps[1][nfz : nocc[1]], eps[1][nocc[1] :],
        )
    )
    return Mp2Output(
        scf_total_energy=out.total_energy(),
        correlation_energy=ecorr,
        iterations=out.iterations,
    )


def ump2(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    frozen: int | str = 0,
    output=None,
) -> Mp2Output:
    """Spin-unrestricted MP2 on converged UHF orbitals:

        E = 1/4 sum_ss |(ia|jb) - (ib|ja)|^2 / D  +  sum_os (ia|jb)^2 / D

    per same-spin block plus the opposite-spin block. Reduces to the
    closed-shell result when alpha == beta."""
    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.rhf import _incore_tools
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    out = output or unrestricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; MP2 would be meaningless")
    nocc = scf_mod.electron_counts(
        system.n_electrons(config.charge), config.spin_multiplicity
    )
    C = jnp.asarray(out.coefficients)  # (2, n, n)
    eps = jnp.stack(
        [jnp.asarray(out.orbital_energies_alpha), jnp.asarray(out.orbital_energies_beta)]
    )
    nfz = _n_frozen(system, frozen)
    if nfz >= min(nocc):
        raise ValueError(f"frozen={nfz} leaves no correlated occupied orbitals")
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    Co = [C[s][:, nfz : nocc[s]] for s in range(2)]
    Cv = [C[s][:, nocc[s] :] for s in range(2)]
    ss_a = _transform_ovov(e4, Co[0], Cv[0])
    ss_b = _transform_ovov(e4, Co[1], Cv[1])
    # opposite spin: bra indices alpha, ket indices beta
    x = jnp.einsum("pqrs,pi->iqrs", e4, Co[0])
    x = jnp.einsum("iqrs,qa->iars", x, Cv[0])
    x = jnp.einsum("iars,rj->iajs", x, Co[1])
    os_ab = jnp.einsum("iajs,sb->iajb", x, Cv[1])
    ecorr = float(
        _ump2_pair(
            ss_a, ss_b, os_ab,
            eps[0][nfz : nocc[0]], eps[0][nocc[0] :],
            eps[1][nfz : nocc[1]], eps[1][nocc[1] :],
        )
    )
    return Mp2Output(
        scf_total_energy=out.total_energy(),
        correlation_energy=ecorr,
        iterations=out.iterations,
    )


def mp2(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    frozen: int | str = 0,
    output=None,
) -> Mp2Output:
    """Run (or reuse) a converged RHF and return the MP2 correlation energy.

    Tight SCF convergence recommended (epsilon <= 1e-8): the correlation
    energy inherits first-order sensitivity to the orbital residual.
    ``frozen``: number of core spatial orbitals excluded from the
    correlation treatment (0, an int, or "auto" for the chemical core —
    1s for Li-Ne, 1s2s2p for Na-Ar)."""
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; MP2 would be meaningless")
    nocc = system.n_electrons(config.charge) // 2
    nfz = _n_frozen(system, frozen)
    if nfz >= nocc:
        raise ValueError(f"frozen={nfz} leaves no correlated occupied orbitals")
    C = jnp.asarray(out.coefficients)
    eps = jnp.asarray(out.orbital_energies)
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    ovov = _transform_ovov(e4, C[:, nfz:nocc], C[:, nocc:])
    ecorr = float(_mp2_from_mo(ovov, eps[nfz:nocc], eps[nocc:]))
    return Mp2Output(
        scf_total_energy=out.total_energy(),
        correlation_energy=ecorr,
        iterations=out.iterations,
    )
