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


def mp2(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    output=None,
) -> Mp2Output:
    """Run (or reuse) a converged RHF and return the MP2 correlation energy.

    Tight SCF convergence recommended (epsilon <= 1e-8): the correlation
    energy inherits first-order sensitivity to the orbital residual."""
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; MP2 would be meaningless")
    nocc = system.n_electrons(config.charge) // 2
    C = jnp.asarray(out.coefficients)
    eps = jnp.asarray(out.orbital_energies)
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    ovov = _transform_ovov(e4, C[:, :nocc], C[:, nocc:])
    ecorr = float(_mp2_from_mo(ovov, eps[:nocc], eps[nocc:]))
    return Mp2Output(
        scf_total_energy=out.total_energy(),
        correlation_energy=ecorr,
        iterations=out.iterations,
    )
