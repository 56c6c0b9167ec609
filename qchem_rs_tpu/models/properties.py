"""Molecular properties from the converged SCF density.

Capabilities beyond the reference (qchem-rs stops at energies +
orbital energies, /root/reference/core/src/hf/rhf.rs:14-30): electric
dipole moments and Mulliken population analysis, both one-liners over the
framework's differentiable integral layer.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from qchem_rs_tpu.ops import one_electron
from qchem_rs_tpu.utils.system import MolecularSystem

#: 1 atomic unit of electric dipole in Debye
AU_TO_DEBYE = 2.541746473


def dipole_moment(system: MolecularSystem, density: np.ndarray) -> np.ndarray:
    """Electric dipole (a.u.), origin at 0: mu = sum_A Z_A R_A - Tr[D r].

    ``density`` is the TOTAL density matrix in the working basis — RHF's
    ``output.density`` directly, or the spin sum ``D[0] + D[1]`` for UHF.
    Origin-independent for neutral molecules.
    """
    D = jnp.asarray(density)
    mu_e = jnp.einsum("dij,ij->d", one_electron.dipole_integrals(system), D)
    charges = np.asarray(system.charges)
    mu_n = (charges[:, None] * np.asarray(system.positions)).sum(axis=0)
    return np.asarray(mu_n - np.asarray(mu_e))


def mulliken_charges(system: MolecularSystem, density: np.ndarray) -> np.ndarray:
    """Mulliken atomic partial charges: q_A = Z_A - sum_{i in A} (D S)_ii."""
    D = jnp.asarray(density)
    S = one_electron.overlap(system)
    pops = np.asarray(jnp.diagonal(D @ S))
    ao_atoms = system.ao_atom_indices()
    q = np.asarray(system.charges, dtype=float).copy()
    np.subtract.at(q, ao_atoms, pops)
    return q


def spin_expectation(
    system: MolecularSystem,
    coefficients: np.ndarray,
    n_alpha: int,
    n_beta: int,
) -> tuple[float, float]:
    """UHF <S^2> and the spin-contamination excess over the exact value.

        <S^2> = S_z (S_z + 1) + N_beta - sum_ij |<phi_i^a|S|phi_j^b>|^2

    (occupied alpha x occupied beta orbital overlaps in the working AO
    metric). Returns (s2, s2 - s2_exact); the excess is the standard
    contamination diagnostic (0 for a spin-pure determinant, ~1 when a
    full extra spin state mixes in)."""
    S = np.asarray(one_electron.overlap(system, jnp.asarray(system.positions)))
    C = np.asarray(coefficients)
    Co_a = C[0][:, :n_alpha]
    Co_b = C[1][:, :n_beta]
    ov = Co_a.T @ S @ Co_b  # (n_alpha, n_beta)
    sz = 0.5 * (n_alpha - n_beta)
    s2 = sz * (sz + 1.0) + n_beta - float((ov**2).sum())
    return s2, s2 - sz * (sz + 1.0)
