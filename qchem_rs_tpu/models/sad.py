"""Superposition of Atomic Densities (SAD) initial guess.

The reference's only guess is extended Hückel (rhf.rs:133-150), which on the
emulated-f64 TPU backend costs ~50 diag_rms iterations on benzene/cc-pVDZ
(docs/PROFILE_r04.md). SAD starts the SCF from a block-diagonal assembly of
spherically-averaged atomic Hartree-Fock densities — a far better starting
point for organic molecules — and enters the compiled SCF program through the
existing ``density_guess`` operand, so selecting it triggers NO new TPU
compiles.

Each unique element's atomic problem is solved ON THE HOST CPU (tiny system;
forcing ``jax.default_device`` to a CPU device keeps the ~45 s/program TPU
remote-compile latency out of the guess path) with a fractional-occupation
restricted SCF: electrons fill orbitals in energy order, degenerate groups
(p/d shells of the spherically symmetric atom) share electrons equally, which
keeps the atomic density spherically averaged and the iteration smooth.

Energy accuracy of the atomic solver is irrelevant — only the density is
consumed, and DIIS absorbs its imperfections within the first few molecular
iterations.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

import numpy as np

# (Z, spherical, max_contraction_signature) -> atomic density, per basis set.
# Keyed weakly by the BasisSet object so entries die with it.
_ATOM_CACHE: "WeakKeyDictionary[object, dict]" = WeakKeyDictionary()


def _fractional_occupations(w: np.ndarray, n_electrons: int,
                            degeneracy_tol: float = 1e-6) -> np.ndarray:
    """Aufbau filling with equal sharing inside degenerate groups.

    Returns per-orbital occupations in [0, 2] summing to ``n_electrons``.
    Degeneracy is detected on the orbital-energy ladder (consecutive gaps
    below ``degeneracy_tol``), which for an isolated atom groups the p/d/f
    manifolds and so spherically averages the density.
    """
    n = len(w)
    occ = np.zeros(n)
    remaining = float(n_electrons)
    i = 0
    while i < n and remaining > 0:
        j = i + 1
        while j < n and abs(w[j] - w[j - 1]) < degeneracy_tol:
            j += 1
        g = j - i  # group size; capacity 2g electrons
        take = min(remaining, 2.0 * g)
        occ[i:j] = take / g
        remaining -= take
        i = j
    return occ


def _atomic_density(basis, Z: int, spherical: bool) -> np.ndarray:
    """Spherically-averaged fractional-occupation RHF density of the neutral
    atom ``Z`` in ``basis``. Pure host/CPU work (numpy SCF over CPU-computed
    integrals)."""
    import jax
    import jax.numpy as jnp

    from qchem_rs_tpu.utils.system import Atom, MolecularSystem

    system = MolecularSystem([Atom(Z, np.zeros(3))], basis, spherical=spherical)
    cpu = jax.devices("cpu")[0]
    # force the XLA f64 tile kernel while building the atomic integrals:
    # kernel-mode selection keys off jax.default_backend() (still "tpu" here)
    # but these programs compile for the CPU device, where the Mosaic kernel
    # cannot run
    prev_kernel = os.environ.get("QCHEM_KERNEL")
    os.environ["QCHEM_KERNEL"] = "f64"
    try:
        with jax.default_device(cpu):
            from qchem_rs_tpu.ops import one_electron
            from qchem_rs_tpu.ops.eri import eri as dense_eri

            pos = jnp.asarray(system.positions)
            S = np.asarray(one_electron.overlap(system, pos))
            H = np.asarray(
                one_electron.kinetic(system, pos) + one_electron.nuclear(system, pos)
            )
            V = np.asarray(dense_eri(system))
    finally:
        if prev_kernel is None:
            os.environ.pop("QCHEM_KERNEL", None)
        else:
            os.environ["QCHEM_KERNEL"] = prev_kernel

    n = S.shape[0]
    # Löwdin orthogonalization on the host
    sw, U = np.linalg.eigh(S)
    X = (U / np.sqrt(sw)[None, :]) @ U.T

    D = np.zeros((n, n))
    occ = None
    mix = 0.5  # fixed damping; atoms are benign but fractional occupations
    # can ring without it
    for _ in range(60):
        J = np.einsum("ijkl,kl->ij", V, D)
        K = np.einsum("ikjl,kl->ij", V, D)
        F = H + J - 0.5 * K
        w, Cp = np.linalg.eigh(X.T @ F @ X)
        C = X @ Cp
        occ = _fractional_occupations(w, Z)
        D_new = (C * occ[None, :]) @ C.T
        delta = np.max(np.abs(D_new - D))
        D = D + mix * (D_new - D)
        if delta < 1e-7:
            break
    return D


def _atom_spans(system) -> list[tuple[int, int, int]]:
    """Per-atom (ordinal, ao_offset, nao) spans in the system's AO basis
    (spherical counts when the system is spherical). Shells are constructed
    atom-contiguously (utils/system.py), so each atom owns one AO block."""
    per_atom_naos: list[int] = [0] * len(system.atoms)
    for s in system.shells:
        width = 2 * s.l + 1 if system.spherical else (s.l + 1) * (s.l + 2) // 2
        per_atom_naos[s.atom_index] += width
    spans = []
    off = 0
    for atom, nao in zip(system.atoms, per_atom_naos):
        spans.append((atom.ordinal, off, nao))
        off += nao
    return spans


def sad_guess(system, charge: int = 0) -> np.ndarray:
    """Block-diagonal SAD density for ``system``, scaled so Tr[D S] matches
    the target electron count (neutral-atom sum minus ``charge``)."""
    per_basis = _ATOM_CACHE.setdefault(system.basis, {})
    n = system.n_basis()
    D = np.zeros((n, n))
    for Z, off, nao in _atom_spans(system):
        key = (Z, system.spherical)
        Da = per_basis.get(key)
        if Da is None:
            Da = per_basis[key] = _atomic_density(system.basis, Z, system.spherical)
        if Da.shape[0] != nao:  # defensive: span bookkeeping must agree
            raise RuntimeError(
                f"SAD atom block mismatch for Z={Z}: {Da.shape[0]} vs {nao}"
            )
        D[off : off + nao, off : off + nao] = Da

    n_target = system.n_electrons(charge)
    if charge != 0 and n_target > 0:
        import jax.numpy as jnp  # S in the molecular geometry for Tr[D S]
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            from qchem_rs_tpu.ops import one_electron

            S = np.asarray(one_electron.overlap(system, jnp.asarray(system.positions)))
        n_sad = float(np.sum(D * S))
        if n_sad > 0:
            D *= n_target / n_sad
    return D
