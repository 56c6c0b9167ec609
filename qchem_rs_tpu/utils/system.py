"""Molecular system: atoms + contracted-Gaussian shells in a TPU-friendly
static-shape layout.

Replaces ``molint::system::{Atom, MolecularSystem}`` (consumed at
/root/reference/qchem-cli/src/main.rs:77 and core/src/hf/rhf.rs:36-37).
Molecule JSON format matches /root/reference/data/mol/*.json: a list of
``{"element": "<ordinal-as-string>", "position": [x, y, z]}`` with positions
in Bohr.

TPU-first design: instead of a heterogeneous shell list driving scalar loops
(the reference/molint model), shells are grouped into **classes by angular
momentum l**, each class a set of flat arrays padded to the class's max
contraction degree. Every integral class (la, lb[, lc, ld]) then has fully
static shapes, so the McMurchie-Davidson recursions unroll at trace time into
one fused XLA kernel over the whole batch of shell pairs / quartets.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from qchem_rs_tpu.ops.angular import cart_components, component_norms, double_factorial, ncart
from qchem_rs_tpu.utils.basis import BasisSet


@dataclasses.dataclass(frozen=True)
class Atom:
    """An atom: nuclear charge (ordinal) and position in Bohr."""

    ordinal: int
    position: np.ndarray  # (3,)


@dataclasses.dataclass(frozen=True)
class Shell:
    """One contracted shell placed on an atom (host-side bookkeeping)."""

    index: int  # global shell index
    l: int
    atom_index: int
    center: np.ndarray  # (3,)
    exponents: np.ndarray  # (K,)
    coefficients: np.ndarray  # (K,) — normalized (see _normalize_coefficients)
    ao_offset: int  # first AO index of this shell


@dataclasses.dataclass(frozen=True)
class ShellClass:
    """All shells of one angular momentum, padded to a common contraction
    degree K. Padded primitives have coefficient 0 (and exponent 1 so no
    NaNs/Infs appear in intermediate math)."""

    l: int
    shell_indices: np.ndarray  # (ns,) global shell index
    centers: np.ndarray  # (ns, 3)
    alphas: np.ndarray  # (ns, K)
    coefs: np.ndarray  # (ns, K)
    ao_offsets: np.ndarray  # (ns,)
    atom_indices: np.ndarray  # (ns,)

    @property
    def nshells(self) -> int:
        return len(self.ao_offsets)

    @property
    def K(self) -> int:
        return self.alphas.shape[1]


def _primitive_norm(alpha: np.ndarray, l: int) -> np.ndarray:
    """Norm of the (l,0,0) Cartesian primitive x^l exp(-a r^2)."""
    dfl = double_factorial(2 * l - 1)
    return (2.0 * alpha / np.pi) ** 0.75 * (4.0 * alpha) ** (l / 2.0) / np.sqrt(dfl)


def _normalize_coefficients(alpha: np.ndarray, coef: np.ndarray, l: int) -> np.ndarray:
    """BSE coefficients refer to normalized primitives; fold primitive norms
    in, then renormalize the contraction so the (l,0,0) component has unit
    self-overlap. Per-Cartesian-component factors are applied separately via
    ``component_norms``.
    """
    c = coef * _primitive_norm(alpha, l)
    ap = alpha[:, None] + alpha[None, :]
    dfl = double_factorial(2 * l - 1)
    # <(l00)_p | (l00)_q> on the same center
    s_pq = (np.pi / ap) ** 1.5 * dfl / (2.0 * ap) ** l
    self_overlap = c @ s_pq @ c
    return c / np.sqrt(self_overlap)


class MolecularSystem:
    """Atoms + basis expanded into shells and shell classes.

    ``spherical=True`` projects all integrals onto real solid harmonics
    (5d/7f) — see ops/spherical.py; the default is Cartesian (6d/10f).
    """

    def __init__(self, atoms: list[Atom], basis: BasisSet, spherical: bool = False):
        self.atoms = atoms
        self.basis = basis
        self.spherical = spherical

        shells: list[Shell] = []
        ao = 0
        for ai, atom in enumerate(atoms):
            for spec in basis.shells_for(atom.ordinal):
                coefs = _normalize_coefficients(spec.exponents, spec.coefficients, spec.l)
                shells.append(
                    Shell(
                        index=len(shells),
                        l=spec.l,
                        atom_index=ai,
                        center=np.asarray(atom.position, dtype=np.float64),
                        exponents=spec.exponents,
                        coefficients=coefs,
                        ao_offset=ao,
                    )
                )
                ao += ncart(spec.l)
        self.shells = shells
        self._n_basis = ao

        # group into static-shape classes by l
        self.shell_classes: dict[int, ShellClass] = {}
        for l in sorted({s.l for s in shells}):
            group = [s for s in shells if s.l == l]
            K = max(len(s.exponents) for s in group)
            ns = len(group)
            alphas = np.ones((ns, K), dtype=np.float64)
            coefs = np.zeros((ns, K), dtype=np.float64)
            centers = np.zeros((ns, 3), dtype=np.float64)
            offs = np.zeros(ns, dtype=np.int64)
            atom_idx = np.zeros(ns, dtype=np.int64)
            sidx = np.zeros(ns, dtype=np.int64)
            for i, s in enumerate(group):
                k = len(s.exponents)
                alphas[i, :k] = s.exponents
                coefs[i, :k] = s.coefficients
                centers[i] = s.center
                offs[i] = s.ao_offset
                atom_idx[i] = s.atom_index
                sidx[i] = s.index
            self.shell_classes[l] = ShellClass(
                l=l,
                shell_indices=sidx,
                centers=centers,
                alphas=alphas,
                coefs=coefs,
                ao_offsets=offs,
                atom_indices=atom_idx,
            )

        # per-AO Cartesian component renormalization (see ops/angular.py)
        norms = np.zeros(ao, dtype=np.float64)
        for s in shells:
            norms[s.ao_offset : s.ao_offset + ncart(s.l)] = component_norms(s.l)
        self.ao_norms = norms

        # nuclear data as arrays
        self.charges = np.array([a.ordinal for a in atoms], dtype=np.float64)
        self.positions = np.array([a.position for a in atoms], dtype=np.float64)

        if spherical:
            from qchem_rs_tpu.ops.spherical import system_transform

            self.sph_T = system_transform(self)  # (nao_cart, nao_sph)
            self._n_basis_sph = self.sph_T.shape[1]
        else:
            self.sph_T = None
            self._n_basis_sph = None

    # --- constructors -----------------------------------------------------

    @classmethod
    def load(cls, path: str | Path, basis: BasisSet, spherical: bool = False) -> "MolecularSystem":
        """Load a molecule JSON (reference format, positions in Bohr)."""
        with open(path) as f:
            data = json.load(f)
        atoms = [
            Atom(int(rec["element"]), np.asarray(rec["position"], dtype=np.float64))
            for rec in data
        ]
        return cls(atoms, basis, spherical=spherical)

    @classmethod
    def from_arrays(
        cls, ordinals: np.ndarray, positions: np.ndarray, basis: BasisSet,
        spherical: bool = False,
    ) -> "MolecularSystem":
        atoms = [
            Atom(int(z), np.asarray(p, dtype=np.float64))
            for z, p in zip(ordinals, positions)
        ]
        return cls(atoms, basis, spherical=spherical)

    # --- reference API parity --------------------------------------------

    def n_basis(self) -> int:
        """Number of AO basis functions — molint's n_basis(). Spherical count
        when the system was built with spherical=True, Cartesian otherwise."""
        return self._n_basis_sph if self.spherical else self._n_basis

    def n_basis_cart(self) -> int:
        return self._n_basis

    def ao_atom_indices(self) -> np.ndarray:
        """Atom index of every WORKING-basis AO (spherical AOs are 2l+1 per
        shell in shell order — ops/spherical.system_transform's block
        layout; Cartesian ncart(l)). Used by population analysis."""
        out: list[int] = []
        for s in self.shells:
            n = (2 * s.l + 1) if self.spherical else ncart(s.l)
            out.extend([s.atom_index] * n)
        return np.asarray(out, dtype=np.int64)

    def n_electrons(self, charge: int = 0) -> int:
        return int(sum(a.ordinal for a in self.atoms)) - charge

    def with_positions(self, positions: np.ndarray) -> "MolecularSystem":
        """Same atoms/basis at new geometry (for conformer sweeps)."""
        atoms = [Atom(a.ordinal, np.asarray(p, dtype=np.float64)) for a, p in zip(self.atoms, positions)]
        return MolecularSystem(atoms, self.basis, spherical=self.spherical)

    def structure_key(self) -> tuple:
        """Hashable identity of everything EXCEPT the geometry. Two systems
        with equal keys (and the same BasisSet object) share shell structure,
        so compiled programs built for one run correctly on the other with
        positions passed as runtime operands — the cache key that lets
        optimize/frequencies/sweeps reuse executables across displaced
        geometries (geometry flows only through the ``positions`` argument
        of every integral program)."""
        return (self.spherical, tuple(a.ordinal for a in self.atoms))

    def nuclear_repulsion(self) -> float:
        """Classical point-charge repulsion; mirrors
        compute_nuclear_repulsion (rhf.rs:110-122)."""
        z = self.charges
        r = self.positions
        diff = r[:, None, :] - r[None, :, :]
        dist = np.sqrt((diff**2).sum(-1))
        zz = z[:, None] * z[None, :]
        iu = np.triu_indices(len(z), k=1)
        return float((zz[iu] / dist[iu]).sum())

    def __repr__(self) -> str:
        return (
            f"MolecularSystem({len(self.atoms)} atoms, {len(self.shells)} shells, "
            f"{self._n_basis} AOs, basis={self.basis.name!r})"
        )
