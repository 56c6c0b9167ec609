"""Shared test helpers: synthetic systems with arbitrary angular momenta."""

import numpy as np

from qchem_rs_tpu.utils.basis import BasisSet, ShellSpec
from qchem_rs_tpu.utils.system import Atom, MolecularSystem

import os

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")
DATA_BASIS = os.path.abspath(os.path.join(_DATA, "basis"))
DATA_MOL = os.path.abspath(os.path.join(_DATA, "mol"))


def make_synthetic_system(lmax=2, seed=0):
    """A 3-atom fake molecule whose basis exercises s..l_max shells with mixed
    contraction degrees — pure integral-engine stress test (not physical)."""
    rng = np.random.default_rng(seed)
    shells = []
    for l in range(lmax + 1):
        K = int(rng.integers(1, 4))
        exps = np.sort(rng.uniform(0.2, 8.0, size=K))[::-1]
        coefs = rng.uniform(0.3, 1.0, size=K)
        shells.append(ShellSpec(l=l, exponents=exps, coefficients=coefs))
    basis = BasisSet("synthetic", {1: shells[: max(1, lmax)], 8: shells})
    atoms = [
        Atom(1, np.array([0.0, 0.1, -0.2])),
        Atom(8, np.array([1.1, -0.3, 0.4])),
        Atom(1, np.array([-0.7, 0.9, 1.2])),
    ]
    return MolecularSystem(atoms, basis)


def load_reference_system(mol: str, basis: str) -> MolecularSystem:
    b = BasisSet.load(f"{DATA_BASIS}/{basis}.json")
    return MolecularSystem.load(f"{DATA_MOL}/{mol}.json", b)
