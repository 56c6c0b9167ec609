"""qchem_rs_tpu — a TPU-native Hartree-Fock framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the Rust
reference ``qchem-rs`` (see /root/reference): MolSSI-BSE basis parsing,
McMurchie-Davidson one- and two-electron integrals, RHF/UHF SCF with DIIS,
plus TPU-first extensions (Schwarz screening, sharded integral-direct Fock
builds, batched conformer sweeps).

Hartree-Fock requires ~1e-10 accurate integrals, so the whole framework runs
in float64 (enabled here, before any jax.numpy use).
"""

import jax

jax.config.update("jax_enable_x64", True)

from qchem_rs_tpu.utils.basis import BasisSet
from qchem_rs_tpu.utils.system import Atom, MolecularSystem
from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.rhf import restricted_hartree_fock, RestrictedHartreeFockOutput
from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock, UnrestrictedHartreeFockOutput

__all__ = [
    "BasisSet",
    "Atom",
    "MolecularSystem",
    "HartreeFockConfig",
    "restricted_hartree_fock",
    "RestrictedHartreeFockOutput",
    "unrestricted_hartree_fock",
    "UnrestrictedHartreeFockOutput",
]

__version__ = "0.1.0"
