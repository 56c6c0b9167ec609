"""Harmonic vibrational analysis: semi-numerical Hessian over analytic
gradients.

The Hessian is central finite differences of the ANALYTIC nuclear gradient
(models/gradients.py) — one order of finite differencing better-conditioned
than double-differencing energies, and each column costs two warm-started
SCF+gradient evaluations. Frequencies come from the mass-weighted Hessian's
eigenvalues; translations/rotations show up as near-zero modes (reported,
not projected out — their smallness is itself a gradient-quality check).

Capability two rungs above the reference (single-point energies only).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.utils.system import MolecularSystem

#: most-abundant-isotope masses (amu), Z-indexed, Z = 1..18 (all elements
#: reachable through the bundled basis sets)
ATOMIC_MASS = {
    1: 1.00782503,
    2: 4.00260325,
    3: 7.01600455,
    4: 9.01218220,
    5: 11.00930540,
    6: 12.0,
    7: 14.00307401,
    8: 15.99491462,
    9: 18.99840316,
    10: 19.99244018,
    11: 22.98976928,
    12: 23.98504170,
    13: 26.98153863,
    14: 27.97692653,
    15: 30.97376163,
    16: 31.97207117,
    17: 34.96885268,
    18: 39.96238312,
}

#: 1 amu in electron masses
AMU_TO_ME = 1822.888486209
#: Hartree/(Bohr^2 m_e) angular frequency to wavenumbers (cm^-1)
AU_TO_CM1 = 219474.6313632


@dataclasses.dataclass
class HarmonicResult:
    frequencies_cm1: np.ndarray  # all 3N modes, ascending (imaginary < 0)
    hessian: np.ndarray  # (3N, 3N), Hartree/Bohr^2
    n_zero_modes: int  # modes with |freq| < zero_tol


def hessian_fd(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    step: float = 5e-3,
) -> np.ndarray:
    """(3N, 3N) Cartesian Hessian by central differences of the analytic
    gradient (RHF, or UHF for open shells), symmetrized. ``step`` in Bohr."""
    from qchem_rs_tpu.models.gradients import scf_and_gradient

    config = config or HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    x0 = np.asarray(system.positions, dtype=np.float64)
    n3 = x0.size
    H = np.zeros((n3, n3))
    guess = None
    for k in range(n3):
        cols = []
        for sgn in (+1.0, -1.0):
            x = x0.copy().reshape(-1)
            x[k] += sgn * step
            sys_x = system.with_positions(x.reshape(x0.shape))
            try:
                out, g = scf_and_gradient(sys_x, config, density_guess=guess)
            except RuntimeError as e:
                raise RuntimeError(f"{e} during Hessian build") from e
            guess = out.density
            cols.append(g.reshape(-1))
        H[:, k] = (cols[0] - cols[1]) / (2.0 * step)
    return 0.5 * (H + H.T)


def harmonic_frequencies(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    step: float = 5e-3,
    zero_tol: float = 50.0,
) -> HarmonicResult:
    """Harmonic frequencies (cm^-1) at the CURRENT geometry (optimize first;
    non-stationary geometries mix translations into vibrations)."""
    unknown = sorted({a.ordinal for a in system.atoms} - ATOMIC_MASS.keys())
    if unknown:
        # fail BEFORE the O(3N) SCF+gradient Hessian build, not after
        raise ValueError(
            f"no atomic mass tabulated for Z={unknown}; extend "
            "qchem_rs_tpu.models.hessian.ATOMIC_MASS"
        )
    H = hessian_fd(system, config, step=step)
    masses = np.array(
        [ATOMIC_MASS[a.ordinal] * AMU_TO_ME for a in system.atoms]
    )
    minv = 1.0 / np.sqrt(np.repeat(masses, 3))
    Hw = H * minv[:, None] * minv[None, :]
    w = np.linalg.eigvalsh(Hw)
    freqs = np.sign(w) * np.sqrt(np.abs(w)) * AU_TO_CM1
    return HarmonicResult(
        frequencies_cm1=freqs,
        hessian=H,
        n_zero_modes=int((np.abs(freqs) < zero_tol).sum()),
    )
