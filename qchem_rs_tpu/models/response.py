"""Static linear response: CPHF/RPA dipole polarizability.

A capability rung above the reference (qchem-rs stops at ground-state SCF
energies, /root/reference/README.md:1-6). The static polarizability is the
zero-frequency limit of the TDHF response:

    alpha_xy = 4 d_x^T (A + B)^{-1} d_y

with A/B the singlet orbital-Hessian blocks (models/cis.py) and d the
occupied-virtual MO dipole blocks. Derivation: the sum-over-states form
alpha = 2 sum_n t_n t_n^T / omega_n with t_n = sqrt(2) d.(X+Y)_n collapses
through the Casida factorization ((X+Y)_n = S Z_n / sqrt(omega_n),
sum_n Z_n Z_n^T / omega_n^2 = (S(A+B)S)^{-1}, S = (A-B)^{1/2}) to the
single linear solve above — no eigendecomposition needed.

Cross-validated against finite-field SCF (config.electric_field) dipole
derivatives in tests/test_response.py, which pins both the formula's
prefactor and the field-coupling sign conventions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.utils.system import MolecularSystem


@jax.jit
def _alpha_from_blocks(ApB: jax.Array, d_ov: jax.Array):
    """alpha = 4 d (A+B)^{-1} d^T via one symmetric solve (3 rhs)."""
    U = jnp.linalg.solve(ApB, d_ov.T)  # (n, 3)
    return 4.0 * (d_ov @ U)


@jax.jit
def _alpha_dynamic_from_blocks(A, B, d_ov, omega):
    """alpha(omega) = 4 (S d)^T (S(A+B)S - omega^2 I)^{-1} (S d) with
    S = (A-B)^{1/2} — the Casida form of the frequency-dependent TDHF
    response; reduces to the static solve at omega = 0."""
    wm, Um = jnp.linalg.eigh(A - B)
    S = (Um * jnp.sqrt(jnp.maximum(wm, 0.0))) @ Um.T
    M = S @ (A + B) @ S - (omega**2) * jnp.eye(A.shape[0])
    Sd = S @ d_ov.T  # (n, 3)
    return 4.0 * (Sd.T @ jnp.linalg.solve(M, Sd)), jnp.min(wm)


def _response_blocks(system, config, output):
    """Singlet (A, B) orbital-Hessian blocks + MO dipole rows for a
    converged RHF reference (pair mode: no n^4 AO tensor)."""
    from qchem_rs_tpu.models.cis import (
        _assemble_AB,
        _cis_blocks_dense,
        _cis_blocks_pair,
        _mo_transition_dipoles,
    )
    from qchem_rs_tpu.models.rhf import (
        _direct_tools,
        _incore_tools,
        restricted_hartree_fock,
    )

    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; response needs a converged reference")
    nocc = system.n_electrons(config.charge) // 2
    C = jnp.asarray(out.coefficients)
    eps = jnp.asarray(out.orbital_energies)

    if config.fock_mode == "pair":
        Cx = C
        if system.spherical:
            Cx = jnp.asarray(system.sph_T) @ C
        builder = _direct_tools(system, config, "pair")
        ovov, oovv = _cis_blocks_pair(builder, Cx[:, :nocc], Cx[:, nocc:])
    else:
        _, engine = _incore_tools(system, config)
        ovov, oovv = _cis_blocks_dense(engine, C[:, :nocc], C[:, nocc:])

    A, B = _assemble_AB(ovov, oovv, eps[:nocc], eps[nocc:], True)
    d_ov = _mo_transition_dipoles(system, C, nocc).reshape(3, -1)
    return A, B, d_ov


def static_polarizability(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    output=None,
) -> np.ndarray:
    """Static dipole polarizability tensor (3, 3) in atomic units.

    Reuses the CIS machinery for the singlet (A, B) blocks; `config.fock_mode
    == "pair"` routes the MO-integral blocks through the pair-space V2f
    (no n^4 AO tensor). Raises on an unstable RHF reference (A+B would not
    be positive definite there and the static response diverges).
    """
    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    A, B, d_ov = _response_blocks(system, config, output)
    alpha = np.asarray(_alpha_from_blocks(A + B, d_ov))
    if not np.all(np.linalg.eigvalsh(alpha) > 0):
        raise RuntimeError(
            "polarizability not positive definite: the RHF reference is "
            "unstable; the static response is undefined"
        )
    return alpha


def dynamic_polarizability(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    omega: float = 0.0,
    output=None,
) -> np.ndarray:
    """Frequency-dependent dipole polarizability alpha(omega), (3, 3) a.u.

    The TDHF linear response at real frequency omega (Hartree) via the
    Casida form; omega = 0 reproduces static_polarizability. Valid between
    poles (the TDHF excitation energies); raises on an unstable reference.
    """
    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    A, B, d_ov = _response_blocks(system, config, output)
    alpha, wm_min = _alpha_dynamic_from_blocks(A, B, d_ov, float(omega))
    if float(wm_min) <= 0.0:
        raise RuntimeError(
            "A - B is not positive definite: the RHF reference is unstable; "
            "the TDHF response is undefined"
        )
    return np.asarray(alpha)
