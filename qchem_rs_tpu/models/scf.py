"""Shared SCF machinery: Löwdin orthogonalization, extended-Hückel guess,
density builds, and the jitted fixed-point iteration infrastructure.

Reference algorithms being mirrored (with citations into /root/reference):
- symmetric (Löwdin S^-1/2) transform: core/src/hf/rhf.rs:124-131
- extended-Hückel guess (Wolfsberg-Helmholtz k = 1.75): rhf.rs:133-150
- density update D_ij = occ_scale * sum_k^occ C_ik C_jk: rhf.rs:169-181
- FDS - SDF DIIS error: rhf.rs:71
- diagonal-only density RMS convergence metric: rhf.rs:87-88 (quirk kept as
  the default; full-matrix RMS available via config)

TPU-first: the SCF loop is a single ``lax.while_loop`` inside jit; all state
(density, DIIS ring buffers, energies) is a pytree of fixed-shape arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WOLFSBERG_HELMHOLTZ = 1.75


def lowdin_x(S: jax.Array) -> jax.Array:
    """Symmetric orthogonalization X = U s^-1/2 U^T."""
    w, U = jnp.linalg.eigh(S)
    return (U / jnp.sqrt(w)[None, :]) @ U.T


def density_from_coeffs(C: jax.Array, nocc: int, scale: float) -> jax.Array:
    """D = scale * C_occ C_occ^T (scale 2 for RHF, 1 per spin for UHF)."""
    Cocc = C[:, :nocc]
    return scale * (Cocc @ Cocc.T)


def solve_fock(F: jax.Array, X: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigensolve in the orthogonal basis: returns (C, orbital_energies),
    eigenvalues ascending (matches utils.rs:20-36 sorted_eigs)."""
    Fp = X.T @ F @ X
    w, Cp = jnp.linalg.eigh(Fp)
    return X @ Cp, w


def huckel_guess(H: jax.Array, S: jax.Array, X: jax.Array, nocc: int, scale: float) -> jax.Array:
    """Extended-Hückel initial density (rhf.rs:133-150)."""
    h = jnp.diagonal(H)
    H_eht = WOLFSBERG_HELMHOLTZ * S * 0.5 * (h[:, None] + h[None, :])
    C, _ = solve_fock(H_eht, X)
    return density_from_coeffs(C, nocc, scale)


def density_rms(d_change: jax.Array, metric: str) -> jax.Array:
    """Convergence metric on the density change.

    "diag_rms" reproduces the reference exactly (rhf.rs:87-88): RMS over the
    *diagonal* of the change only, normalized by n_basis. "full_rms" is the
    defect-fixed version (SURVEY.md §7.0 item 2).
    """
    n = d_change.shape[-1]
    if metric == "diag_rms":
        return jnp.sqrt(jnp.sum(jnp.diagonal(d_change, axis1=-2, axis2=-1) ** 2, axis=-1) / n)
    if metric == "full_rms":
        return jnp.sqrt(jnp.sum(d_change**2, axis=(-2, -1)) / (n * n))
    raise ValueError(f"unknown convergence metric {metric!r}")


def electron_counts(n_electrons: int, spin_multiplicity: int) -> tuple[int, int]:
    """(n_alpha, n_beta) for a spin multiplicity 2S+1.

    spin_multiplicity == 0 is 'reference-compatible' mode: n_alpha = n_beta =
    n_electrons // 2 exactly like uhf.rs:43-45 (which silently drops an
    electron for odd counts — documented quirk SURVEY.md §7.0 item 1).
    """
    if spin_multiplicity == 0:
        return n_electrons // 2, n_electrons // 2
    n_unpaired = spin_multiplicity - 1
    if (n_electrons - n_unpaired) % 2 != 0 or n_unpaired > n_electrons:
        raise ValueError(
            f"spin multiplicity {spin_multiplicity} inconsistent with "
            f"{n_electrons} electrons"
        )
    n_beta = (n_electrons - n_unpaired) // 2
    return n_beta + n_unpaired, n_beta


def composite_guard(metric: str) -> float:
    """diag_rms guard of a "composite[:<guard>]" metric (default 1e-6)."""
    return float(metric.split(":", 1)[1]) if ":" in metric else 1e-6


#: fixed length of the rolling energy window carried in the SCF loop state
#: for the espan metric (>= any useful window; unused slots stay +inf)
ESPAN_HIST = 8


def espan_params(metric: str) -> tuple[int, float]:
    """(window, guard) of an "espan:<w>[:<guard>]" metric. The metric value
    is the SPAN (max - min) of the last <w> SCF energies, gated to +inf
    until the diagonal density RMS sinks below <guard> (default 1e-6) —
    a noise-band detector: on the emulated-f64 TPU backend the energy
    reaches its ~1e-7 noise floor long before any sub-floor |dE| or
    diag_rms rung fires (docs/PROFILE_r05.md stop-rule study)."""
    parts = metric.split(":")
    w = int(parts[1]) if len(parts) > 1 else 4
    if not 2 <= w <= ESPAN_HIST:
        raise ValueError(f"espan window {w} outside 2..{ESPAN_HIST}")
    guard = float(parts[2]) if len(parts) > 2 else 1e-6
    return w, guard


def convergence_value(metric: str, *, energy, prev_energy, err, d_change,
                      e_hist=None):
    """The scalar tested against epsilon, shared by every RHF loop variant.

    "energy": |dE| (the 1e-8 Eh criterion directly); "diis_err": commutator
    norm max|FDS - SDF| (distance-to-fixed-point — needs no extra iteration
    to observe a small CHANGE); "composite[:<guard>]": the noise-aware stop
    designed in docs/PROFILE_r04.md — |dE| gated to +inf until the
    diagonal density RMS settles below <guard> (default 1e-6), so a DIIS
    transient with a momentarily flat energy cannot trigger it; pair with
    ``converged_flag`` which additionally demands TWO consecutive passes
    below epsilon. Otherwise a density-RMS metric (density_rms). UHF keeps
    its own spin-averaged density branches (reference double-halving quirk,
    uhf.rs:137-139) but shares the scalar metrics through this helper.
    """
    if metric == "energy":
        return jnp.abs(energy - prev_energy)
    if metric in ("diis_err", "diis_err2"):
        return jnp.max(jnp.abs(err))
    if metric.startswith("composite"):
        guard = composite_guard(metric)
        de = jnp.abs(energy - prev_energy)
        diag = density_rms(d_change, "diag_rms")
        return jnp.where(diag < guard, de, jnp.inf)
    if metric.startswith("espan"):
        w, guard = espan_params(metric)
        diag = density_rms(d_change, "diag_rms")
        if e_hist is None:
            # host-driven loops track the window themselves and gate on
            # this returned diag value (models/rhf._rhf_scf_hostloop)
            return diag
        win = e_hist[:w]  # newest-first rolling window incl. this pass
        span = jnp.max(win) - jnp.min(win)
        return jnp.where(diag < guard, span, jnp.inf)
    return density_rms(d_change, metric.removesuffix("2"))


def converged_flag(metric: str, rms, prev_rms, epsilon):
    """Convergence decision for one SCF pass. All metrics stop on
    ``rms < epsilon``; the composite metric and the SUSTAINED variants
    ("diis_err2"/"diag_rms2"/"full_rms2") additionally require the
    PREVIOUS pass below epsilon too (a 2-iteration window — a single small
    value at a DIIS-transient extremum is not a stop; round-4 calibration
    measured diis_err@1e-6 triggering on an overshoot 1.6e-3 Eh off the
    fixed point, docs/PROFILE_r04.md). ``prev_rms`` is the loop state's
    previous metric value (inf initially, so iteration 0 never 2-stops)."""
    conv = rms < epsilon
    if metric.startswith("composite") or (
        metric.endswith("2") and not metric.startswith("espan")
    ):
        conv = conv & (prev_rms < epsilon)
    return conv


def shifted_solve_fock(F: jax.Array, D_occ: jax.Array, X: jax.Array,
                       S: jax.Array, shift: float):
    """Level-shifted Fock solve: adds ``shift * (I - P')`` to the
    orthogonal-basis Fock, with P' = (SX)^T D_occ (SX) the occupied
    projector there. ``D_occ`` must be the idempotent-normalized density
    (RHF passes D/2; UHF spin densities carry no factor 2). Returns (C, w).
    """
    n = F.shape[0]
    SX = S @ X
    Fp = X.T @ F @ X
    Pp = SX.T @ D_occ @ SX
    Fp = Fp + shift * (jnp.eye(n) - Pp)
    w, Cp = jnp.linalg.eigh(Fp)
    return X @ Cp, w
