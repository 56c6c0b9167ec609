"""Analytic nuclear gradients by autodiff through the integrals.

The capability payoff of the differentiable TPU design: every integral in
this framework is a traced function of the nuclear positions (trace-time
McMurchie-Davidson codegen, ops/eri_tiled.py), so the Hartree-Fock energy
gradient is one ``jax.grad`` — no hand-derived Pulay force code, and a
capability the reference has no analogue of (qchem-rs computes single-point
energies only, /root/reference/core/src/hf/rhf.rs).

Differentiating THROUGH the SCF fixed point is neither needed nor wanted
(``lax.while_loop`` has no reverse-mode). At convergence the HF energy is
stationary with respect to orbital rotations, so the only missing piece of
d E / d x at frozen MO coefficients is the basis-overlap response (the
Pulay term). The standard autodiff formulation captures it exactly:
re-orthonormalize the converged coefficients against the moved overlap,

    M(x)  = C0^T S(x) C0        (= I at the converged geometry)
    C(x)  = C0 M(x)^{-1/2}
    E(x)  = E_HF[ D(C(x)), x ] + E_nuc(x)

E~(x) equals the SCF energy at the converged geometry and its first
derivative equals the full analytic SCF gradient: the M^{-1/2} factor
contributes exactly -Tr[W dS/dx] (the energy-weighted-density Pulay
force), and first-order orbital relaxation drops by stationarity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.ops import one_electron
from qchem_rs_tpu.utils.system import MolecularSystem


def _inv_sqrt_sym(M: jax.Array) -> jax.Array:
    """M^{-1/2} for M near the identity, by the series truncated at first
    order: I - (M - I)/2.

    NOT an eigh: at the converged geometry M == I exactly, where every
    eigenvalue is degenerate and eigh's autodiff divides by eigenvalue gaps
    (measured: finite but wildly wrong gradients). The truncation is exact
    where it is used — the VALUE at M = I is I, and d(M^{-1/2}) at M = I is
    exactly -dM/2, so first derivatives (nuclear gradients) are analytic.
    Higher derivatives would need more series terms."""
    n = M.shape[0]
    return 1.5 * jnp.eye(n) - 0.5 * M


def _make_rhf_grad(system: MolecularSystem, config: HartreeFockConfig,
                   scale: float):
    """Jitted (positions, C0, occ) -> dE/dpositions at frozen
    (re-orthonormalized) MO coefficients. ``system`` provides only shell
    STRUCTURE (geometry flows through ``positions``), so one compiled
    program serves every same-structure geometry — Hessian columns and
    optimizer steps stop retracing (the screening tile lists inside
    eri_terms come from the captured system's stored geometry; their drift
    over small displacements is below the screening threshold's own error)."""
    from qchem_rs_tpu.ops.fock import eri_terms
    from qchem_rs_tpu.parallel.sweep import nuclear_repulsion_jnp

    charges = jnp.asarray(system.charges)

    def energy(positions: jax.Array, C0: jax.Array, occ: jax.Array) -> jax.Array:
        S = one_electron.overlap(system, positions)
        H = one_electron.kinetic(system, positions) + one_electron.nuclear(
            system, positions
        )
        n = S.shape[0]
        M = C0.T @ S @ C0
        C = C0 @ _inv_sqrt_sym(M)
        D = scale * jnp.einsum("ik,k,jk->ij", C, occ, C)
        terms = eri_terms(
            system, positions, screening_threshold=config.screening_threshold
        ).reshape(n * n, n * n)
        G = (terms @ D.reshape(-1)).reshape(n, n)
        e_elec = 0.5 * jnp.sum(D * (2.0 * H + G))
        return e_elec + nuclear_repulsion_jnp(charges, positions)

    return jax.jit(jax.grad(energy, argnums=0))


def _grad_program(system: MolecularSystem, config: HartreeFockConfig,
                  kind: str, make):
    """Per-structure cache of jitted gradient programs (same registry as the
    SCF engines, models/rhf._tools_slot)."""
    from qchem_rs_tpu.models.rhf import _tools_slot

    cache = _tools_slot(system)
    key = (kind, config.screening_threshold)
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = make()
    return fn


def rhf_gradient(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    output=None,
) -> np.ndarray:
    """Analytic d E_RHF / d positions, shape (natom, 3), Hartree/Bohr.

    Runs (or reuses) a converged RHF, then differentiates the frozen-
    coefficient energy functional. The SCF must be converged tightly
    (gradient error is first-order in the residual; epsilon <= 1e-8
    recommended)."""
    from qchem_rs_tpu.models.rhf import restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    if any(config.electric_field):
        # the gradient functional does not carry the field's position-
        # dependent dipole-integral terms; silently wrong forces are worse
        # than an error
        raise NotImplementedError(
            "analytic gradients under an external electric field are not "
            "implemented; run with electric_field=(0,0,0)"
        )
    if config.fock_mode == "pair":
        # honor the no-n^4 memory envelope end to end: the pair-space
        # gradient never materializes the (n^2, n^2) operator this trace does
        from qchem_rs_tpu.models.gradients_pair import rhf_gradient_pair

        return rhf_gradient_pair(system, config, output=output)
    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; gradient would be meaningless")
    n = system.n_basis()
    nocc = system.n_electrons(config.charge) // 2
    occ = (jnp.arange(n) < nocc).astype(jnp.float64)
    C0 = jnp.asarray(out.coefficients)
    grad_fn = _grad_program(
        system, config, "rhf_grad", lambda: _make_rhf_grad(system, config, 2.0)
    )
    g = grad_fn(jnp.asarray(system.positions), C0, occ)
    return np.asarray(g)


def rhf_energy_and_gradient(system, config=None, **kw):
    """(total energy, gradient) convenience wrapper."""
    from qchem_rs_tpu.models.rhf import restricted_hartree_fock

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = restricted_hartree_fock(system, config)
    return out.total_energy(), rhf_gradient(system, config, output=out)


def is_open_shell(system: MolecularSystem, config: HartreeFockConfig) -> bool:
    """UHF-required: explicit multiplicity != singlet, or an odd electron
    count (the reference would silently run its n/2-n/2 split here —
    uhf.rs:43-45; we route to a correct UHF instead)."""
    return config.spin_multiplicity not in (0, 1) or (
        system.n_electrons(config.charge) % 2 == 1
    )


def scf_and_gradient(system, config, *, density_guess=None):
    """(output, gradient) with the SCF method chosen by shell parity —
    the shared engine behind optimize_geometry and hessian_fd, so both
    pipelines serve open shells through uhf_gradient."""
    from qchem_rs_tpu.models.rhf import restricted_hartree_fock
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    if is_open_shell(system, config):
        out = unrestricted_hartree_fock(system, config, density_guess=density_guess)
        if not out.converged:
            raise RuntimeError("SCF did not converge")
        return out, uhf_gradient(system, config, output=out)
    out = restricted_hartree_fock(system, config, density_guess=density_guess)
    if not out.converged:
        raise RuntimeError("SCF did not converge")
    return out, rhf_gradient(system, config, output=out)


def uhf_gradient(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    output=None,
) -> np.ndarray:
    """Analytic d E_UHF / d positions (same frozen-coefficient functional,
    per-spin: E = sum_s 1/2 Tr[D^s (2H + G^s)], G^s = J(D_tot) - K(D^s))."""
    from qchem_rs_tpu.models import scf
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock
    from qchem_rs_tpu.ops.fock import eri_terms
    from qchem_rs_tpu.parallel.sweep import nuclear_repulsion_jnp

    config = config or HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    if any(config.electric_field):
        raise NotImplementedError(
            "analytic gradients under an external electric field are not "
            "implemented; run with electric_field=(0,0,0)"
        )
    out = output or unrestricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; gradient would be meaningless")
    n = system.n_basis()
    nocc = scf.electron_counts(system.n_electrons(config.charge), config.spin_multiplicity)
    occ = jnp.stack(
        [(jnp.arange(n) < nocc[0]), (jnp.arange(n) < nocc[1])]
    ).astype(jnp.float64)
    C0 = jnp.asarray(out.coefficients)  # (2, n, n)

    def make():
        charges = jnp.asarray(system.charges)

        def energy(positions, C0, occ):
            S = one_electron.overlap(system, positions)
            H = one_electron.kinetic(system, positions) + one_electron.nuclear(
                system, positions
            )
            C = jax.vmap(lambda c: c @ _inv_sqrt_sym(c.T @ S @ c))(C0)
            D = jnp.einsum("sik,sk,sjk->sij", C, occ, C)  # (2, n, n), no factor 2
            from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

            eng = TiledEriEngine(
                system, config.screening_threshold, positions=positions
            )
            e4 = eng.finish_eri(eng.build())
            Dt = D[0] + D[1]
            J = jnp.einsum("ijkl,kl->ij", e4, Dt)
            K = jnp.einsum("ikjl,skl->sij", e4, D)
            G = J[None] - K
            e_elec = 0.5 * jnp.sum(D * (2.0 * H[None] + G))
            return e_elec + nuclear_repulsion_jnp(charges, positions)

        return jax.jit(jax.grad(energy, argnums=0))

    grad_fn = _grad_program(system, config, "uhf_grad", make)
    g = grad_fn(jnp.asarray(system.positions), C0, occ)
    return np.asarray(g)
