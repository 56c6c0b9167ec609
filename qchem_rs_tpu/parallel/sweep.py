"""Batched conformer sweeps: one compiled RHF, vmapped over geometries and
sharded over the device mesh.

This is the "batch parallelism" axis of the workload (SURVEY.md §2.2): same
atoms + basis, a batch of geometries, one XLA program. The reference CLI can
only run one geometry per process.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models import scf
from qchem_rs_tpu.models.rhf import _rhf_scf
from qchem_rs_tpu.ops import one_electron
from qchem_rs_tpu.parallel.mesh import batch_sharding, data_mesh
from qchem_rs_tpu.utils.system import MolecularSystem


def nuclear_repulsion_jnp(charges: jax.Array, positions: jax.Array) -> jax.Array:
    diff = positions[:, None, :] - positions[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + jnp.eye(len(charges)))
    zz = charges[:, None] * charges[None, :]
    off = 1.0 - jnp.eye(len(charges))
    return 0.5 * jnp.sum(off * zz / dist)


def rhf_energy_fn(system: MolecularSystem, config: HartreeFockConfig):
    """A traceable positions -> (total_energy, converged, iterations, density)
    RHF. Optional (density_guess, use_guess) operands warm-start the SCF —
    the SAME traced program serves cold and chained runs (a None-specialized
    variant would recompile per chain step)."""
    n = system.n_basis()
    nocc = system.n_electrons(config.charge) // 2
    charges = jnp.asarray(system.charges)

    def fn(positions: jax.Array, density_guess=None, use_guess=None):
        from qchem_rs_tpu.ops.fock import eri_terms

        S = one_electron.overlap(system, positions)
        T = one_electron.kinetic(system, positions)
        V = one_electron.nuclear(system, positions)
        H = T + V
        # (ij|kl) - 1/2 (ik|jl) assembled in ONE n^4 buffer (building the full
        # ERI tensor and transposing it doubles peak HBM — the construction
        # that crashed benzene/cc-pVDZ on a 16 GB chip)
        terms = eri_terms(
            system, positions, screening_threshold=config.screening_threshold
        )
        X = scf.lowdin_x(S)
        st = _rhf_scf(
            H,
            X,
            S,
            nocc,
            config.max_iterations,
            config.epsilon,
            config.convergence_metric,
            config.diis_window(4, 6),
            config.mixing_factor,
            terms.reshape(n * n, n * n),
            jnp.zeros((n, n)) if density_guess is None else density_guess,
            jnp.asarray(False) if use_guess is None else use_guess,
        )
        total = st.energy + nuclear_repulsion_jnp(charges, positions)
        return total, st.converged, st.iteration, st.density

    return fn


def conformer_sweep(
    system: MolecularSystem,
    geometries: np.ndarray,
    config: HartreeFockConfig | None = None,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray]:
    """RHF total energies for a batch of geometries (nconf, natom, 3).

    The batch axis is sharded across the device mesh; each device runs its
    conformers with the same compiled program. Returns (energies, converged).
    """
    config = config or HartreeFockConfig()
    fn = rhf_energy_fn(system, config)
    geometries = np.asarray(geometries, dtype=np.float64)
    nconf = len(geometries)

    if mesh is None:
        mesh = data_mesh()
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    # pad the batch to a multiple of the device count
    npad = (-nconf) % ndev
    if npad:
        geometries = np.concatenate([geometries, np.repeat(geometries[:1], npad, 0)])

    sharding = batch_sharding(mesh)
    geoms_dev = jax.device_put(jnp.asarray(geometries), sharding)
    energies, converged, iters, _ = jax.jit(jax.vmap(fn))(geoms_dev)
    return (
        np.asarray(energies)[:nconf],
        np.asarray(converged)[:nconf],
    )


def chained_sweep(
    system: MolecularSystem,
    geometries: np.ndarray,
    config: HartreeFockConfig | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential conformer sweep with warm-start chaining: each geometry's
    SCF starts from the previous converged density instead of the Hückel
    guess (SURVEY.md §5 checkpoint/resume row). For correlated geometries
    (reaction paths) this typically halves the iteration count; the batched
    ``conformer_sweep`` is the throughput mode for independent conformers.

    One traced program serves the whole chain (positions, guess and the
    use-guess flag are operands): the chain compiles ONCE, each step is an
    execution. The single-program form materializes the in-core operator
    tensor, so non-incore fock modes (pair/direct — chosen precisely when
    the n^4 expansion doesn't fit) chain through the per-geometry entry
    point instead, which now also reuses one executable per geometry's
    builder.
    """
    config = config or HartreeFockConfig()
    if config.fock_mode != "incore":
        from qchem_rs_tpu.models.rhf import restricted_hartree_fock

        energies, converged = [], []
        guess = None
        for pos in np.asarray(geometries, dtype=np.float64):
            out = restricted_hartree_fock(
                system.with_positions(pos), config, density_guess=guess
            )
            energies.append(out.total_energy())
            converged.append(out.converged)
            if out.converged:
                guess = out.density
        return np.asarray(energies), np.asarray(converged)
    fn = jax.jit(rhf_energy_fn(system, config))
    n = system.n_basis()
    energies, converged = [], []
    guess = jnp.zeros((n, n))
    use = False
    for pos in np.asarray(geometries, dtype=np.float64):
        total, conv, _, density = fn(jnp.asarray(pos), guess, jnp.asarray(use))
        e_np = float(total)
        c_np = bool(conv)
        energies.append(e_np)
        converged.append(c_np)
        if c_np:
            guess, use = density, True
    return np.asarray(energies), np.asarray(converged)
