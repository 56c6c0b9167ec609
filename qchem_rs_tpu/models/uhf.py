"""Unrestricted Hartree-Fock: the spin channel is a stacked leading axis.

Algorithmic parity with /root/reference/core/src/hf/uhf.rs:36-241:
per-spin G^s = J(D^a + D^b) - K(D^s) (uhf.rs:210-227), both spins' Fock
matrices built from the *pre-update* densities and the coefficient/density
update deferred to a second phase (uhf.rs:80-135), per-spin DIIS(2,8)
(uhf.rs:76-78), energy = sum_s 1/2 Tr[D^s_new (2H + G^s_old)]
(uhf.rs:140-161), and the reference's convergence quirk — per-spin diag-RMS
averaged over spins and then halved *again* before comparison (uhf.rs:137-139)
— reproduced under the default "diag_rms" metric, fixed under "full_rms".

TPU-first: densities/Focks/DIIS stacks carry a leading spin axis of size 2;
DIIS is vmapped over it. Proper charge/spin-multiplicity support included
(the reference accepts these flags and ignores them, main.rs:111-117).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models import scf
from qchem_rs_tpu.models.diis import DiisState, diis_apply, diis_init
from qchem_rs_tpu.ops import eri as eri_ops
from qchem_rs_tpu.ops import one_electron
from qchem_rs_tpu.utils.system import MolecularSystem


@dataclasses.dataclass
class UnrestrictedHartreeFockOutput:
    """Mirrors UnrestrictedHartreeFockOutput (uhf.rs:15-34), with extras."""

    orbital_energies_alpha: np.ndarray
    orbital_energies_beta: np.ndarray
    electronic_energy: float
    nuclear_repulsion: float
    iterations: int
    converged: bool
    density: np.ndarray  # (2, n, n)
    coefficients: np.ndarray  # (2, n, n)
    timings: dict

    def total_energy(self) -> float:
        return self.electronic_energy + self.nuclear_repulsion


class _UhfState(NamedTuple):
    iteration: jax.Array
    density: jax.Array  # (2, n, n)
    diis: DiisState  # leading spin axis on each field
    energy: jax.Array
    rms: jax.Array
    converged: jax.Array
    orbital_energies: jax.Array  # (2, n)
    coefficients: jax.Array  # (2, n, n)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 13))
def _uhf_scf(
    H: jax.Array,
    X: jax.Array,
    S: jax.Array,
    nocc: tuple[int, int],
    max_iterations: int,
    epsilon: float,
    metric: str,
    diis_window: tuple[int, int],
    mixing: float,
    n: int,
    eri_mat: jax.Array,  # (n^2, n^2) (ij|kl)
    k_mat: jax.Array,  # (n^2, n^2) (ik|jl)
    density_guess: Optional[jax.Array] = None,  # (2, n, n) warm start
    verbose: bool = False,
) -> _UhfState:
    diis_min, diis_max = diis_window
    occ_mask = jnp.stack(
        [jnp.arange(n) < nocc[0], jnp.arange(n) < nocc[1]]
    ).astype(H.dtype)  # (2, n)

    D0 = (
        jnp.stack(
            [
                scf.huckel_guess(H, S, X, nocc[0], scale=1.0),
                scf.huckel_guess(H, S, X, nocc[1], scale=1.0),
            ]
        )
        if density_guess is None
        else density_guess
    )

    def body(st: _UhfState) -> _UhfState:
        D = st.density  # (2, n, n)
        Dtot = D[0] + D[1]
        J = (eri_mat @ Dtot.reshape(-1)).reshape(n, n)
        K = (k_mat @ D.reshape(2, -1).T).T.reshape(2, n, n)
        G = J[None] - K  # (2, n, n), uhf.rs:210-227
        F = H[None] + G
        err = F @ D @ S[None] - S[None] @ D @ F
        F, diis = jax.vmap(lambda s, e, f: diis_apply(s, e, f, diis_min))(st.diis, err, F)
        C, w = jax.vmap(lambda f: scf.solve_fock(f, X))(F)
        # per-spin density via occupation masks (static shapes for both spins)
        D_new = jnp.einsum("sik,sk,sjk->sij", C, occ_mask, C)
        d_change = D_new - D
        D = D + mixing * d_change
        energy = 0.5 * jnp.sum(D * (2.0 * H[None] + G))  # uhf.rs:145-153
        per_spin_rms = scf.density_rms(d_change, metric)  # (2,)
        if metric == "diag_rms":
            # uhf.rs:137-139: average over spins, then halve AGAIN in the test
            rms = jnp.sum(per_spin_rms) / 2.0
            conv = rms / 2.0 < epsilon
        else:
            rms = jnp.mean(per_spin_rms)
            conv = rms < epsilon
        if verbose:  # uhf.rs:138 log::info! analogue
            jax.debug.print(
                "iteration {i} - density rms {r:03.3e}", i=st.iteration, r=rms
            )
        return _UhfState(
            iteration=st.iteration + 1,
            density=D,
            diis=diis,
            energy=energy,
            rms=rms,
            converged=conv,
            orbital_energies=w,
            coefficients=C,
        )

    def cond(st: _UhfState) -> jax.Array:
        return (~st.converged) & (st.iteration <= max_iterations)

    init = _UhfState(
        iteration=jnp.zeros((), jnp.int32),
        density=D0,
        diis=DiisState(
            errors=jnp.zeros((2, diis_max, n, n)),
            focks=jnp.zeros((2, diis_max, n, n)),
            count=jnp.zeros((2,), jnp.int32),
        ),
        energy=jnp.zeros(()),
        rms=jnp.asarray(jnp.inf),
        converged=jnp.zeros((), bool),
        orbital_energies=jnp.zeros((2, n)),
        coefficients=jnp.zeros((2, n, n)),
    )
    return jax.lax.while_loop(cond, body, init)


from weakref import WeakKeyDictionary

_UHF_DRIVERS: "WeakKeyDictionary[MolecularSystem, dict]" = WeakKeyDictionary()


def _uhf_driver(
    system: MolecularSystem,
    config: HartreeFockConfig,
    nocc: tuple[int, int],
    warm: bool = False,
):
    key = (
        "uhf",
        nocc,
        warm,
        config.max_iterations,
        config.epsilon,
        config.convergence_metric,
        config.diis_window(2, 8),
        config.mixing_factor,
        config.verbose,
        config.screening_threshold,
    )
    cache = _UHF_DRIVERS.setdefault(system, {})
    if key not in cache:
        n = system.n_basis()

        def full(positions, density_guess=None):
            S = one_electron.overlap(system, positions)
            T = one_electron.kinetic(system, positions)
            V = one_electron.nuclear(system, positions)
            H = T + V
            E4 = eri_ops.eri(
                system, positions, screening_threshold=config.screening_threshold
            )
            eri_mat = E4.reshape(n * n, n * n)
            k_mat = jnp.transpose(E4, (0, 2, 1, 3)).reshape(n * n, n * n)
            X = scf.lowdin_x(S)
            return _uhf_scf(
                H,
                X,
                S,
                nocc,
                config.max_iterations,
                config.epsilon,
                config.convergence_metric,
                config.diis_window(2, 8),
                config.mixing_factor,
                n,
                eri_mat,
                k_mat,
                density_guess,
                config.verbose,
            )

        cache[key] = jax.jit(full) if warm else jax.jit(lambda p: full(p))
    return cache[key]


def unrestricted_hartree_fock(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    density_guess: Optional[np.ndarray] = None,
) -> UnrestrictedHartreeFockOutput:
    """Run UHF (reference entry point uhf.rs:36-39), with working charge /
    spin-multiplicity support (config.spin_multiplicity == 0 reproduces the
    reference's n/2-n/2 behavior)."""
    import time

    config = config or HartreeFockConfig()
    n_electrons = system.n_electrons(config.charge)
    nocc = scf.electron_counts(n_electrons, config.spin_multiplicity)

    timings: dict = {}
    warm = density_guess is not None
    driver = _uhf_driver(system, config, nocc, warm=warm)
    t0 = time.perf_counter()
    positions = jnp.asarray(system.positions)
    st = driver(positions, jnp.asarray(density_guess)) if warm else driver(positions)
    st.density.block_until_ready()
    timings["total_s"] = time.perf_counter() - t0

    return UnrestrictedHartreeFockOutput(
        orbital_energies_alpha=np.asarray(st.orbital_energies[0]),
        orbital_energies_beta=np.asarray(st.orbital_energies[1]),
        electronic_energy=float(st.energy),
        nuclear_repulsion=system.nuclear_repulsion(),
        iterations=int(st.iteration) - 1,
        converged=bool(st.converged),
        density=np.asarray(st.density),
        coefficients=np.asarray(st.coefficients),
        timings=timings,
    )
