"""Restricted Hartree-Fock as a jit-compiled fixed-point iteration.

Algorithmic parity with /root/reference/core/src/hf/rhf.rs:32-181:
nuclear repulsion (rhf.rs:110-122), H = T + V (rhf.rs:48), Löwdin X
(rhf.rs:124-131), Hückel guess (rhf.rs:133-150), the antisymmetrized ERI
table (ij|kl) - 1/2 (ik|jl) (rhf.rs:58-62) realized as one (n^2, n^2)
matrix so the per-iteration G build is a single MXU matmul, DIIS(4,6)
(rhf.rs:65), FDS-SDF error (rhf.rs:71), E = 1/2 Tr[D(2H + G)] computed with
the *updated* density but the *pre-update* G exactly like rhf.rs:84-85, and
the diagonal-only density-RMS convergence test (rhf.rs:87-88).

Divergences (documented; SURVEY.md §7.0): charge is honored (reference sums
ordinals only), convergence metric and damping are configurable, and
non-convergence returns a structured result instead of None/panic.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models import scf
from qchem_rs_tpu.models.diis import DiisState, diis_apply, diis_init
from qchem_rs_tpu.ops import eri as eri_ops
from qchem_rs_tpu.ops import fock_matvec
from qchem_rs_tpu.ops import one_electron
from qchem_rs_tpu.utils.system import MolecularSystem


@dataclasses.dataclass
class RestrictedHartreeFockOutput:
    """Mirrors RestrictedHartreeFockOutput (rhf.rs:14-30), with extras."""

    orbital_energies: np.ndarray  # ascending
    electronic_energy: float
    nuclear_repulsion: float
    iterations: int
    converged: bool
    # extras beyond the reference output:
    density: np.ndarray
    coefficients: np.ndarray
    timings: dict

    def total_energy(self) -> float:
        return self.electronic_energy + self.nuclear_repulsion


class _ScfState(NamedTuple):
    iteration: jax.Array
    density: jax.Array
    diis: DiisState
    energy: jax.Array
    rms: jax.Array
    converged: jax.Array
    orbital_energies: jax.Array
    coefficients: jax.Array
    # rolling energy window (newest first) for the espan metric; None (an
    # empty pytree node) for every other metric so their executables and
    # cached programs are unchanged
    e_hist: jax.Array | None = None


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 12, 13, 14))
def _rhf_scf(
    H: jax.Array,
    X: jax.Array,
    S: jax.Array,
    nocc: int,
    max_iterations: int,
    epsilon: float,
    metric: str,
    diis_window: tuple[int, int],
    mixing: float,
    terms_mat,  # "f64": (n^2, n^2) f64 terms; "df": its split_terms pair
    density_guess: jax.Array,  # (n, n); selected by use_guess
    use_guess: jax.Array,  # () bool, TRACED: warm starts (checkpoint/sweep)
    # reuse the same compiled executable as cold runs — a static/None guess
    # would specialize the program and force a fresh ~45 s TPU compile
    verbose: bool = False,
    level_shift: float = 0.0,
    matvec: str = "f64",
) -> _ScfState:
    n = H.shape[0]
    diis_min, diis_max = diis_window
    D0 = jnp.where(
        use_guess, density_guess, scf.huckel_guess(H, S, X, nocc, scale=2.0)
    )

    def body(st: _ScfState) -> _ScfState:
        D = st.density
        if matvec == "df":
            # double-float Pallas matvec: the emulated-f64 dot is the whole
            # per-iteration cost on TPU (ops/fock_matvec.py)
            G = fock_matvec.matvec_df(
                terms_mat[0], terms_mat[1], D.reshape(-1), n * n
            ).reshape(n, n)
        else:
            G = (terms_mat @ D.reshape(-1)).reshape(n, n)  # rhf.rs:152-167 as one matmul
        F = H + G
        err = F @ D @ S - S @ D @ F  # rhf.rs:71
        F, diis = diis_apply(st.diis, err, F, diis_min)
        if level_shift != 0.0:
            C, w = scf.shifted_solve_fock(F, 0.5 * D, X, S, level_shift)
        else:
            C, w = scf.solve_fock(F, X)
        D_new = scf.density_from_coeffs(C, nocc, scale=2.0)
        d_change = D_new - D
        D = D + mixing * d_change  # rhf.rs:78-82 (F = 1.0 default)
        energy = 0.5 * jnp.sum(D * (2.0 * H + G))  # rhf.rs:84-85 (post-update D, pre-update G)
        e_hist = (
            jnp.roll(st.e_hist, 1).at[0].set(energy)
            if st.e_hist is not None else None
        )
        rms = scf.convergence_value(
            metric, energy=energy, prev_energy=st.energy, err=err,
            d_change=d_change, e_hist=e_hist,
        )
        conv = scf.converged_flag(metric, rms, st.rms, epsilon)
        if verbose:  # in-jit analogue of the reference's per-iteration log::info!
            jax.debug.print(
                "iteration {i:<4} - electronic energy {e:1.4f}. density rms {r:1.4e}",
                i=st.iteration,
                e=energy,
                r=rms,
            )
        return _ScfState(
            iteration=st.iteration + 1,
            density=D,
            diis=diis,
            energy=energy,
            rms=rms,
            converged=conv,
            orbital_energies=w,
            coefficients=C,
            e_hist=e_hist,
        )

    def cond(st: _ScfState) -> jax.Array:
        # reference loops 0..=max_iterations (rhf.rs:66): max_iterations+1 passes
        return (~st.converged) & (st.iteration <= max_iterations)

    init = _ScfState(
        iteration=jnp.zeros((), jnp.int32),
        density=D0,
        diis=diis_init(diis_max, n),
        energy=jnp.zeros(()),
        rms=jnp.asarray(jnp.inf),
        converged=jnp.zeros((), bool),
        orbital_energies=jnp.zeros(n),
        coefficients=jnp.zeros((n, n)),
        e_hist=(
            jnp.full((scf.ESPAN_HIST,), jnp.inf)
            if metric.startswith("espan") else None
        ),
    )
    return jax.lax.while_loop(cond, body, init)


# Compilation strategy (see docs/DESIGN.md): for concrete geometries the
# in-core path runs MODULAR programs (one per quartet class + one SCF), which
# the axon remote compile service can build in parallel threads
# (ops/incore.py). The fully-traceable single-program path lives in
# parallel/sweep.rhf_energy_fn (vmapped conformer sweeps).
from weakref import WeakKeyDictionary

# Engines/builders keyed by STRUCTURE, not system identity: geometry enters
# every compiled program as a runtime operand, so displaced geometries
# (optimize / frequencies / chained sweeps) reuse all executables instead of
# recompiling per geometry. Outer key is the BasisSet object (weak — entries
# die with the basis); inner key is (structure_key, tool key).
_RHF_TOOLS: "WeakKeyDictionary[object, dict]" = WeakKeyDictionary()


def _tools_slot(system: MolecularSystem) -> dict:
    per_basis = _RHF_TOOLS.setdefault(system.basis, {})
    return per_basis.setdefault(system.structure_key(), {})


def _rebind(engine, system: MolecularSystem) -> None:
    """Point a structure-cached engine at ``system``'s geometry (no-op when
    already bound to it)."""
    pos = np.asarray(system.positions)
    bound = getattr(engine, "_bound_positions", None)
    if bound is None or not np.array_equal(bound, pos):
        engine.rebind_positions(pos)
        engine._bound_positions = pos


def _matvec_mode() -> str:
    """In-core Fock matvec arithmetic: "df" = the double-float Pallas kernel
    (ops/fock_matvec.py — default on TPU, where the emulated-f64 dot runs at
    ~2.6 GFLOP/s and is the whole per-iteration cost); "f64" = the native
    XLA matmul (default on CPU; also the AD paths — Mosaic has no VJP).
    QCHEM_INCORE_MATVEC overrides; a QCHEM_KERNEL=f64 fallback (bench retry
    insurance) drags the matvec back to f64 with it."""
    env = os.environ.get("QCHEM_INCORE_MATVEC")
    if env:
        return env
    from qchem_rs_tpu.ops.eri_tiled import _kernel_mode

    if jax.default_backend() == "tpu" and _kernel_mode() != "f64":
        return "df"
    return "f64"


def _scf_statics(config: HartreeFockConfig, nocc: int, matvec: str = "f64") -> tuple:
    """The full static-argument tuple baked into a compiled _rhf_scf
    executable. A cached executable may only be reused when this matches the
    current run's config — reusing across configs would silently execute the
    old statics (wrong nocc/epsilon/...)."""
    return (
        nocc,
        config.max_iterations,
        config.epsilon,
        config.convergence_metric,
        config.diis_window(4, 6),
        config.mixing_factor,
        config.verbose,
        config.level_shift,
        matvec,
    )


def _direct_tools(system: MolecularSystem, config: HartreeFockConfig, kind: str):
    """Cached pair/streaming Fock builders (screening + tile lists + jitted
    programs survive across runs AND across same-structure geometries —
    rebuilding them per call redid Schwarz bounds and recompiled everything)."""
    key = (kind, config.screening_threshold)
    cache = _tools_slot(system)
    builder = cache.get(key)
    if builder is None:
        if kind == "pair":
            from qchem_rs_tpu.ops.fock_pair import PairSpaceFockBuilder

            builder = PairSpaceFockBuilder(
                system, threshold=config.screening_threshold
            )
        else:
            from qchem_rs_tpu.ops.fock_stream import StreamingFockBuilder

            builder = StreamingFockBuilder(
                system, threshold=config.screening_threshold
            )
        builder.engine._bound_positions = np.asarray(system.positions)
        cache[key] = builder
    else:
        before = getattr(builder.engine, "_bound_positions", None)
        _rebind(builder.engine, system)
        if before is not getattr(builder.engine, "_bound_positions", None):
            builder._prepared = None  # pair matrices were for the old geometry
    return builder


def _incore_tools(system: MolecularSystem, config: HartreeFockConfig):
    """Modular per-structure programs: 1e integrals + tiled pair-space
    engine. The ``ones`` closures capture the FIRST system of a structure,
    but geometry flows only through their ``pos`` argument, so they serve
    every same-structure geometry."""
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

    key = ("incore", config.screening_threshold)
    cache = _tools_slot(system)
    tools = cache.get(key)
    if tools is None:
        ones = {
            "S": jax.jit(lambda pos: one_electron.overlap(system, pos)),
            "T": jax.jit(lambda pos: one_electron.kinetic(system, pos)),
            "V": jax.jit(lambda pos: one_electron.nuclear(system, pos)),
            # H = T + V and the Löwdin transform as one program so the run
            # path triggers no fresh compiles after precompile
            "prep": jax.jit(lambda S, T, V: (T + V, scf.lowdin_x(S))),
        }
        engine = TiledEriEngine(system, config.screening_threshold)
        engine._bound_positions = np.asarray(system.positions)
        tools = cache[key] = (ones, engine)
    else:
        _rebind(tools[1], system)
    return tools


def precompile_rhf(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    max_workers: int | None = None,
) -> None:
    """Compile every program an RHF run needs, in parallel threads.

    Amortizes the TPU backend's high per-program compile latency. In-core
    mode compiles the full program set (1e, V2 classes, finish, SCF fixed
    point); pair/direct modes compile the V2 class-pair programs — the
    dominant cold cost (12-58 s each on the axon remote compiler) that
    otherwise compiles serially inline with zero log visibility (the
    round-5 naphthalene timeouts).
    """
    from qchem_rs_tpu.ops.incore import precompile

    config = config or HartreeFockConfig()
    if config.fock_mode in ("pair", "direct"):
        builder = _direct_tools(
            system, config, "pair" if config.fock_mode == "pair" else "direct"
        )
        engine = builder.engine
        programs = [p for p in engine.programs() if p[0].startswith("v2_")]
        compiled = precompile(programs, max_workers=max_workers)
        engine._compiled = {**getattr(engine, "_compiled", {}), **compiled}
        return
    nocc = system.n_electrons(config.charge) // 2
    ones, engine = _incore_tools(system, config)
    n = system.n_basis()
    pos_spec = jax.ShapeDtypeStruct((len(system.atoms), 3), jnp.float64)
    mat = jax.ShapeDtypeStruct((n, n), jnp.float64)
    terms_f64 = jax.ShapeDtypeStruct((n * n, n * n), jnp.float64)
    matvec = _matvec_mode()
    programs = [(k, fn, (pos_spec,)) for k, fn in ones.items() if k != "prep"]
    programs.append(("prep", ones["prep"], (mat, mat, mat)))
    programs += engine.programs()
    if matvec == "df":
        mp = fock_matvec.padded_m(n * n)
        half = jax.ShapeDtypeStruct((mp, mp), jnp.float32)
        terms_spec = (half, half)
        programs.append(("split", fock_matvec.split_terms, (terms_f64,)))
    else:
        terms_spec = terms_f64
    programs.append(
        (
            "scf",
            _rhf_scf,
            (
                mat, mat, mat, nocc,
                config.max_iterations, config.epsilon, config.convergence_metric,
                config.diis_window(4, 6), config.mixing_factor, terms_spec,
                mat, jax.ShapeDtypeStruct((), jnp.bool_),
                config.verbose, config.level_shift, matvec,
            ),
        )
    )
    compiled = precompile(programs, max_workers=max_workers)
    engine._compiled = {
        k: v for k, v in compiled.items()
        if k.startswith("v2_") or k.startswith("finish")
    }
    engine._compiled_ones = {
        k: compiled.get(k, ones[k]) for k in ("S", "T", "V", "prep")
    }
    # keyed by the full static tuple: a later run with a different config must
    # NOT reuse this executable (its nocc/epsilon/... are baked in)
    scf_cache = getattr(engine, "_compiled_scf", None)
    if not isinstance(scf_cache, dict):
        scf_cache = {}
    if "scf" in compiled:
        scf_cache[_scf_statics(config, nocc, matvec)] = compiled["scf"]
    engine._compiled_scf = scf_cache
    if "split" in compiled:
        engine._compiled_split = compiled["split"]


def _field_terms(system, positions, field):
    """Core-Hamiltonian and nuclear contributions of a uniform external
    electric field (config.electric_field). The electron carries charge -1,
    so its energy in field F is +F.r -> H += sum_d F_d <i|r_d|j>; nuclei
    contribute -sum_A Z_A F.R_A to the classical energy. The field enters
    as data (H is an operand of every SCF program), so finite-field sweeps
    reuse one executable. Returns (dH, dE_nuclear)."""
    from qchem_rs_tpu.ops import one_electron

    F = jnp.asarray(field, dtype=jnp.float64)
    r = one_electron.dipole_integrals(system, positions)
    dH = jnp.einsum("d,dij->ij", F, r)
    de = -float(np.dot(system.charges, np.asarray(positions) @ np.asarray(field)))
    return dH, de


def _rhf_scf_direct(
    H: jax.Array,
    X: jax.Array,
    S: jax.Array,
    nocc: int,
    config: HartreeFockConfig,
    jk_fn,
    density_guess: Optional[jax.Array] = None,
    use_guess=None,
) -> _ScfState:
    """SCF loop with a traceable J/K builder closure (pair-space matvecs,
    sharded builders). ``use_guess`` (traced bool) selects the guess at RUN
    time so one compiled program serves cold and warm starts.

    Same fixed-point structure as _rhf_scf.
    """
    n = H.shape[0]
    diis_min, diis_max = config.diis_window(4, 6)
    if density_guess is None:
        D0 = scf.huckel_guess(H, S, X, nocc, scale=2.0)
    elif use_guess is None:
        D0 = density_guess
    else:
        D0 = jnp.where(
            use_guess,
            density_guess,
            scf.huckel_guess(H, S, X, nocc, scale=2.0),
        )

    def body(st: _ScfState) -> _ScfState:
        D = st.density
        J, K = jk_fn(D)
        G = J - 0.5 * K
        F = H + G
        err = F @ D @ S - S @ D @ F
        F, diis = diis_apply(st.diis, err, F, diis_min)
        if config.level_shift != 0.0:
            C, w = scf.shifted_solve_fock(F, 0.5 * D, X, S, config.level_shift)
        else:
            C, w = scf.solve_fock(F, X)
        D_new = scf.density_from_coeffs(C, nocc, scale=2.0)
        d_change = D_new - D
        D = D + config.mixing_factor * d_change
        energy = 0.5 * jnp.sum(D * (2.0 * H + G))
        e_hist = (
            jnp.roll(st.e_hist, 1).at[0].set(energy)
            if st.e_hist is not None else None
        )
        rms = scf.convergence_value(
            config.convergence_metric, energy=energy, prev_energy=st.energy,
            err=err, d_change=d_change, e_hist=e_hist,
        )
        conv = scf.converged_flag(config.convergence_metric, rms, st.rms,
                                  config.epsilon)
        if config.verbose:
            jax.debug.print(
                "iteration {i:<4} - electronic energy {e:1.4f}. density rms {r:1.4e}",
                i=st.iteration,
                e=energy,
                r=rms,
            )
        return _ScfState(
            iteration=st.iteration + 1,
            density=D,
            diis=diis,
            energy=energy,
            rms=rms,
            converged=conv,
            orbital_energies=w,
            coefficients=C,
            e_hist=e_hist,
        )

    def cond(st: _ScfState) -> jax.Array:
        return (~st.converged) & (st.iteration <= config.max_iterations)

    init = _ScfState(
        iteration=jnp.zeros((), jnp.int32),
        density=D0,
        diis=diis_init(diis_max, n),
        energy=jnp.zeros(()),
        rms=jnp.asarray(jnp.inf),
        converged=jnp.zeros((), bool),
        orbital_energies=jnp.zeros(n),
        coefficients=jnp.zeros((n, n)),
        e_hist=(
            jnp.full((scf.ESPAN_HIST,), jnp.inf)
            if config.convergence_metric.startswith("espan") else None
        ),
    )
    return jax.lax.while_loop(cond, body, init)


def _rhf_step_program(config: HartreeFockConfig, nocc: int):
    """One jitted SCF iteration (dense algebra only) for the host-driven
    direct loop. H/X/S are ARGUMENTS so the executable is geometry-free and
    cacheable across runs (a per-call closure would retrace + recompile
    every run)."""
    diis_min, _ = config.diis_window(4, 6)
    level_shift = config.level_shift

    @jax.jit
    def step(H, X, S, D, diis, J, K, prev_e):
        G = J - 0.5 * K
        F = H + G
        err = F @ D @ S - S @ D @ F
        F, diis = diis_apply(diis, err, F, diis_min)
        if level_shift != 0.0:
            C, w = scf.shifted_solve_fock(F, 0.5 * D, X, S, level_shift)
        else:
            C, w = scf.solve_fock(F, X)
        D_new = scf.density_from_coeffs(C, nocc, scale=2.0)
        d_change = D_new - D
        D2 = D + config.mixing_factor * d_change
        energy = 0.5 * jnp.sum(D2 * (2.0 * H + G))
        rms = scf.convergence_value(
            config.convergence_metric, energy=energy, prev_energy=prev_e,
            err=err, d_change=d_change,
        )
        return D2, diis, energy, rms, w, C

    return step


def _rhf_scf_hostloop(
    H, X, S, nocc: int, config: HartreeFockConfig, jk_host, density_guess=None,
    step_cache: dict | None = None,
) -> _ScfState:
    """Host-driven SCF for the STREAMING direct builder (ops/fock_stream.py):
    ``jk_host(D)`` executes one bounded device program per tile segment, so
    arbitrarily large systems never trip the backend's ~60 s execution
    watchdog (a single jitted while_loop would). The per-iteration dense
    algebra runs as one small jitted step program, cached in ``step_cache``
    (keyed by the run statics) across runs."""
    n = H.shape[0]
    _, diis_max = config.diis_window(4, 6)
    key = _scf_statics(config, nocc)
    step = None if step_cache is None else step_cache.get(key)
    if step is None:
        step = _rhf_step_program(config, nocc)
        if step_cache is not None:
            step_cache[key] = step

    D = (
        scf.huckel_guess(H, S, X, nocc, scale=2.0)
        if density_guess is None
        else jnp.asarray(density_guess)
    )
    diis = diis_init(diis_max, n)
    energy = jnp.zeros(())
    w = jnp.zeros(n)
    C = jnp.zeros((n, n))
    rms = jnp.asarray(jnp.inf)
    converged = False
    passes = 0
    prev_rms = float("inf")
    import os as _os
    import sys as _sys
    import time as _time

    log = _os.environ.get("QCHEM_COMPILE_LOG")
    espan = config.convergence_metric.startswith("espan")
    if espan:
        # host-side window: the step program's rms IS diag_rms for espan
        # (scf.convergence_value with e_hist=None)
        espan_w, espan_guard = scf.espan_params(config.convergence_metric)
        e_window: list[float] = []
    # reference bound: 0..=max_iterations (rhf.rs:66)
    for _ in range(config.max_iterations + 1):
        t_it = _time.perf_counter() if log else 0.0
        J, K = jk_host(D)
        D, diis, energy, rms, w, C = step(H, X, S, D, diis, J, K, energy)
        passes += 1
        if log:
            # float(rms) below drains the device, so this is a real
            # per-iteration wall time (session visibility: the r5c/r5d
            # naphthalene timeouts gave no sign of where 1800 s went)
            print(
                f"# hostloop iter {passes - 1}: rms {float(rms):.3e} "
                f"({_time.perf_counter() - t_it:.2f}s)",
                file=_sys.stderr, flush=True,
            )
        if config.verbose:
            print(
                f"iteration {passes - 1:<4} - electronic energy "
                f"{float(energy):1.4f}. density rms {float(rms):1.4e}"
            )
        if espan:
            e_window.append(float(energy))
            win = e_window[-espan_w:]
            span = max(win) - min(win) if len(win) >= espan_w else float("inf")
            if span < config.epsilon and float(rms) < espan_guard:
                converged = True
                break
        elif bool(scf.converged_flag(config.convergence_metric, float(rms),
                                     prev_rms, config.epsilon)):
            converged = True
            break
        prev_rms = float(rms)
    return _ScfState(
        iteration=jnp.asarray(passes, jnp.int32),
        density=D,
        diis=diis,
        energy=energy,
        rms=rms,
        converged=jnp.asarray(converged),
        orbital_energies=w,
        coefficients=C,
    )


def restricted_hartree_fock(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    density_guess: Optional[np.ndarray] = None,
) -> RestrictedHartreeFockOutput:
    """Run RHF on a molecular system (reference entry point rhf.rs:32-35).

    ``density_guess`` warm-starts the SCF (checkpoint resume, conformer-sweep
    chaining) in place of the extended-Hückel guess.
    """
    import time

    config = config or HartreeFockConfig()
    n_electrons = system.n_electrons(config.charge)
    if config.spin_multiplicity not in (0, 1):
        raise ValueError("RHF requires a closed shell (spin multiplicity 1)")
    if n_electrons % 2 != 0 and config.spin_multiplicity == 1:
        raise ValueError(f"RHF needs an even electron count, got {n_electrons}")
    nocc = n_electrons // 2

    timings: dict = {}
    if density_guess is None and config.initial_guess == "sad":
        from qchem_rs_tpu.models.sad import sad_guess

        t_g = time.perf_counter()
        density_guess = sad_guess(system, charge=config.charge)
        timings["guess_s"] = time.perf_counter() - t_g
    warm = density_guess is not None
    positions = jnp.asarray(system.positions)
    e_field_nuc = 0.0
    t0 = time.perf_counter()
    if config.fock_mode in ("direct", "pair"):
        from qchem_rs_tpu.ops import one_electron

        S = one_electron.overlap(system, positions)
        H = one_electron.kinetic(system, positions) + one_electron.nuclear(
            system, positions
        )
        if any(config.electric_field):
            dH, e_field_nuc = _field_terms(system, positions, config.electric_field)
            H = H + dH
        X = scf.lowdin_x(S)
        guess = jnp.asarray(density_guess) if warm else None
        if config.fock_mode == "pair":
            # pair-space matrices built once (no n^4 tensor, no per-iteration
            # integral recomputation); passed as jit ARGUMENTS so the GB-scale
            # operands don't get baked into the executable
            builder = _direct_tools(system, config, "pair")
            t1 = time.perf_counter()
            V2f, W = builder.prepare(force=True)
            jax.block_until_ready(W if W is not None else V2f)
            timings["eri_s"] = time.perf_counter() - t1

            if builder.lean:
                # LEAN pair mode runs the HOST-DRIVEN loop: a single jitted
                # while_loop carries V2f in its loop tuple, and the AOT
                # planner buffers the carry at ~4x V2f — a naphthalene/
                # cc-pVDZ program planned a 19.3 GB f32[8, M, M] allocation
                # on the 16 GB chip (r5c phase 3). The host loop keeps V2f a
                # plain device operand of one small jk program per pass.
                cache = getattr(builder, "_step_cache", None)
                if cache is None:
                    cache = builder._step_cache = {}
                st = _rhf_scf_hostloop(
                    H, X, S, nocc, config, builder.jk, guess,
                    step_cache=cache,
                )
                st.density.block_until_ready()
                timings["scf_s"] = time.perf_counter() - t1 - timings["eri_s"]
                timings["total_s"] = time.perf_counter() - t0
                return _rhf_output(system, st, timings, e_field_nuc)

            # the jitted SCF program is cached on the builder keyed by the
            # run statics: a fresh closure per call would retrace (and on
            # the TPU backend recompile, ~45 s) EVERY run; the guess is a
            # traced operand so warm starts share the cold executable
            cache = getattr(builder, "_rhf_scf_cache", None)
            if cache is None:
                cache = builder._rhf_scf_cache = {}
            key = _scf_statics(config, nocc)
            jfn = cache.get(key)
            if jfn is None:

                def run(H, X, S, V2f, W, g, use):
                    jk = lambda D: builder.jk_sph(D, V2f, W)
                    return _rhf_scf_direct(H, X, S, nocc, config, jk, g, use)

                jfn = cache[key] = jax.jit(run)
            n = system.n_basis()
            st = jfn(
                H, X, S, V2f, W,
                guess if warm else jnp.zeros((n, n)),
                jnp.asarray(warm),
            )
        else:
            # streaming direct: tile-engine integrals digested into J/K on
            # the fly (ops/fock_stream.py), host-driven SCF so every device
            # call stays under the execution watchdog at any system size
            builder = _direct_tools(system, config, "direct")
            cache = getattr(builder, "_step_cache", None)
            if cache is None:
                cache = builder._step_cache = {}
            st = _rhf_scf_hostloop(
                H, X, S, nocc, config, builder.jk, guess, step_cache=cache
            )
    else:
        # modular in-core path: per-class-pair V2 programs + one SCF program
        ones, engine = _incore_tools(system, config)
        cones = getattr(engine, "_compiled_ones", ones)
        t1 = time.perf_counter()
        S = cones["S"](positions)
        T_ = cones["T"](positions)
        V_ = cones["V"](positions)
        H, X = cones["prep"](S, T_, V_)
        if any(config.electric_field):
            dH, e_field_nuc = _field_terms(system, positions, config.electric_field)
            H = H + dH
        S.block_until_ready()
        timings["one_electron_s"] = time.perf_counter() - t1
        t1 = time.perf_counter()
        terms_mat = engine.finish_terms(engine.build())
        matvec = _matvec_mode()
        if matvec == "df":
            # split ONCE per build into the padded (hi, lo) f32 pair the
            # Pallas matvec consumes (ops/fock_matvec.py); the f64 source
            # buffer dies with this local
            split = getattr(engine, "_compiled_split", fock_matvec.split_terms)
            terms_ops = split(terms_mat)
            terms_ops[0].block_until_ready()
        else:
            terms_ops = terms_mat
            terms_ops.block_until_ready()
        del terms_mat
        timings["eri_s"] = time.perf_counter() - t1
        t1 = time.perf_counter()
        n = system.n_basis()
        guess_arr = (
            jnp.asarray(density_guess) if warm else jnp.zeros((n, n))
        )
        use_g = jnp.asarray(warm)
        scf_cache = getattr(engine, "_compiled_scf", None) or {}
        cscf = scf_cache.get(_scf_statics(config, nocc, matvec)) if isinstance(scf_cache, dict) else None
        if cscf is not None:
            # warm starts share the executable: the guess is an operand
            st = cscf(H, X, S, terms_ops, guess_arr, use_g)
        else:
            st = _rhf_scf(
                H, X, S, nocc,
                config.max_iterations, config.epsilon, config.convergence_metric,
                config.diis_window(4, 6), config.mixing_factor, terms_ops,
                guess_arr, use_g, config.verbose, config.level_shift, matvec,
            )
        st.density.block_until_ready()  # dispatch is async; time the work
        timings["scf_s"] = time.perf_counter() - t1
    st.density.block_until_ready()
    timings["total_s"] = time.perf_counter() - t0
    return _rhf_output(system, st, timings, e_field_nuc)


def _rhf_output(system, st, timings, e_field_nuc=0.0):
    return RestrictedHartreeFockOutput(
        orbital_energies=np.asarray(st.orbital_energies),
        electronic_energy=float(st.energy),
        nuclear_repulsion=system.nuclear_repulsion() + e_field_nuc,
        iterations=int(st.iteration) - 1,  # reference reports the 0-based pass index
        converged=bool(st.converged),
        density=np.asarray(st.density),
        coefficients=np.asarray(st.coefficients),
        timings=timings,
    )
