"""Command-line interface.

Parity with the reference CLI (/root/reference/qchem-cli/src/main.rs:10-62):
subcommands ``rhf`` and ``uhf`` with ``--basis-set/-b``, ``--molecule/-m``,
``--max-iterations`` (default 100), ``--epsilon`` (default 1e-6); ``uhf``
additionally ``--charge/-c`` and ``--spin-multiplicity/-s`` — which here
actually *work* (the reference accepts and drops them, main.rs:111-117).
Printed fields mirror main.rs:98-106/143-152 (energies at 3 decimals, timing,
orbital energy lists). Non-convergence exits with an error instead of a Rust
panic.

Extensions beyond the reference: ``--charge`` on rhf, ``--convergence`` metric
selection, ``--verbose`` that works, a ``sweep`` subcommand for batched
conformer scans, and ``info`` for system inspection.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

# Quiet XLA's C++ log spam on the user surface (overridable via the env).
# In particular cpu_aot_loader.cc prints a full-page ERROR on every persistent
# -cache hit whose only feature mismatch is XLA's own tuning pseudo-features
# (+prefer-no-scatter/+prefer-no-gather, never present in runtime CPU
# detection) — a false positive; genuine cross-host reuse is prevented by the
# fingerprinted cache path (qchem_rs_tpu/__init__.py).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

log = logging.getLogger("qchem")


def _common_flags(p: argparse.ArgumentParser, uhf: bool) -> None:
    p.add_argument("--basis-set", "-b", required=True, help="basis set JSON (MolSSI BSE schema)")
    p.add_argument("--molecule", "-m", required=True, help="molecule JSON (positions in Bohr)")
    p.add_argument("--max-iterations", type=int, default=100, help="SCF iteration cap (default 100)")
    p.add_argument("--epsilon", type=float, default=1e-6, help="density-RMS convergence threshold (default 1e-6)")
    p.add_argument("--charge", "-c", type=int, default=0, help="total molecular charge")
    if uhf:
        p.add_argument(
            "--spin-multiplicity",
            "-s",
            type=int,
            default=0,
            help="2S+1; 0 = reference-compatible n/2-n/2 split",
        )
    p.add_argument(
        "--convergence",
        type=_convergence_metric,
        default="diag_rms",
        help="convergence metric: diag_rms (reference quirk), full_rms, "
        "energy (|dE| < epsilon in Hartree), diis_err (max|FDS-SDF| "
        "commutator norm), or composite[:GUARD] (|dE| < epsilon on two "
        "consecutive iterations, gated until the diagonal density RMS "
        "settles below GUARD, default 1e-6 — the noise-aware stop for "
        "emulated-f64 TPU, docs/PROFILE_r04.md)",
    )
    p.add_argument(
        "--guess",
        choices=["huckel", "sad"],
        default="huckel",
        help="initial density: huckel (reference parity, rhf.rs:133-150) or "
        "sad (superposition of atomic densities — typically ~2x fewer "
        "iterations; models/sad.py)",
    )
    p.add_argument("--mixing", type=float, default=1.0, help="density mixing factor (1.0 = no damping)")
    p.add_argument(
        "--spherical",
        action="store_true",
        help="use real solid-harmonic (5d/7f) basis functions instead of Cartesian",
    )
    p.add_argument(
        "--screening-threshold",
        type=float,
        default=1e-12,
        help="Schwarz screening threshold for shell quartets (0 disables)",
    )
    p.add_argument(
        "--fock-mode",
        choices=["incore", "pair", "direct"],
        default="incore",
        help="incore materializes the ERI tensor once; pair keeps only the "
        "pair-space matrices (~3/4 of one n^4 tensor, J/K as matvecs — the "
        "scale path); direct rebuilds screened J/K each iteration",
    )
    p.add_argument(
        "--level-shift",
        type=float,
        default=0.0,
        help="virtual-orbital level shift in Hartree (0 disables); "
        "stabilizes oscillatory SCF cases",
    )
    p.add_argument(
        "--trace-dir",
        default=None,
        help="write a jax.profiler trace of the run to this directory "
        "(view with TensorBoard / xprof)",
    )
    p.add_argument(
        "--checkpoint",
        default=None,
        help="write the converged SCF state to this .npz path",
    )
    p.add_argument(
        "--dipole",
        action="store_true",
        help="print the electric dipole moment from the converged density",
    )
    p.add_argument(
        "--mulliken",
        action="store_true",
        help="print Mulliken atomic partial charges",
    )
    p.add_argument(
        "--field",
        type=float,
        nargs=3,
        default=None,
        metavar=("FX", "FY", "FZ"),
        help="uniform external electric field in atomic units "
        "(finite-field properties)",
    )
    p.add_argument(
        "--resume",
        default=None,
        help="warm-start from an .npz checkpoint written by --checkpoint",
    )


def _convergence_metric(value: str) -> str:
    """argparse type for --convergence: fixed names plus composite[:GUARD]."""
    if value in ("diag_rms", "full_rms", "energy", "diis_err",
                 "diag_rms2", "full_rms2", "diis_err2"):
        return value
    if value == "composite" or value.startswith("composite:"):
        if ":" in value:
            try:
                float(value.split(":", 1)[1])
            except ValueError:
                raise argparse.ArgumentTypeError(
                    f"bad composite guard in {value!r} (want composite:<float>)"
                ) from None
        return value
    if value.startswith("espan"):
        from qchem_rs_tpu.models.scf import espan_params

        try:
            espan_params(value)
        except (ValueError, IndexError) as e:
            raise argparse.ArgumentTypeError(
                f"bad espan metric {value!r} (want espan:<window>[:<guard>]): {e}"
            ) from None
        return value
    raise argparse.ArgumentTypeError(
        f"unknown convergence metric {value!r} (diag_rms, full_rms, energy, "
        "diis_err, composite[:GUARD], espan:<W>[:<GUARD>]; a trailing 2 — "
        "diag_rms2/full_rms2/diis_err2 — requires two consecutive passes "
        "below epsilon)"
    )


class CliError(Exception):
    """User-facing CLI error (bad paths/data): printed as one line, no
    traceback (the reference panics; we exit 2 cleanly)."""


def _build(args):
    from qchem_rs_tpu import BasisSet, HartreeFockConfig, MolecularSystem

    try:
        basis = BasisSet.load(args.basis_set)
    except (OSError, ValueError, KeyError) as e:
        raise CliError(f"cannot load basis set {args.basis_set!r}: {e}") from e
    try:
        system = MolecularSystem.load(
            args.molecule, basis, spherical=getattr(args, "spherical", False)
        )
    except (OSError, ValueError, KeyError) as e:
        raise CliError(f"cannot load molecule {args.molecule!r}: {e}") from e
    cfg = HartreeFockConfig(
        max_iterations=args.max_iterations,
        epsilon=args.epsilon,
        charge=args.charge,
        spin_multiplicity=getattr(args, "spin_multiplicity", 0) or 0,
        convergence_metric=args.convergence,
        mixing_factor=args.mixing,
        verbose=args.verbose,
        screening_threshold=getattr(args, "screening_threshold", 1e-12),
        fock_mode=getattr(args, "fock_mode", "incore"),
        level_shift=getattr(args, "level_shift", 0.0),
        electric_field=tuple(getattr(args, "field", None) or (0.0, 0.0, 0.0)),
        initial_guess=getattr(args, "guess", "huckel"),
    )
    return system, cfg


def _resume_guess(args, kind: str):
    """Load a --resume checkpoint's density as the warm-start guess."""
    if not getattr(args, "resume", None):
        return None
    from qchem_rs_tpu.utils.checkpoint import ScfCheckpoint

    try:
        ck = ScfCheckpoint.load(args.resume)
    except OSError as e:
        raise CliError(f"cannot load checkpoint {args.resume!r}: {e}") from e
    if ck.kind != kind:
        raise CliError(
            f"checkpoint {args.resume!r} is kind={ck.kind!r}, expected {kind!r}"
        )
    return ck.density


def _fmt_orbitals(w) -> str:
    return "[" + ", ".join(f"{x:.3f}" for x in w) + "]"


def cmd_rhf(args) -> int:
    from qchem_rs_tpu import restricted_hartree_fock
    from qchem_rs_tpu.utils.profiling import trace

    system, cfg = _build(args)
    if cfg.spin_multiplicity == 0:
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
    guess = _resume_guess(args, "rhf")
    start = time.perf_counter()
    with trace(args.trace_dir):
        out = restricted_hartree_fock(system, cfg, density_guess=guess)
    elapsed = time.perf_counter() - start
    if args.checkpoint:
        from qchem_rs_tpu.utils.checkpoint import from_rhf_output

        from_rhf_output(out, system).save(args.checkpoint)
    if not out.converged:
        print("hartree fock did not converge", file=sys.stderr)
        return 1
    print(f"hartree fock converged after {out.iterations} iterations and {elapsed:0.2f}s")
    print(f"electronic energy: {out.electronic_energy:3.3f}")
    print(f"nuclear repulsion energy: {out.nuclear_repulsion:3.3f}")
    print(f"hartree fock energy: {out.total_energy():3.3f}")
    print(f"orbital energies: {_fmt_orbitals(out.orbital_energies)}")
    if getattr(args, "gradient", False):
        from qchem_rs_tpu.models.gradients import rhf_gradient

        g = rhf_gradient(system, cfg, output=out)
        print("nuclear gradient (Hartree/Bohr):")
        for atom, row in zip(system.atoms, g):
            print(f"  {atom.ordinal:3d}  {row[0]: .8f} {row[1]: .8f} {row[2]: .8f}")
    if getattr(args, "polarizability", False):
        import numpy as np

        from qchem_rs_tpu.models.response import static_polarizability

        alpha = static_polarizability(system, cfg, output=out)
        iso = float(np.trace(alpha) / 3.0)
        print(f"static polarizability (a.u.), isotropic {iso:.6f}:")
        for row in alpha:
            print(f"  {row[0]: .6f} {row[1]: .6f} {row[2]: .6f}")
    _print_properties(args, system, out.density)
    return 0


def _print_properties(args, system, total_density) -> None:
    if getattr(args, "dipole", False):
        from qchem_rs_tpu.models.properties import AU_TO_DEBYE, dipole_moment

        mu = dipole_moment(system, total_density)
        d = float((mu**2).sum() ** 0.5)
        print(
            f"dipole moment (a.u.): [{mu[0]: .6f}, {mu[1]: .6f}, {mu[2]: .6f}]"
            f"  |mu| = {d:.6f} a.u. = {d * AU_TO_DEBYE:.4f} D"
        )
    if getattr(args, "mulliken", False):
        from qchem_rs_tpu.models.properties import mulliken_charges

        q = mulliken_charges(system, total_density)
        print("mulliken charges:")
        for atom, qi in zip(system.atoms, q):
            print(f"  {atom.ordinal:3d}  {qi: .6f}")


def cmd_uhf(args) -> int:
    from qchem_rs_tpu import unrestricted_hartree_fock
    from qchem_rs_tpu.utils.profiling import trace

    system, cfg = _build(args)
    guess = _resume_guess(args, "uhf")
    start = time.perf_counter()
    with trace(args.trace_dir):
        out = unrestricted_hartree_fock(system, cfg, density_guess=guess)
    elapsed = time.perf_counter() - start
    if args.checkpoint:
        from qchem_rs_tpu.utils.checkpoint import from_uhf_output

        from_uhf_output(out, system).save(args.checkpoint)
    if not out.converged:
        print("hartree fock did not converge", file=sys.stderr)
        return 1
    print(f"hartree fock converged after {out.iterations} iterations and {elapsed:0.2f}s")
    print(f"electronic energy: {out.electronic_energy:3.3f}")
    print(f"nuclear repulsion energy: {out.nuclear_repulsion:3.3f}")
    print(f"hartree fock energy: {out.total_energy():3.3f}")
    print(f"orbital energies alpha spin:   {_fmt_orbitals(out.orbital_energies_alpha)}")
    print(f"orbital energies beta spin: {_fmt_orbitals(out.orbital_energies_beta)}")
    from qchem_rs_tpu.models import scf as scf_mod
    from qchem_rs_tpu.models.properties import spin_expectation

    na, nb = scf_mod.electron_counts(
        system.n_electrons(cfg.charge), cfg.spin_multiplicity
    )
    s2, excess = spin_expectation(system, out.coefficients, na, nb)
    print(
        f"spin expectation <S^2>: {s2:.4f} "
        f"(exact {s2 - excess:.4f}, contamination {excess:+.4f})"
    )
    _print_properties(args, system, out.density[0] + out.density[1])
    return 0


def cmd_mp2(args) -> int:
    from qchem_rs_tpu.models.mp2 import mp2, mp2_pair_space, ump2, ump2_pair_space

    system, cfg = _build(args)
    open_shell = cfg.spin_multiplicity not in (0, 1) or (
        system.n_electrons(cfg.charge) % 2 == 1
    )
    if cfg.spin_multiplicity == 0 and not open_shell:
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
    if open_shell:
        fn = ump2_pair_space if cfg.fock_mode == "pair" else ump2
    elif cfg.fock_mode == "pair":
        # honor --fock-mode pair end to end: the no-n^4 transform
        # (ia|jb) = U^T V2f U shares the SCF's pair-space memory envelope
        fn = mp2_pair_space
    else:
        fn = mp2
    frozen = getattr(args, "frozen_core", "0")
    frozen = frozen if frozen == "auto" else int(frozen)
    start = time.perf_counter()
    try:
        res = fn(system, cfg, frozen=frozen)
    except (RuntimeError, ValueError) as e:
        print(str(e), file=sys.stderr)
        return 1
    elapsed = time.perf_counter() - start
    kind = "ump2" if open_shell else "mp2"
    print(f"{kind} finished after {res.iterations} SCF iterations and {elapsed:0.2f}s")
    print(f"hartree fock energy: {res.scf_total_energy:3.6f}")
    print(f"mp2 correlation energy: {res.correlation_energy:3.6f}")
    print(f"mp2 total energy: {res.total_energy():3.6f}")
    return 0


def cmd_ccsd(args) -> int:
    from qchem_rs_tpu.models.cc import ccsd

    system, cfg = _build(args)
    open_shell = cfg.spin_multiplicity not in (0, 1) or (
        system.n_electrons(cfg.charge) % 2 == 1
    )
    if cfg.spin_multiplicity == 0 and not open_shell:
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
    frozen = getattr(args, "frozen_core", "0")
    frozen = frozen if frozen == "auto" else int(frozen)
    start = time.perf_counter()
    try:
        res = ccsd(
            system,
            cfg,
            frozen=frozen,
            triples=args.triples,
            cc_epsilon=args.cc_epsilon,
        )
    except (RuntimeError, ValueError) as e:
        print(str(e), file=sys.stderr)
        return 1
    elapsed = time.perf_counter() - start
    if not res.converged:
        print("ccsd amplitudes did not converge", file=sys.stderr)
        return 1
    kind = "uccsd" if open_shell else "ccsd"
    print(
        f"{kind} converged after {res.iterations} CC iterations "
        f"({res.scf_iterations} SCF) and {elapsed:0.2f}s"
    )
    print(f"hartree fock energy: {res.scf_total_energy:3.6f}")
    print(f"mp2 correlation energy: {res.mp2_correlation_energy:3.6f}")
    print(f"ccsd correlation energy: {res.correlation_energy:3.6f}")
    if res.triples_correction is not None:
        print(f"(t) correction: {res.triples_correction:3.6f}")
    print(f"{kind} total energy: {res.total_energy():3.6f}")
    if getattr(args, "dipole", False) and not open_shell:
        import numpy as np

        if getattr(args, "relaxed", False):
            from qchem_rs_tpu.models.cc_relaxed import ccsd_relaxed_dipole

            p = ccsd_relaxed_dipole(system, cfg, cc_epsilon=args.cc_epsilon)
            d = float(np.linalg.norm(p.ccsd_dipole))
            du = float(np.linalg.norm(p.ccsd_dipole_unrelaxed))
            print(
                f"ccsd dipole (relaxed, a.u.): [{p.ccsd_dipole[0]: .6f}, "
                f"{p.ccsd_dipole[1]: .6f}, {p.ccsd_dipole[2]: .6f}]  "
                f"|mu| = {d:.6f} (unrelaxed {du:.6f})"
            )
        else:
            from qchem_rs_tpu.models.cc_lambda import ccsd_dipole

            p = ccsd_dipole(system, cfg, cc_epsilon=args.cc_epsilon)
            d = float(np.linalg.norm(p.ccsd_dipole))
            ds = float(np.linalg.norm(p.scf_dipole))
            print(
                f"ccsd dipole (unrelaxed, a.u.): [{p.ccsd_dipole[0]: .6f}, "
                f"{p.ccsd_dipole[1]: .6f}, {p.ccsd_dipole[2]: .6f}]  "
                f"|mu| = {d:.6f} (scf {ds:.6f})"
            )
    return 0


def cmd_fci(args) -> int:
    from qchem_rs_tpu.models.fci import fci

    system, cfg = _build(args)
    if cfg.spin_multiplicity == 0:
        mult = 2 if system.n_electrons(cfg.charge) % 2 else 1
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": mult})
    start = time.perf_counter()
    try:
        res = fci(
            system,
            cfg,
            nroots=args.nroots,
            max_dim=args.max_dim,
            orbitals=args.orbitals,
        )
    except (RuntimeError, ValueError) as e:
        print(str(e), file=sys.stderr)
        return 1
    elapsed = time.perf_counter() - start
    print(
        f"fci solved: {res.dimension} determinants "
        f"({res.n_alpha}a, {res.n_beta}b) in {elapsed:0.2f}s"
    )
    if res.scf_total_energy is not None:
        print(f"hartree fock energy: {res.scf_total_energy:3.6f}")
        print(f"fci correlation energy: {res.correlation_energy():3.6f}")
    for k, e in enumerate(res.total_energies):
        print(f"fci root {k} total energy: {e:3.6f}")
    return 0


def cmd_eom(args) -> int:
    from qchem_rs_tpu.models.eom import (
        HARTREE_TO_EV,
        ea_eom_ccsd,
        eom_ccsd,
        ip_eom_ccsd,
    )

    system, cfg = _build(args)
    if cfg.spin_multiplicity == 0:
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
    start = time.perf_counter()
    try:
        if args.ip or args.ea:
            fn = ip_eom_ccsd if args.ip else ea_eom_ccsd
            res = fn(system, cfg, nstates=args.nstates, max_dim=args.max_dim)
            elapsed = time.perf_counter() - start
            label = "ionization potentials" if args.ip else "electron affinities"
            print(
                f"{res.kind}-eom-ccsd finished in {elapsed:0.2f}s "
                f"({res.dimension} determinants)"
            )
            print(f"ccsd total energy: {res.ccsd_total_energy:3.6f}")
            print(
                f"koopmans estimate: {res.koopmans:0.6f} Eh  "
                f"{res.koopmans * HARTREE_TO_EV:8.4f} eV"
            )
            print(f"{label}:")
            for i, w in enumerate(res.energies, start=1):
                print(f"state {i}: {w:0.6f} Eh  {w * HARTREE_TO_EV:8.4f} eV")
            return 0
        if args.oscillator_strengths:
            if args.matrix_free:
                # production tier: Davidson + AD transition moments (no
                # determinant space; scales with ground-state CCSD)
                from qchem_rs_tpu.models.eom import eom_ccsd_transition_moments

                res = eom_ccsd_transition_moments(
                    system, cfg, nstates=args.nstates
                )
                what = f"amplitude space {res.dimension}"
            else:
                from qchem_rs_tpu.models.eom import eom_ccsd_properties

                res = eom_ccsd_properties(
                    system, cfg, nstates=args.nstates, max_dim=args.max_dim
                )
                what = f"{res.dimension} determinants"
            elapsed = time.perf_counter() - start
            print(
                f"eom-ccsd properties finished in {elapsed:0.2f}s ({what})"
            )
            print(f"hartree fock energy: {res.scf_total_energy:3.6f}")
            print(f"ccsd total energy: {res.ccsd_total_energy:3.6f}")
            gs = res.ground_state_dipole
            print(
                "ccsd dipole moment (a.u.): "
                f"[{gs[0]:0.6f}, {gs[1]:0.6f}, {gs[2]:0.6f}]"
            )
            for i, (w, f) in enumerate(
                zip(res.excitation_energies, res.oscillator_strengths),
                start=1,
            ):
                print(
                    f"state {i}: {w:0.6f} Eh  {w * HARTREE_TO_EV:8.4f} eV  "
                    f"f = {f:0.6f}"
                )
            return 0
        if args.matrix_free:
            from qchem_rs_tpu.models.eom import eom_ccsd_davidson

            res = eom_ccsd_davidson(
                system, cfg,
                nstates=args.nstates,
                formulation=args.formulation,
            )
        else:
            res = eom_ccsd(
                system, cfg, nstates=args.nstates, max_dim=args.max_dim
            )
    except (RuntimeError, ValueError) as e:
        print(str(e), file=sys.stderr)
        return 1
    elapsed = time.perf_counter() - start
    if args.matrix_free:
        print(
            f"eom-ccsd (matrix-free {args.formulation}) finished after "
            f"{res.cc_iterations} CC iterations and {elapsed:0.2f}s "
            f"(amplitude space {res.dimension})"
        )
    else:
        print(
            f"eom-ccsd finished after {res.cc_iterations} CC iterations and "
            f"{elapsed:0.2f}s ({res.dimension} of {res.fci_dimension} "
            f"determinants in the rank<=2 space)"
        )
    print(f"hartree fock energy: {res.scf_total_energy:3.6f}")
    print(f"ccsd total energy: {res.ccsd_total_energy:3.6f}")
    for i, w in enumerate(res.excitation_energies, start=1):
        print(f"state {i}: {w:0.6f} Eh  {w * HARTREE_TO_EV:8.4f} eV")
    return 0


def cmd_cis(args) -> int:
    from qchem_rs_tpu.models.cis import HARTREE_TO_EV, cis, ucis

    system, cfg = _build(args)
    open_shell = cfg.spin_multiplicity not in (0, 1) or (
        system.n_electrons(cfg.charge) % 2 == 1
    )
    start = time.perf_counter()
    try:
        if open_shell:
            if args.triplet or args.tdhf:
                print(
                    "--triplet/--tdhf apply to closed-shell references only "
                    "(open shells run spin-orbital UCIS)",
                    file=sys.stderr,
                )
                return 2
            res = ucis(system, cfg, nstates=args.nstates)
        else:
            if cfg.spin_multiplicity == 0:
                cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
            res = cis(
                system, cfg,
                nstates=args.nstates,
                triplet=args.triplet,
                tdhf=args.tdhf,
                solver=args.solver,
            )
    except (RuntimeError, ValueError) as e:
        print(str(e), file=sys.stderr)
        return 1
    elapsed = time.perf_counter() - start
    kind = res.method
    if kind == "ucis":
        label = "ucis (spin-orbital)"
    else:
        label = f"{kind} ({'triplet' if res.triplet else 'singlet'})"
    print(
        f"{label} finished after {res.iterations} SCF iterations "
        f"and {elapsed:0.2f}s"
    )
    print(f"hartree fock energy: {res.scf_total_energy:3.6f}")
    for i, (w, f) in enumerate(
        zip(res.excitation_energies, res.oscillator_strengths), start=1
    ):
        print(
            f"state {i}: {w:0.6f} Eh  {w * HARTREE_TO_EV:8.4f} eV  "
            f"f = {f:0.6f}"
        )
    return 0


def cmd_optimize(args) -> int:
    from qchem_rs_tpu.models.optimize import optimize_geometry

    system, cfg = _build(args)
    open_shell = cfg.spin_multiplicity not in (0, 1) or (
        system.n_electrons(cfg.charge) % 2 == 1
    )
    if cfg.spin_multiplicity == 0 and not open_shell:
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
    start = time.perf_counter()
    res = optimize_geometry(system, cfg, gtol=args.gtol, max_steps=args.max_steps)
    elapsed = time.perf_counter() - start
    status = "converged" if res.converged else "did NOT converge"
    print(
        f"geometry optimization {status} after {res.steps} energy/gradient "
        f"evaluations and {elapsed:0.2f}s"
    )
    print(f"final energy: {res.energy:3.8f}")
    print(f"max |gradient|: {res.gradient_norm:.2e} Hartree/Bohr")
    print("final geometry (Bohr):")
    for atom, row in zip(system.atoms, res.positions):
        print(f"  {atom.ordinal:3d}  {row[0]: .6f} {row[1]: .6f} {row[2]: .6f}")
    return 0 if res.converged else 1


def cmd_frequencies(args) -> int:
    from qchem_rs_tpu.models.hessian import harmonic_frequencies
    from qchem_rs_tpu.models.optimize import optimize_geometry

    system, cfg = _build(args)
    open_shell = cfg.spin_multiplicity not in (0, 1) or (
        system.n_electrons(cfg.charge) % 2 == 1
    )
    if cfg.spin_multiplicity == 0 and not open_shell:
        cfg = type(cfg)(**{**cfg.__dict__, "spin_multiplicity": 1})
    start = time.perf_counter()
    if args.opt_first:
        opt = optimize_geometry(system, cfg)
        if not opt.converged:
            print("geometry optimization did not converge", file=sys.stderr)
            return 1
        system = system.with_positions(opt.positions)
    res = harmonic_frequencies(system, cfg)
    elapsed = time.perf_counter() - start
    print(f"harmonic analysis finished in {elapsed:0.2f}s")
    print(f"near-zero (trans/rot) modes: {res.n_zero_modes}")
    vib = [f for f in res.frequencies_cm1 if abs(f) >= 50.0]
    print("harmonic frequencies (cm^-1):", " ".join(f"{f:8.1f}" for f in vib))
    if getattr(args, "thermo", False):
        from qchem_rs_tpu.models.thermo import thermochemistry

        th = thermochemistry(
            system,
            res.frequencies_cm1,
            temperature=args.temperature,
            pressure=args.pressure,
            symmetry_number=args.symmetry_number,
            spin_multiplicity=max(cfg.spin_multiplicity, 1),
        )
        shape = "linear" if th.linear else ("atom" if not len(th.rotational_temperatures) else "nonlinear")
        print(
            f"thermochemistry (RRHO, {th.temperature:.2f} K, "
            f"{th.pressure:.0f} Pa, sigma={args.symmetry_number}, {shape}):"
        )
        print(f"  zero-point energy: {th.zpe:.6f} Eh")
        print(f"  thermal energy (U - E_elec): {th.thermal_energy:.6f} Eh")
        print(f"  thermal enthalpy (H - E_elec): {th.thermal_enthalpy:.6f} Eh")
        print(f"  thermal gibbs (G - E_elec): {th.thermal_gibbs:.6f} Eh")
        p = th.entropy_parts
        print(
            f"  entropy: {th.entropy:.3f} J/(mol K)  [trans {p['trans']:.3f}"
            f", rot {p['rot']:.3f}, vib {p['vib']:.3f}, elec {p['elec']:.3f}]"
        )
    return 0


def cmd_info(args) -> int:
    from qchem_rs_tpu import BasisSet, MolecularSystem

    basis = BasisSet.load(args.basis_set)
    system = MolecularSystem.load(args.molecule, basis)
    print(system)
    print(f"electrons: {system.n_electrons()}")
    print(f"nuclear repulsion: {system.nuclear_repulsion():.10f}")
    for l, cls in system.shell_classes.items():
        print(f"  l={l}: {cls.nshells} shells, contraction padded to K={cls.K}")
    return 0


def cmd_sweep(args) -> int:
    """Batched conformer sweep: RHF over a batch of geometries (an axis the
    reference cannot do at all — SURVEY.md §2.2). ``--chain`` runs the
    conformers sequentially instead, warm-starting each from the previous
    converged density — the right mode for correlated scans (reaction paths,
    bond stretches) where the density changes smoothly."""
    import json

    import numpy as np

    from qchem_rs_tpu.utils.profiling import trace

    system, cfg = _build(args)
    try:
        with open(args.geometries) as f:
            geoms = np.asarray(json.load(f), dtype=np.float64)  # (nconf, natom, 3)
    except (OSError, ValueError) as e:
        raise CliError(f"cannot load geometries {args.geometries!r}: {e}") from e
    start = time.perf_counter()
    with trace(args.trace_dir):
        if args.chain:
            from qchem_rs_tpu.parallel.sweep import chained_sweep

            energies, converged = chained_sweep(system, geoms, cfg)
        else:
            from qchem_rs_tpu.parallel.sweep import conformer_sweep

            energies, converged = conformer_sweep(system, geoms, cfg)
    elapsed = time.perf_counter() - start
    print(f"swept {len(geoms)} conformers in {elapsed:0.2f}s")
    for i, (e, c) in enumerate(zip(energies, converged)):
        flag = "" if c else "  (NOT CONVERGED)"
        print(f"conformer {i}: {e:.8f}{flag}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="qchem",
        description="TPU-native Hartree-Fock (JAX/XLA/Pallas) with qchem-rs CLI parity",
    )
    parser.add_argument("--verbose", "-v", action="store_true", help="per-iteration SCF logging")
    sub = parser.add_subparsers(dest="command", required=True)

    p_rhf = sub.add_parser("rhf", help="restricted Hartree-Fock single point")
    p_rhf.add_argument(
        "--gradient",
        action="store_true",
        help="also print analytic nuclear gradients (jax.grad through the "
        "differentiable integrals — beyond the reference's capabilities)",
    )
    p_rhf.add_argument(
        "--polarizability",
        action="store_true",
        help="also print the CPHF static dipole polarizability tensor "
        "(one (A+B) linear solve; FD-validated against --field runs)",
    )
    _common_flags(p_rhf, uhf=False)
    p_rhf.set_defaults(fn=cmd_rhf)

    p_uhf = sub.add_parser("uhf", help="unrestricted Hartree-Fock single point")
    _common_flags(p_uhf, uhf=True)
    p_uhf.set_defaults(fn=cmd_uhf)

    p_mp2 = sub.add_parser(
        "mp2",
        help="MP2 correlation energy (restricted; spin-unrestricted UMP2 "
        "for open shells)",
    )
    _common_flags(p_mp2, uhf=True)
    p_mp2.add_argument(
        "--frozen-core",
        default="0",
        metavar="N|auto",
        help="core spatial orbitals excluded from correlation: an integer "
        "or 'auto' (1s for Li-Ne, 1s2s2p for Na-Ar)",
    )
    p_mp2.set_defaults(fn=cmd_mp2)

    p_cc = sub.add_parser(
        "ccsd",
        help="CCSD / CCSD(T) correlation energy (spinorbital formulation; "
        "closed shells on RHF, open shells on UHF references)",
    )
    _common_flags(p_cc, uhf=True)
    p_cc.add_argument(
        "--frozen-core",
        default="0",
        metavar="N|auto",
        help="core spatial orbitals excluded from correlation: an integer "
        "or 'auto' (1s for Li-Ne, 1s2s2p for Na-Ar)",
    )
    p_cc.add_argument(
        "--triples", action="store_true", help="add the perturbative (T) correction"
    )
    p_cc.add_argument(
        "--cc-epsilon",
        type=float,
        default=1e-8,
        help="amplitude RMS / |dE| convergence threshold",
    )
    # (--dipole is inherited from _common_flags; on ccsd it reports the
    # unrelaxed CC dipole via the AD Lagrangian instead of the SCF one)
    p_cc.add_argument(
        "--relaxed", action="store_true",
        help="with --dipole: orbital-relaxed dipole via the z-vector method "
        "(models/cc_relaxed.py; anchored to finite-field SCF+CCSD)",
    )
    p_cc.set_defaults(fn=cmd_ccsd)

    p_fci = sub.add_parser(
        "fci",
        help="determinant full CI for small systems (exact within the "
        "basis; the correlation-tier anchor)",
    )
    _common_flags(p_fci, uhf=True)
    p_fci.add_argument(
        "--nroots", type=int, default=1, help="number of FCI roots to report"
    )
    p_fci.add_argument(
        "--max-dim",
        type=int,
        default=4000,
        help="determinant-space cap for the dense eigensolve tier",
    )
    p_fci.add_argument(
        "--orbitals",
        choices=("auto", "rhf", "lowdin"),
        default="auto",
        help="orbital basis: converged RHF or Loewdin-orthogonalized AOs "
        "(FCI is invariant; lowdin needs no SCF and works for open shells)",
    )
    p_fci.set_defaults(fn=cmd_fci)

    p_eom = sub.add_parser(
        "eom",
        help="EOM-CCSD excitation energies (small-system determinant-space "
        "tier, closed shells)",
    )
    _common_flags(p_eom, uhf=False)
    p_eom.add_argument(
        "--nstates", type=int, default=5, help="number of excited states"
    )
    p_eom.add_argument(
        "--max-dim",
        type=int,
        default=4000,
        help="determinant-space cap (same tier as fci)",
    )
    p_eom.add_argument(
        "--ip", action="store_true",
        help="ionization potentials (IP-EOM: 1h + 2h1p sector)",
    )
    p_eom.add_argument(
        "--ea", action="store_true",
        help="electron affinities (EA-EOM: 1p + 2p1h sector)",
    )
    p_eom.add_argument(
        "--oscillator-strengths", action="store_true",
        help="biorthogonal transition dipoles and length-gauge oscillator "
        "strengths plus the CCSD ground-state dipole (determinant tier)",
    )
    p_eom.add_argument(
        "--matrix-free", action="store_true",
        help="production tier: Davidson over jvp sigma vectors (no "
        "determinant space; scales with ground-state CCSD)",
    )
    p_eom.add_argument(
        "--formulation",
        choices=("spinorbital", "spatial"),
        default="spinorbital",
        help="matrix-free sigma path: spinorbital (all Ms=0 roots) or the "
        "spatial fast path (singlet roots only)",
    )
    p_eom.set_defaults(fn=cmd_eom)

    p_cis = sub.add_parser(
        "cis",
        help="CIS / TDHF excitation energies (closed shells; open shells "
        "run spin-orbital UCIS on the UHF reference; --fock-mode pair "
        "avoids the n^4 AO tensor)",
    )
    _common_flags(p_cis, uhf=True)
    p_cis.add_argument(
        "--nstates", type=int, default=5, help="number of excited states"
    )
    p_cis.add_argument(
        "--triplet", action="store_true", help="triplet excitations"
    )
    p_cis.add_argument(
        "--tdhf", action="store_true",
        help="full TDHF/RPA instead of the CIS (Tamm-Dancoff) problem",
    )
    p_cis.add_argument(
        "--solver",
        choices=("auto", "dense", "davidson"),
        default="auto",
        help="CIS eigensolver: dense diagonalization or implicit-sigma "
        "Davidson (auto switches to davidson past no*nv = 4096)",
    )
    p_cis.set_defaults(fn=cmd_cis)

    p_opt = sub.add_parser(
        "optimize", help="geometry optimization on analytic RHF gradients"
    )
    _common_flags(p_opt, uhf=True)
    p_opt.add_argument(
        "--gtol", type=float, default=3e-5,
        help="max-abs gradient convergence threshold (Hartree/Bohr)",
    )
    p_opt.add_argument(
        "--max-steps", type=int, default=50,
        help="maximum optimizer energy/gradient evaluations",
    )
    p_opt.set_defaults(fn=cmd_optimize)

    p_freq = sub.add_parser(
        "frequencies", help="harmonic vibrational frequencies (RHF)"
    )
    _common_flags(p_freq, uhf=True)
    p_freq.add_argument(
        "--opt-first",
        action="store_true",
        help="optimize the geometry before the harmonic analysis",
    )
    p_freq.add_argument(
        "--thermo",
        action="store_true",
        help="ideal-gas RRHO thermochemistry (ZPE, U, H, G, S)",
    )
    p_freq.add_argument(
        "--temperature", type=float, default=298.15, help="temperature (K)"
    )
    p_freq.add_argument(
        "--pressure", type=float, default=101325.0, help="pressure (Pa)"
    )
    p_freq.add_argument(
        "--symmetry-number",
        type=int,
        default=1,
        help="rotational symmetry number sigma",
    )
    p_freq.set_defaults(fn=cmd_frequencies)

    p_info = sub.add_parser("info", help="inspect a molecule/basis combination")
    p_info.add_argument("--basis-set", "-b", required=True)
    p_info.add_argument("--molecule", "-m", required=True)
    p_info.set_defaults(fn=cmd_info)

    p_sweep = sub.add_parser("sweep", help="batched conformer sweep (RHF)")
    _common_flags(p_sweep, uhf=False)
    p_sweep.add_argument("--geometries", "-g", required=True, help="JSON (nconf, natom, 3) positions in Bohr")
    p_sweep.add_argument(
        "--chain",
        action="store_true",
        help="sequential sweep, each conformer warm-started from the "
        "previous density (for correlated scans)",
    )
    p_sweep.set_defaults(fn=cmd_sweep)

    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(levelname)s %(name)s: %(message)s",
    )
    try:
        return args.fn(args)
    except CliError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
