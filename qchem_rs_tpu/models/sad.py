"""Superposition of Atomic Densities (SAD) initial guess.

The reference's only guess is extended Hückel (rhf.rs:133-150), which on the
emulated-f64 TPU backend costs ~50 diag_rms iterations on benzene/cc-pVDZ
(docs/PROFILE_r04.md). SAD starts the SCF from a block-diagonal assembly of
spherically-averaged atomic Hartree-Fock densities — a far better starting
point for organic molecules — and enters the compiled SCF program through the
existing ``density_guess`` operand, so selecting it triggers NO new TPU
compiles.

Each unique element's atomic problem is a fractional-occupation restricted
SCF: electrons fill orbitals in energy order, degenerate groups (p/d shells
of the spherically symmetric atom) share electrons equally, which keeps the
atomic density spherically averaged and the iteration smooth. The atomic
integrals come from the production JAX engine ON THE CPU backend — three
execution strategies, tried in order:

1. on-disk cache (~/.cache/qchem_rs_tpu/sad): densities are tiny and
   geometry-free; one compute per (basis-element content, Z, spherical) ever;
2. in-process ``jax.default_device(cpu)`` (tests, CLI, CPU hosts);
3. a single batched CHILD PROCESS with JAX_PLATFORMS=cpu for environments
   whose jax registers NO cpu backend at all (the axon/TPU tunnel pins
   JAX_PLATFORMS=axon — ``jax.devices("cpu")`` raises there, the round-5
   session's first headline attempt failed exactly this way), where solving
   on the TPU instead would pay ~45 s/program remote compiles for throwaway
   atomic programs.

Energy accuracy of the atomic solver is irrelevant — only the density is
consumed, and DIIS absorbs its imperfections within the first few molecular
iterations.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import subprocess
import sys
import tempfile
from weakref import WeakKeyDictionary

import numpy as np

# (Z, spherical) -> atomic density, per BasisSet object (weak: entries die
# with the basis). First-level cache; misses go to disk, then to a solver.
_ATOM_CACHE: "WeakKeyDictionary[object, dict]" = WeakKeyDictionary()

def _disk_dir() -> str:
    return os.environ.get(
        "QCHEM_SAD_CACHE", os.path.expanduser("~/.cache/qchem_rs_tpu/sad")
    )


def _fractional_occupations(w: np.ndarray, n_electrons: int,
                            degeneracy_tol: float = 1e-6) -> np.ndarray:
    """Aufbau filling with equal sharing inside degenerate groups.

    Returns per-orbital occupations in [0, 2] summing to ``n_electrons``.
    Degeneracy is detected on the orbital-energy ladder (consecutive gaps
    below ``degeneracy_tol``), which for an isolated atom groups the p/d/f
    manifolds and so spherically averages the density.
    """
    n = len(w)
    occ = np.zeros(n)
    remaining = float(n_electrons)
    i = 0
    while i < n and remaining > 0:
        j = i + 1
        while j < n and abs(w[j] - w[j - 1]) < degeneracy_tol:
            j += 1
        g = j - i  # group size; capacity 2g electrons
        take = min(remaining, 2.0 * g)
        occ[i:j] = take / g
        remaining -= take
        i = j
    return occ


def _scf_from_integrals(S, H, V, Z: int) -> np.ndarray:
    """Host numpy fractional-occupation SCF given dense atomic integrals."""
    sw, U = np.linalg.eigh(S)
    X = (U / np.sqrt(sw)[None, :]) @ U.T
    n = S.shape[0]
    D = np.zeros((n, n))
    mix = 0.5  # fixed damping: fractional occupations can ring without it
    for _ in range(60):
        J = np.einsum("ijkl,kl->ij", V, D)
        K = np.einsum("ikjl,kl->ij", V, D)
        F = H + J - 0.5 * K
        w, Cp = np.linalg.eigh(X.T @ F @ X)
        C = X @ Cp
        occ = _fractional_occupations(w, Z)
        D_new = (C * occ[None, :]) @ C.T
        delta = np.max(np.abs(D_new - D))
        D = D + mix * (D_new - D)
        if delta < 1e-7:
            break
    return D


def compute_atomic_density(basis, Z: int, spherical: bool) -> np.ndarray:
    """Solve the neutral atom ``Z`` on the jax CPU backend (must be callable
    — see _atomic_densities for the strategy cascade). The XLA f64 tile
    kernel is forced while the engine exists: kernel selection keys off
    jax.default_backend() (possibly 'tpu' here) but these programs compile
    for the CPU device, where the Mosaic kernel cannot run."""
    import jax
    import jax.numpy as jnp

    from qchem_rs_tpu.utils.system import Atom, MolecularSystem

    system = MolecularSystem([Atom(Z, np.zeros(3))], basis, spherical=False)
    cpu = jax.devices("cpu")[0]
    prev_kernel = os.environ.get("QCHEM_KERNEL")
    os.environ["QCHEM_KERNEL"] = "f64"
    try:
        with jax.default_device(cpu):
            from qchem_rs_tpu.ops import one_electron
            from qchem_rs_tpu.ops.eri import eri as dense_eri

            pos = jnp.asarray(system.positions)
            S = np.asarray(one_electron.overlap(system, pos))
            H = np.asarray(
                one_electron.kinetic(system, pos) + one_electron.nuclear(system, pos)
            )
            V = np.asarray(dense_eri(system))
    finally:
        if prev_kernel is None:
            os.environ.pop("QCHEM_KERNEL", None)
        else:
            os.environ["QCHEM_KERNEL"] = prev_kernel

    if spherical:
        from qchem_rs_tpu.ops.spherical import system_transform

        T = np.asarray(
            system_transform(
                MolecularSystem([Atom(Z, np.zeros(3))], basis, spherical=True)
            )
        )
        S = T.T @ S @ T
        H = T.T @ H @ T
        V = np.einsum("pqrs,pi,qj,rk,sl->ijkl", V, T, T, T, T, optimize=True)
    return _scf_from_integrals(S, H, V, Z)


def _element_fingerprint(basis, Z: int, spherical: bool) -> str:
    """Content hash of element Z's shells (l, exponents, coefficients):
    densities are shareable across basis objects/files with identical
    element data."""
    h = hashlib.sha256()
    h.update(f"sad-v1|{Z}|{int(spherical)}".encode())
    for spec in basis.shells_for(Z):
        h.update(str(spec.l).encode())
        h.update(np.asarray(spec.exponents, np.float64).tobytes())
        h.update(np.asarray(spec.coefficients, np.float64).tobytes())
    return h.hexdigest()[:24]


def _cpu_backend_available() -> bool:
    try:
        import jax

        jax.devices("cpu")
        return True
    except Exception:
        return False


def _solve_in_subprocess(basis, zs: list[int], spherical: bool) -> dict:
    """One batched child with JAX_PLATFORMS=cpu: unpickles the basis, solves
    every requested element, returns densities via an npz file."""
    with tempfile.TemporaryDirectory(prefix="qchem_sad_") as td:
        bpath = os.path.join(td, "basis.pkl")
        opath = os.path.join(td, "out.npz")
        with open(bpath, "wb") as fh:
            pickle.dump(basis, fh)
        code = (
            "import pickle, sys, numpy as np\n"
            f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})\n"
            f"basis = pickle.load(open({bpath!r}, 'rb'))\n"
            "from qchem_rs_tpu.models.sad import compute_atomic_density\n"
            f"out = {{str(z): compute_atomic_density(basis, z, {spherical!r})"
            f" for z in {zs!r}}}\n"
            f"np.savez({opath!r}, **out)\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # no virtual-device topology inheritance
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=1200,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"SAD subprocess failed rc={proc.returncode}: "
                f"{(proc.stderr or '')[-800:]}"
            )
        with np.load(opath) as data:
            return {int(k): np.asarray(v) for k, v in data.items()}


def _atomic_densities(basis, zs: list[int], spherical: bool) -> dict:
    """Densities for the requested elements: disk cache -> in-process jax
    CPU -> batched subprocess (axon-locked processes)."""
    out: dict[int, np.ndarray] = {}
    missing: list[int] = []
    cache_dir = _disk_dir()
    fps = {Z: _element_fingerprint(basis, Z, spherical) for Z in zs}
    for Z in zs:
        path = os.path.join(cache_dir, fps[Z] + ".npy")
        try:
            out[Z] = np.load(path)
        except (OSError, ValueError):
            missing.append(Z)
    if missing:
        if _cpu_backend_available():
            solved = {
                Z: compute_atomic_density(basis, Z, spherical) for Z in missing
            }
        else:
            solved = _solve_in_subprocess(basis, missing, spherical)
        os.makedirs(cache_dir, exist_ok=True)
        for Z, D in solved.items():
            # np.save appends .npy when absent — name the temp accordingly
            tmp = os.path.join(cache_dir, f".{fps[Z]}.{os.getpid()}.tmp.npy")
            np.save(tmp, D)
            os.replace(tmp, os.path.join(cache_dir, fps[Z] + ".npy"))
        out.update(solved)
    return out


def _atom_spans(system) -> list[tuple[int, int, int]]:
    """Per-atom (ordinal, ao_offset, nao) spans in the system's AO basis
    (spherical counts when the system is spherical). Shells are constructed
    atom-contiguously (utils/system.py), so each atom owns one AO block."""
    per_atom_naos: list[int] = [0] * len(system.atoms)
    for s in system.shells:
        width = 2 * s.l + 1 if system.spherical else (s.l + 1) * (s.l + 2) // 2
        per_atom_naos[s.atom_index] += width
    spans = []
    off = 0
    for atom, nao in zip(system.atoms, per_atom_naos):
        spans.append((atom.ordinal, off, nao))
        off += nao
    return spans


def sad_guess(system, charge: int = 0) -> np.ndarray:
    """Block-diagonal SAD density for ``system``, scaled so Tr[D S] matches
    the target electron count (neutral-atom sum minus ``charge``)."""
    per_basis = _ATOM_CACHE.setdefault(system.basis, {})
    spans = _atom_spans(system)
    need = sorted(
        {Z for Z, _, _ in spans if (Z, system.spherical) not in per_basis}
    )
    if need:
        solved = _atomic_densities(system.basis, need, system.spherical)
        for Z, D in solved.items():
            per_basis[(Z, system.spherical)] = D

    n = system.n_basis()
    D = np.zeros((n, n))
    for Z, off, nao in spans:
        Da = per_basis[(Z, system.spherical)]
        if Da.shape[0] != nao:  # defensive: span bookkeeping must agree
            raise RuntimeError(
                f"SAD atom block mismatch for Z={Z}: {Da.shape[0]} vs {nao}"
            )
        D[off : off + nao, off : off + nao] = Da

    n_target = system.n_electrons(charge)
    if charge != 0 and n_target > 0:
        # molecular overlap for Tr[D S] (charged systems only): prefer the
        # CPU backend; on an axon-locked process fall through to the default
        # device — one small eager op, acceptable for this corner case
        if _cpu_backend_available():
            import jax
            import jax.numpy as jnp

            with jax.default_device(jax.devices("cpu")[0]):
                from qchem_rs_tpu.ops import one_electron

                S = np.asarray(
                    one_electron.overlap(system, jnp.asarray(system.positions))
                )
        else:
            from qchem_rs_tpu.ops import one_electron

            S = np.asarray(one_electron.overlap(system))
        n_sad = float(np.sum(D * S))
        if n_sad > 0:
            D *= n_target / n_sad
    return D
