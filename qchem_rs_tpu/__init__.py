"""qchem_rs_tpu — a TPU-native Hartree-Fock framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the Rust
reference ``qchem-rs`` (see /root/reference): MolSSI-BSE basis parsing,
McMurchie-Davidson one- and two-electron integrals, RHF/UHF SCF with DIIS,
plus TPU-first extensions (Schwarz screening, sharded integral-direct Fock
builds, batched conformer sweeps).

Hartree-Fock requires ~1e-10 accurate integrals, so the whole framework runs
in float64 (enabled here, before any jax.numpy use).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS explicitly: some managed TPU environments pre-register
# backends in a way that makes the plain env var unreliable (a process asking
# for "cpu" silently initializes the remote TPU backend instead and every
# transfer crosses the tunnel — observed as a 25x CLI slowdown). The config
# update is authoritative; applying it here (before any jax computation)
# makes `JAX_PLATFORMS=cpu python -m qchem_rs_tpu.cli ...` mean what it says.
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    try:
        jax.config.update("jax_platforms", _platforms)
    except Exception:
        pass

# Persistent compilation cache: the class-batched integral kernels compile
# once per (class signature, batch shape); cache them across processes.
#
# The default path is keyed by a host fingerprint (CPU feature flags + jax
# version): XLA:CPU AOT-compiled executables embed host ISA extensions, and
# loading a cache built on a machine with different CPU features can SIGILL /
# SIGSEGV inside compilation_cache.get_executable_and_time (observed: a
# cross-host cache of ~3000 entries segfaulted the test suite). An explicit
# QCHEM_COMPILE_CACHE is honored verbatim (the caller owns coherence).


def _host_fingerprint() -> str:
    import hashlib
    import platform
    import re

    parts = [platform.machine(), jax.__version__]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    fp = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    # Separate cache namespaces per device topology: an 8-virtual-device
    # pytest session (conftest sets xla_force_host_platform_device_count)
    # and a single-device CLI process must not share executables — two
    # crashes inside the cache-entry deserializer (SIGSEGV, then SIGABRT
    # after the atomic-write/locking hardening) both happened while the two
    # topologies ran concurrently against one directory. Parsed from the
    # env (NOT jax.devices(): that would initialize the backend at import,
    # which hangs when the TPU tunnel is wedged).
    m = re.search(
        r"xla_force_host_platform_device_count=(\d+)",
        os.environ.get("XLA_FLAGS", ""),
    )
    if m and m.group(1) != "1":
        fp += f"-v{m.group(1)}"
    return fp


_cache_dir = os.environ.get("QCHEM_COMPILE_CACHE") or os.path.expanduser(
    f"~/.cache/qchem_rs_tpu/xla-{_host_fingerprint()}"
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # A finite max size turns on jax's cross-process FileLock around cache
    # get/put (LRUCache.eviction_enabled) — without it, concurrent processes
    # sharing the cache can read an entry mid-write and feed garbage to the
    # XLA executable deserializer (observed 2026-08-18: SIGSEGV in
    # get_executable_and_time while another process was compiling). 50 GiB
    # means eviction itself effectively never triggers here.
    jax.config.update("jax_compilation_cache_max_size", 50 * 2**30)
except Exception:  # older jax without these options
    pass


def _harden_compile_cache() -> None:
    """Close the two corruption paths of jax's on-disk compile cache.

    1. LRUCache.put writes entries with a bare ``write_bytes`` — NOT
       atomic. A process killed mid-write (``timeout``-bounded runs) leaves
       a truncated entry forever, and a concurrent reader can observe a
       partial file; either way the XLA deserializer gets garbage and can
       SIGSEGV (uncatchable). Replace ``put`` with a same-directory
       temp-file + ``os.replace`` version: an entry is either absent or
       complete.
    2. Eviction mode (which carries the cross-process lock we want) stats
       an ``-atime`` sidecar for every entry; entries written before this
       hardening have none and would raise FileNotFoundError inside put.
       Backfill missing sidecars once at import.

    Best-effort: any drift from the pinned jax internals degrades silently
    to the stock behavior."""
    try:
        import time as _time

        import jax._src.lru_cache as _lru

        if getattr(_lru.LRUCache.put, "_qchem_atomic", False):
            return
        _suffix, _asuffix = _lru._CACHE_SUFFIX, _lru._ATIME_SUFFIX

        try:
            now = _time.time_ns().to_bytes(8, "little")
            with os.scandir(_cache_dir) as it:
                for entry in it:
                    if entry.name.endswith(_suffix):
                        apath = os.path.join(
                            _cache_dir,
                            entry.name[: -len(_suffix)] + _asuffix,
                        )
                        if not os.path.exists(apath):
                            with open(apath, "wb") as fh:
                                fh.write(now)
        except OSError:
            pass

        def put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                return
            cache_path = self.path / f"{key}{_suffix}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                tmp = self.path / f"{key}.tmp{os.getpid()}"
                tmp.write_bytes(val)
                os.replace(tmp, cache_path)
                if self.eviction_enabled:
                    stamp = _time.time_ns().to_bytes(8, "little")
                    (self.path / f"{key}{_asuffix}").write_bytes(stamp)
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        put._qchem_atomic = True
        _lru.LRUCache.put = put
    except Exception:
        pass


_harden_compile_cache()

from qchem_rs_tpu.utils.basis import BasisSet
from qchem_rs_tpu.utils.system import Atom, MolecularSystem
from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.rhf import restricted_hartree_fock, RestrictedHartreeFockOutput
from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock, UnrestrictedHartreeFockOutput
from qchem_rs_tpu.models.gradients import rhf_gradient, uhf_gradient
from qchem_rs_tpu.models.mp2 import mp2, mp2_pair_space, ump2, ump2_pair_space
from qchem_rs_tpu.models.cis import cis, ucis
from qchem_rs_tpu.models.hessian import harmonic_frequencies
from qchem_rs_tpu.models.optimize import optimize_geometry
from qchem_rs_tpu.models.properties import dipole_moment, mulliken_charges
from qchem_rs_tpu.models.response import static_polarizability

__all__ = [
    "BasisSet",
    "Atom",
    "MolecularSystem",
    "HartreeFockConfig",
    "restricted_hartree_fock",
    "RestrictedHartreeFockOutput",
    "unrestricted_hartree_fock",
    "UnrestrictedHartreeFockOutput",
    "rhf_gradient",
    "uhf_gradient",
    "mp2",
    "mp2_pair_space",
    "ump2",
    "ump2_pair_space",
    "cis",
    "ucis",
    "optimize_geometry",
    "harmonic_frequencies",
    "dipole_moment",
    "mulliken_charges",
    "static_polarizability",
]

__version__ = "0.1.0"
