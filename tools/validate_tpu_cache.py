"""Does jax's persistent compilation cache serialize AXON/TPU-backend
executables across processes?

ROADMAP round 3 recorded "the persistent cache does not hold TPU
executables across processes" but it was never validated on the axon
backend (docs/PROFILE_r04.md deferred it). If it DOES work, every bench
process after the first collapses its ~455 s cold start to cache loads;
if not, the only cold-start levers are compile workers and program count
(VERDICT round 4, item 3).

Method: a child process compiles one representative program (a benzene/
cc-pVDZ class-pair tile scan — the exact program class the cold start is
made of) and prints its compile time plus the cache-dir entry delta. Run
the child twice; a second-run compile time near zero + no new entries =
the cache works.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(root)r)
import jax
import qchem_rs_tpu  # installs the persistent-cache config
from qchem_rs_tpu import BasisSet, MolecularSystem

basis = BasisSet.load(os.path.join(%(root)r, "data", "basis", "STO-3G.json"))
system = MolecularSystem.load(
    os.path.join(%(root)r, "data", "mol", "water.json"), basis
)
from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

t0 = time.perf_counter()
# threshold=0: skip the Schwarz bound programs (they execute on device and
# made the round-5 session's probe exceed its budget); one SMALL class-pair
# program answers the serialization question just as well
engine = TiledEriEngine(system, 0.0)
programs = engine.programs()
name, fn, spec = next(p for p in programs if p[0].startswith("v2_"))
t1 = time.perf_counter()
lowered = fn.lower(*spec)
compiled = lowered.compile()
t2 = time.perf_counter()
print(json.dumps({
    "program": name,
    "backend": jax.default_backend(),
    "setup_s": round(t1 - t0, 2),
    "compile_s": round(t2 - t1, 2),
}), flush=True)
"""


def _cache_entries() -> int:
    import glob

    d = os.environ.get("QCHEM_COMPILE_CACHE")
    if not d:
        # replicate the package's default fingerprinted path
        sys.path.insert(0, ROOT)
        import qchem_rs_tpu  # noqa: F401 — sets _cache_dir

        from qchem_rs_tpu import _cache_dir

        d = _cache_dir
    return len(glob.glob(os.path.join(d, "*"))), d


def main() -> int:
    results = []
    for run in (1, 2):
        n_before, cache_dir = _cache_entries()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD % {"root": ROOT}],
            capture_output=True, text=True, timeout=900,
        )
        wall = time.perf_counter() - t0
        n_after, _ = _cache_entries()
        line = next(
            (l for l in (proc.stdout or "").splitlines() if l.startswith("{")),
            None,
        )
        if line is None:
            print(f"# run {run} FAILED rc={proc.returncode}", file=sys.stderr)
            print((proc.stderr or "")[-1500:], file=sys.stderr)
            return 1
        row = json.loads(line)
        row.update(run=run, wall_s=round(wall, 2),
                   new_cache_entries=n_after - n_before)
        results.append(row)
        print(json.dumps(row), flush=True)

    verdict = {
        "cache_dir": cache_dir,
        "cross_process_cache_works": (
            results[1]["compile_s"] < max(2.0, 0.2 * results[0]["compile_s"])
        ),
        "first_compile_s": results[0]["compile_s"],
        "second_compile_s": results[1]["compile_s"],
    }
    print(json.dumps(verdict), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
