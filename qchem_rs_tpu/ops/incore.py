"""Thread-parallel precompilation of the modular per-system programs.

The axon TPU backend's per-program compile latency is the dominant cold-start
cost (~60x the XLA:CPU compile time for the same HLO), but its remote compile
service processes concurrent requests in parallel. The concrete-geometry SCF
paths therefore split the work into modular programs (per-class-pair V2 tile
scans from ops/eri_tiled.py, 1e integrals, the SCF fixed point) and
``precompile`` lowers and compiles them all, optionally from a thread pool.
The persistent compilation cache then makes subsequent processes cheap.
"""

from __future__ import annotations

import concurrent.futures as cf


def precompile(programs, max_workers: int | None = None) -> dict:
    """Lower+compile jitted programs; returns {name: Compiled}.

    Default is SERIAL: the axon remote compile service handles concurrent
    requests, but its helper subprocesses can lose their TPU environment
    under concurrency and then fail stickily with bogus hostname/OOM errors.
    Set QCHEM_COMPILE_WORKERS>1 (or max_workers) to opt into parallel
    compilation. Failures retry with backoff; a program that still fails is
    skipped (the call path compiles it on demand).
    """
    import os
    import time

    if max_workers is None:
        max_workers = int(os.environ.get("QCHEM_COMPILE_WORKERS", "1"))

    def _one(item):
        name, fn, args = item
        t0 = time.perf_counter()
        compiled = fn.lower(*args).compile()
        if os.environ.get("QCHEM_COMPILE_LOG"):
            import sys

            print(f"# compile {name}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        return name, compiled

    results: dict = {}
    failed = []
    if max_workers <= 1:
        for it in programs:
            try:
                name, compiled = _one(it)
                results[name] = compiled
            except Exception:
                failed.append(it)
    else:
        with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
            futs = {ex.submit(_one, it): it for it in programs}
            for fut in cf.as_completed(futs):
                try:
                    name, compiled = fut.result()
                    results[name] = compiled
                except Exception:
                    failed.append(futs[fut])
    for it in failed:  # serial retries with backoff
        for attempt in range(3):
            try:
                name, compiled = _one(it)
                results[name] = compiled
                break
            except Exception:
                if attempt == 2:
                    break
                time.sleep(5.0 * (attempt + 1))
    return results
