"""Benchmark: time-to-converged RHF SCF on benzene/cc-pVDZ (BASELINE.json
headline config), on whatever accelerator JAX finds.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}

The reference publishes no benchmark numbers (BASELINE.md); its only recorded
quantitative artifact is a 14.3 s profiled debug-build run. vs_baseline is
reported as (14.3 / value), i.e. >1 means faster than that profiled run —
the honest comparison available; the real target is the north-star config
itself. The run is executed twice; the second (warm, compile-cached) time is
reported, since compilation is one-time and persistently cached.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

REFERENCE_PROFILED_RUN_S = 14.3


class BenchTimeout(Exception):
    pass


def run_once(system, cfg, budget_s=None):
    import signal

    from qchem_rs_tpu import restricted_hartree_fock

    if budget_s:
        def _raise(signum, frame):
            raise BenchTimeout(f"exceeded {budget_s}s budget")

        signal.signal(signal.SIGALRM, _raise)
        signal.alarm(int(budget_s))
    try:
        t0 = time.perf_counter()
        out = restricted_hartree_fock(system, cfg)
        elapsed = time.perf_counter() - t0
    finally:
        if budget_s:
            signal.alarm(0)
    return out, elapsed


CONFIGS = [
    ("benzene", os.path.join(ROOT, "data", "basis", "cc-pVDZ.json"), "rhf_benzene_ccpvdz"),
    ("benzene", os.path.join(ROOT, "data", "basis", "6-31G.json"), "rhf_benzene_631g"),
    ("water", os.path.join(ROOT, "data", "basis", "cc-pVDZ.json"), "rhf_water_ccpvdz"),
    # BASELINE config 5 (opt-in via QCHEM_BENCH_ONLY=rhf_naphthalene_pair):
    # naphthalene/cc-pVDZ via the pair-space Fock engine — no n^4 tensor in
    # HBM (the reference's binding scale limit, rhf.rs:45,58-62)
    ("naphthalene", os.path.join(ROOT, "data", "basis", "cc-pVDZ.json"), "rhf_naphthalene_pair"),
    ("naphthalene", os.path.join(ROOT, "data", "basis", "cc-pVDZ.json"), "rhf_naphthalene_direct"),
]


def _eri_gflops(engine) -> float | None:
    """Total compiled FLOPs of one V2 build (sum over the per-class-pair
    tile-scan executables' XLA cost analysis); None when unavailable."""
    total = 0.0
    for name, ex in (getattr(engine, "_compiled", None) or {}).items():
        if not name.startswith("v2_"):
            continue
        try:
            ca = ex.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            total += float(ca.get("flops", 0.0))
        except Exception:
            return None
    return total / 1e9 if total > 0 else None


def main():
    """Isolate each config in a subprocess: a TPU kernel fault poisons the
    whole process's device handle, so in-process fallback configs would all
    fail spuriously."""
    import subprocess

    only = os.environ.get("QCHEM_BENCH_ONLY")
    if only:
        return run_configs([c for c in CONFIGS if c[2] == only])

    budgets = [float(os.environ.get("QCHEM_BENCH_BUDGET", 2400)), 700.0, 500.0]
    for (mol, bpath, tag), budget in zip(CONFIGS, budgets):
        env = dict(os.environ, QCHEM_BENCH_ONLY=tag, QCHEM_BENCH_BUDGET=str(budget))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=budget + 600,
            )
        except subprocess.TimeoutExpired:
            print(f"# bench config {tag} subprocess timed out", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
        for line in (proc.stdout or "").splitlines():
            if line.startswith("{"):
                try:
                    if json.loads(line).get("value", -1) > 0:
                        print(line)
                        return 0
                except json.JSONDecodeError:
                    pass
    print(json.dumps({"metric": "time_to_converged_scf", "value": -1, "unit": "s", "vs_baseline": 0}))
    return 1


def _cpu_baseline(tag) -> float | None:
    """Same config on XLA:CPU (all host cores, native f64) — the honest
    apples-to-apples baseline. The reference cannot be built here (molint
    path dep unvendored, Cargo.toml:12) and its only recorded number is a
    14.3 s debug-build profile of an unknown config (BASELINE.md), so the
    defensible comparison is this framework's own CPU path vs its TPU path.
    Runs in a subprocess (the TPU backend must never be re-platformed to
    CPU in-process — see docs/ROADMAP.md backend rules); returns the warm
    wall time, or None off the headline config / on failure."""
    import subprocess

    if tag != "rhf_benzene_ccpvdz" or os.environ.get("QCHEM_BENCH_CPU_CHILD"):
        return None
    import jax

    if jax.default_backend() == "cpu":
        return None
    budget = float(os.environ.get("QCHEM_BENCH_CPU_BUDGET", 1500))
    env = dict(
        os.environ,
        QCHEM_BENCH_ONLY=tag,
        QCHEM_BENCH_CPU_CHILD="1",
        QCHEM_BENCH_BUDGET=str(budget),
        JAX_PLATFORMS="cpu",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=budget + 300,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in (proc.stdout or "").splitlines():
        if line.startswith("{"):
            try:
                v = json.loads(line).get("value", -1)
                if v > 0:
                    return float(v)
            except json.JSONDecodeError:
                pass
    return None


def run_configs(configs):
    from qchem_rs_tpu import BasisSet, HartreeFockConfig, MolecularSystem
    # eps=1e-8 (the BASELINE.json metric). Round 1 could only run 1e-7: the
    # tabulated Boys interpolation lost ~1e-8 absolute on-device, putting the
    # density-RMS noise floor between 1e-7 and 1e-8. The gather-free Boys
    # kernel (ops/boys.py) evaluates to ~2e-15 on TPU, and 1e-8 density-RMS
    # now converges (verified water/cc-pVDZ: 50 iterations, energies stable
    # to 8e-9 across convergence metrics).
    cfg = HartreeFockConfig(epsilon=1e-8, max_iterations=150)
    # hard per-config budget so one slow compile can't consume the bench
    # window; first (headline) config gets the lion's share
    budgets = [float(os.environ.get("QCHEM_BENCH_BUDGET", 2400)), 600.0, 300.0]
    for (mol, basis_path, tag), budget in zip(configs, budgets):
      # the remote compile helper crashes sporadically; one retry per config
      for attempt in range(2):
        if attempt == 1 and not os.environ.get("QCHEM_KERNEL"):
            # insurance: if the Pallas tile kernel failed on this backend,
            # retry on the battle-tested XLA f64 path (fresh system objects
            # below -> fresh engines pick the env up)
            os.environ["QCHEM_KERNEL"] = "f64"
        try:
            import dataclasses

            if tag.endswith("_direct"):
                cfg = dataclasses.replace(cfg, fock_mode="direct")
            elif tag.endswith("_pair"):
                cfg = dataclasses.replace(cfg, fock_mode="pair")
            basis = BasisSet.load(basis_path)
            system = MolecularSystem.load(os.path.join(ROOT, "data", "mol", f"{mol}.json"), basis)
            import signal

            from qchem_rs_tpu.models.rhf import precompile_rhf

            # parallel compile of all programs counts toward the cold time
            def _raise(signum, frame):
                raise BenchTimeout("precompile budget")

            signal.signal(signal.SIGALRM, _raise)
            signal.alarm(int(budget))
            t0 = time.perf_counter()
            try:
                if cfg.fock_mode == "incore":
                    precompile_rhf(system, cfg)
            finally:
                signal.alarm(0)
            precompile_s = time.perf_counter() - t0
            out, cold = run_once(system, cfg, budget_s=max(60, budget - precompile_s))
            cold += precompile_s
            if not out.converged:
                continue
            out2, warm = run_once(system, cfg)
            gflops = None
            eri_s = out2.timings.get("eri_s")
            if eri_s and cfg.fock_mode == "incore":
                from qchem_rs_tpu.models.rhf import _incore_tools

                gf = _eri_gflops(_incore_tools(system, cfg)[1])
                if gf:
                    gflops = round(gf / eri_s, 2)
            from qchem_rs_tpu.ops.eri_tiled import _kernel_mode

            result = {
                "metric": f"time_to_converged_scf_{tag}",
                "value": round(warm, 3),
                "unit": "s",
                "vs_baseline": round(REFERENCE_PROFILED_RUN_S / warm, 2),
                "kernel": _kernel_mode(),
                "cold_s": round(cold, 3),
                "total_energy_hartree": round(out2.total_energy(), 8),
                "iterations": out2.iterations,
                "nao": system.n_basis(),
                "run_s": round(out2.timings.get("total_s", warm), 3),
                "gflops_per_s": gflops,
            }
            cpu = _cpu_baseline(tag)
            if cpu is not None:
                result["cpu_warm_s"] = round(cpu, 3)
                result["speedup_vs_cpu"] = round(cpu / warm, 2)
            print(json.dumps(result))
            return 0
        except BenchTimeout as e:
            print(f"# bench config {tag} timed out: {e}", file=sys.stderr)
            break  # next (smaller) config — retrying won't fit the budget
        except Exception as e:  # noqa: BLE001 — retry once (flaky compiles)
            print(f"# bench config {tag} failed (attempt {attempt + 1}): {type(e).__name__}: {e}", file=sys.stderr)
    print(json.dumps({"metric": "time_to_converged_scf", "value": -1, "unit": "s", "vs_baseline": 0}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
