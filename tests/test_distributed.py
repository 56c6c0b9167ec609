"""Multi-host bring-up: distributed_init joins separate processes into one
JAX runtime (SURVEY.md §2.3). Exercised for real with two CPU processes on
localhost — each contributes one device and a psum must see both."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["QCHEM_ROOT"])
    from qchem_rs_tpu.parallel.mesh import distributed_init

    assert distributed_init()  # from JAX_* env vars
    assert jax.process_count() == 2
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(jax.devices(), ("d",))
    # every process contributes its local value; the global sum must be
    # identical everywhere
    total = jax.jit(
        lambda x: jax.lax.psum(x, "d"),
        in_shardings=NamedSharding(mesh, P("d")),
        out_shardings=NamedSharding(mesh, P()),
    )
    n = len(jax.devices())
    vals = jax.device_put(
        jnp.arange(1.0, n + 1), NamedSharding(mesh, P("d"))
    )
    got = float(jax.jit(lambda v: jnp.sum(v))(vals))
    assert got == n * (n + 1) / 2, got
    print("DIST_OK", jax.process_index(), n, flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_distributed_init_noop_without_config(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    from qchem_rs_tpu.parallel.mesh import distributed_init

    assert distributed_init() is False


def test_two_process_cpu_cluster():
    port = _free_port()
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            QCHEM_ROOT=root,
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed: {err[-2000:]}"
        assert "DIST_OK" in out
