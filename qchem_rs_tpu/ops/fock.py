"""Schwarz screening bounds + the dense RHF operator tensor.

Screening is the scale lever the reference lacks entirely — it always
materializes the dense n^4 tensor (rhf.rs:45,58-62, its binding scale limit;
SURVEY.md §5 "long-context" analogue). The bounds computed here feed the
tile-level screening of the pair-space engine (ops/eri_tiled.py) and the
streaming direct builder (ops/fock_stream.py), which digest Schwarz-screened
tile blocks into J/K without scatters.

History: this module once held a scatter-add quartet-direct builder
(`DirectFockBuilder`); docs/PROFILE_r02.md measured its scatters as the
dominant compile/runtime cost on TPU and the streaming tile engine replaced
it (fock_mode="direct" now routes to StreamingFockBuilder, models/rhf.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.eri import PairGroup, _eri_chunk_core
from qchem_rs_tpu.utils.system import MolecularSystem


def schwarz_bounds(groups: list[PairGroup]) -> list[np.ndarray]:
    """q_P = sqrt(max_component (P|P)) per pair, per group (host numpy).

    One jitted program for all groups (fewer compiles exposed to the flaky
    remote compile helper)."""

    def all_bounds():
        out = []
        for g in groups:
            vals = _eri_chunk_core(g.L, g.L, g.E, g.p, g.P, g.E, g.p, g.P)  # (n, A, A)
            out.append(jnp.max(jnp.abs(jnp.diagonal(vals, axis1=1, axis2=2)), axis=1))
        return tuple(out)

    return [np.sqrt(np.asarray(q)) for q in jax.jit(all_bounds)()]


def eri_terms(
    system: MolecularSystem,
    positions=None,
    screening_threshold: float = 0.0,
) -> jnp.ndarray:
    """The RHF operator tensor terms[i,j,k,l] = (ij|kl) - 1/2 (ik|jl)
    (rhf.rs:58-62) via the scatter-free tiled pair-space engine
    (ops/eri_tiled.py). Traceable in ``positions`` for conformer sweeps."""
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

    nao = system.n_basis()
    eng = TiledEriEngine(system, screening_threshold, positions=positions)
    terms = eng.finish_terms(eng.build())
    return terms.reshape(nao, nao, nao, nao)
