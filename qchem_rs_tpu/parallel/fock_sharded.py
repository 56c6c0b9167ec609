"""Multi-chip integral-direct Fock build: shell-quartet data parallelism.

The Schwarz-screened TILE lists of the streaming direct engine
(ops/fock_stream.py) are sharded across a 1D device mesh; every device
computes and digests its tiles into local J/K partials and the partials
are reduced with ``psum`` over ICI (SURVEY.md §2.2 item 1 — the TPU-native
equivalent of the parallelism the reference doesn't have). The dense SCF
algebra (eigh, DIIS, X) stays replicated — those matrices are tiny next to
the tile work.

Round-3 note: this retires the round-1 quartet-chunk scatter-add
architecture (profiled at ~99% digestion overhead) — the sharded path now
runs the same tile kernels + one-hot MXU digestion as the single-chip
streaming builder. The MEMORY-scaling multi-chip engine is
ops/fock_pair.PairSpaceShardedFockBuilder (pair-space matrices column-
sharded over the mesh); this one is the COMPUTE-scaling engine for
integral-direct iteration.
"""

from __future__ import annotations

from jax.sharding import Mesh

from qchem_rs_tpu.ops.fock_stream import StreamingFockBuilder
from qchem_rs_tpu.utils.system import MolecularSystem


class ShardedFockBuilder(StreamingFockBuilder):
    """Integral-direct J/K with tile lists sharded over a mesh axis."""

    def __init__(
        self,
        system: MolecularSystem,
        mesh: Mesh,
        axis: str = "q",
        threshold: float = 1e-12,
        positions=None,
    ):
        super().__init__(
            system,
            threshold=threshold,
            positions=positions,
            mesh=mesh,
            axis=axis,
        )
