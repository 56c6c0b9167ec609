"""Multi-chip integral-direct Fock build: shell-quartet data parallelism.

The screened quartet batches (ops/fock.py) are sharded across a 1D device
mesh with ``shard_map``; every device computes J/K partials for its slice of
each quartet chunk and the partials are reduced with ``psum`` over ICI
(SURVEY.md §2.2 item 1 — the TPU-native equivalent of the parallelism the
reference doesn't have). The dense SCF algebra (eigh, DIIS, X) stays
replicated — those matrices are tiny next to the quartet work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qchem_rs_tpu.ops.fock import DirectFockBuilder, _jk_block
from qchem_rs_tpu.utils.system import MolecularSystem


class ShardedFockBuilder:
    """Integral-direct J/K with quartet chunks sharded over a mesh axis."""

    def __init__(
        self,
        system: MolecularSystem,
        mesh: Mesh,
        axis: str = "q",
        threshold: float = 1e-12,
        positions=None,
        chunk_quartets: int = 4096,
    ):
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        base = DirectFockBuilder(
            system,
            threshold=threshold,
            positions=positions,
            chunk_quartets=chunk_quartets,
        )
        self.nao = base.nao
        # pad every chunk's quartet axis to a multiple of the mesh size so
        # P(axis) can partition it evenly; padding has weight 0
        self._meta = []
        self._chunk_args = []
        for (Lb, Lk, shape4, args) in base._chunks:
            n = args["w"].shape[0]
            npad = (-n) % ndev
            if npad:
                def _pad(k, v):
                    # exponents pad with 1.0 (zero exponents give 0/0 NaNs in
                    # the Boys/alpha math); E pads with 0 so values vanish;
                    # index rows reuse row 0 to stay in-range; weights pad 0
                    fill = jnp.ones if k in ("p1", "p2") else jnp.zeros
                    pad = (
                        jnp.broadcast_to(v[:1], (npad,) + v.shape[1:])
                        if k in ("ii", "jj", "kk", "ll")
                        else fill((npad,) + v.shape[1:], v.dtype)
                    )
                    return jnp.concatenate([v, pad])

                args = {k: _pad(k, v) for k, v in args.items()}
            self._meta.append((Lb, Lk, shape4))
            self._chunk_args.append(args)

        in_specs = (
            P(),  # D replicated
            [jax.tree.map(lambda _: P(axis), a) for a in self._chunk_args],
        )

        def jk_body(D, chunks):
            J = jnp.zeros(self.nao * self.nao)
            K = jnp.zeros(self.nao * self.nao)
            for (Lb, Lk, shape4), args in zip(self._meta, chunks):
                J, K = _jk_block(Lb, Lk, shape4, args, D, J, K, self.nao)
            J = jax.lax.psum(J, axis)
            K = jax.lax.psum(K, axis)
            return J.reshape(self.nao, self.nao), K.reshape(self.nao, self.nao)

        self._jk = jax.jit(
            shard_map(
                jk_body,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(), P()),
                check_rep=False,
            )
        )
        # place chunk data according to the shardings once
        shardings = [
            jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), a)
            for a in self._chunk_args
        ]
        self._chunk_args = jax.device_put(self._chunk_args, shardings)

    def jk(self, D):
        return self._jk(D, self._chunk_args)
