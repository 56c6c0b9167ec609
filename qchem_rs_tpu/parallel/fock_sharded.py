"""Multi-chip integral-direct Fock build: shell-quartet data parallelism.

The screened quartet chunks (ops/fock.py) are sharded across a 1D device
mesh with ``shard_map``; every device computes J/K partials for its slice of
each quartet chunk and the partials are reduced with ``psum`` over ICI
(SURVEY.md §2.2 item 1 — the TPU-native equivalent of the parallelism the
reference doesn't have). The dense SCF algebra (eigh, DIIS, X) stays
replicated — those matrices are tiny next to the quartet work.

Like the single-chip builder, the whole J/K build is ONE compiled program:
lax.scan over chunks, per-quartet data gathered in-body, quartet axis
partitioned by the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map as _shard_map  # jax >= 0.8: check_rep became check_vma

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qchem_rs_tpu.ops.fock import DirectFockBuilder, _gather_block_args, _jk_block
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
        self.system = system
        self.nao = base.nao

        def _pad_to_mesh(xs):
            # each chunk's quartet axis must split evenly across the mesh;
            # pad with index-0 / weight-0 entries
            br, kt, w = xs
            pad = (-br.shape[1]) % ndev
            if pad == 0:
                return xs
            z = lambda x, fill: jnp.concatenate(
                [x, jnp.full((x.shape[0], pad), fill, x.dtype)], axis=1
            )
            return (z(br, 0), z(kt, 0), z(w, 0.0))

        self._blocks = [
            (g1, g2, shape4, _pad_to_mesh(xs))
            for (g1, g2, shape4, xs) in base._scan_blocks
        ]
        self._xs = [xs for (_, _, _, xs) in self._blocks]
        nao = self.nao

        xs_specs = [jax.tree.map(lambda _: P(None, axis), xs) for xs in self._xs]

        def jk_body(D, all_xs):
            J = jnp.zeros(nao * nao)
            K = jnp.zeros(nao * nao)
            for (g1, g2, shape4, _), xs in zip(self._blocks, all_xs):
                def body(carry, x, g1=g1, g2=g2, shape4=shape4):
                    Jc, Kc = carry
                    br, kt, w = x
                    args = _gather_block_args(g1, g2, br, kt, w)
                    Jc, Kc = _jk_block(g1.L, g2.L, shape4, args, D, Jc, Kc, nao)
                    return (Jc, Kc), None

                (J, K), _ = jax.lax.scan(body, (J, K), xs)
            J = jax.lax.psum(J, axis)
            K = jax.lax.psum(K, axis)
            return J.reshape(nao, nao), K.reshape(nao, nao)

        self._jk = jax.jit(
            shard_map(
                jk_body,
                mesh=mesh,
                in_specs=(P(), xs_specs),
                out_specs=(P(), P()),
                check_rep=False,
            )
        )
        shardings = [
            jax.tree.map(lambda _: NamedSharding(mesh, P(None, axis)), xs)
            for xs in self._xs
        ]
        self._xs = jax.device_put(self._xs, shardings)

    def jk(self, D):
        if self.system.spherical:
            T = jnp.asarray(self.system.sph_T)
            J, K = self._jk(T @ D @ T.T, self._xs)
            return T.T @ J @ T, T.T @ K @ T
        return self._jk(D, self._xs)
