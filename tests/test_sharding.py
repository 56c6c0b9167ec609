"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4): the
sharded integral-direct Fock build must equal the single-device dense build,
and conformer sweeps must shard over the batch axis."""

import jax
import numpy as np
import pytest

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.ops.eri import eri
from qchem_rs_tpu.parallel.fock_sharded import ShardedFockBuilder
from qchem_rs_tpu.parallel.mesh import data_mesh
from qchem_rs_tpu.parallel.sweep import conformer_sweep
from tests.helpers import load_reference_system


@pytest.fixture(scope="module")
def water():
    return load_reference_system("water", "STO-3G")


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_jk_matches_dense(water):
    n = water.n_basis()
    rng = np.random.default_rng(1)
    D = rng.standard_normal((n, n))
    D = D + D.T
    E = np.asarray(eri(water))
    Jd = np.einsum("ijkl,kl->ij", E, D)
    Kd = np.einsum("ikjl,kl->ij", E, D)
    mesh = data_mesh(8, axis="q")
    builder = ShardedFockBuilder(water, mesh, axis="q", threshold=0.0)
    J, K = builder.jk(D)
    np.testing.assert_allclose(np.asarray(J), Jd, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), Kd, atol=1e-10)


def test_conformer_sweep_sharded(water):
    # batch of 5 geometries (pads to 8 devices): stretched water scans
    base = water.positions
    geoms = np.stack([base * s for s in (0.95, 1.0, 1.05, 1.1, 1.2)])
    cfg = HartreeFockConfig(epsilon=1e-8, max_iterations=100)
    energies, converged = conformer_sweep(water, geoms, cfg)
    assert converged.all()
    # spot-check conformer 0 against the single-geometry path
    single = restricted_hartree_fock(
        water.with_positions(geoms[0]), HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    )
    assert abs(energies[0] - single.total_energy()) < 1e-6
    # energies vary across conformers
    assert np.ptp(energies) > 1e-3


def test_pair_sharded_jk_matches_dense(water):
    """Column-sharded (pair-axis) V2f/W matvecs == dense J/K on 8 devices —
    the GSPMD continuation of the pair-space scale path."""
    from qchem_rs_tpu.ops.fock_pair import PairSpaceShardedFockBuilder

    n = water.n_basis()
    rng = np.random.default_rng(2)
    D = rng.standard_normal((n, n))
    D = D + D.T
    E = np.asarray(eri(water))
    Jd = np.einsum("ijkl,kl->ij", E, D)
    Kd = np.einsum("ijkl,jl->ik", E, D)
    mesh = data_mesh(8, axis="q")
    builder = PairSpaceShardedFockBuilder(water, mesh, axis="q", threshold=1e-14)
    V2f, W = builder.prepare()
    # the pair matrices really are sharded over the mesh axis
    assert len(V2f.sharding.device_set) == 8
    assert len(W.sharding.device_set) == 8
    J, K = builder.jk(D)
    np.testing.assert_allclose(np.asarray(J), Jd, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), Kd, atol=1e-10)


def test_sharded_engines_beyond_toy():
    """Ethylene/6-31G* on the 8-way mesh: d shells, 6 tile classes, REAL
    Schwarz screening — both sharded engines vs the dense build at 1e-10
    (the toy water/STO-3G cases exercise only 3 classes and no screening
    pressure)."""
    from qchem_rs_tpu.ops.fock_pair import PairSpaceShardedFockBuilder

    system = load_reference_system("ethylene", "6-31G_st")
    n = system.n_basis()
    assert n >= 38
    rng = np.random.default_rng(3)
    D = rng.standard_normal((n, n))
    D = D + D.T
    E = np.asarray(eri(system))
    Jd = np.einsum("ijkl,kl->ij", E, D)
    Kd = np.einsum("ikjl,kl->ij", E, D)
    scale = max(np.abs(Jd).max(), np.abs(Kd).max())
    mesh = data_mesh(8, axis="q")

    stream = ShardedFockBuilder(system, mesh, axis="q", threshold=1e-12)
    J, K = stream.jk(D)
    assert np.abs(np.asarray(J) - Jd).max() / scale < 1e-10
    assert np.abs(np.asarray(K) - Kd).max() / scale < 1e-10

    pair = PairSpaceShardedFockBuilder(system, mesh, axis="q", threshold=1e-12)
    V2f, W = pair.prepare()
    assert len(V2f.sharding.device_set) == 8
    Jp, Kp = pair.jk(D)
    assert np.abs(np.asarray(Jp) - Jd).max() / scale < 1e-10
    assert np.abs(np.asarray(Kp) - Kd).max() / scale < 1e-10


def test_pair_sharded_rhf_energy(water):
    """Full RHF through the sharded pair builder reaches the same energy."""
    import jax.numpy as jnp
    from qchem_rs_tpu.models.rhf import _rhf_scf_direct
    from qchem_rs_tpu.models import scf
    from qchem_rs_tpu.ops import one_electron
    from qchem_rs_tpu.ops.fock_pair import PairSpaceShardedFockBuilder

    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    dense = restricted_hartree_fock(water, cfg)

    mesh = data_mesh(8, axis="q")
    builder = PairSpaceShardedFockBuilder(water, mesh, axis="q", threshold=1e-14)
    V2f, W = builder.prepare()
    pos = jnp.asarray(water.positions)
    S = one_electron.overlap(water, pos)
    H = one_electron.kinetic(water, pos) + one_electron.nuclear(water, pos)
    X = scf.lowdin_x(S)
    nocc = water.n_electrons(0) // 2

    def run(H, X, S, V2f, W):
        jk = lambda D: builder.jk_sph(D, V2f, W)
        return _rhf_scf_direct(H, X, S, nocc, cfg, jk)

    st = jax.jit(run)(H, X, S, V2f, W)
    total = float(st.energy) + water.nuclear_repulsion()
    assert bool(st.converged)
    assert abs(total - dense.total_energy()) < 1e-9


def test_sharded_pair_mp2_matches_dense(water):
    """Correlation tier over the mesh: MP2 through a COLUMN-SHARDED V2f
    (the transform matmuls run under GSPMD with per-device memory 1/ndev)
    equals the dense in-core MP2 to 1e-9."""
    from qchem_rs_tpu.models.mp2 import mp2, mp2_pair_space
    from qchem_rs_tpu.ops.fock_pair import PairSpaceShardedFockBuilder

    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    dense = mp2(water, cfg)
    mesh = data_mesh(8, axis="q")
    builder = PairSpaceShardedFockBuilder(water, mesh, axis="q", threshold=1e-14)
    V2f, _ = builder.prepare()
    assert len(V2f.sharding.device_set) == 8
    sharded = mp2_pair_space(water, cfg, builder=builder)
    assert abs(sharded.correlation_energy - dense.correlation_energy) < 1e-9
    assert abs(sharded.scf_total_energy - dense.scf_total_energy) < 1e-9


def test_column_sharded_v2_build_matches_dense(water):
    """The build-sharded pair builder (no (M, M) anywhere): J/K equal the
    dense contraction on the toy system, and every device slab is 1/8."""
    from qchem_rs_tpu.parallel.v2_sharded import ColumnShardedPairFockBuilder

    n = water.n_basis()
    rng = np.random.default_rng(4)
    D = rng.standard_normal((n, n))
    D = D + D.T
    E = np.asarray(eri(water))
    Jd = np.einsum("ijkl,kl->ij", E, D)
    Kd = np.einsum("ijkl,jl->ik", E, D)
    mesh = data_mesh(8, axis="q")
    b = ColumnShardedPairFockBuilder(water, mesh, axis="q", threshold=1e-14)
    V2f, W = b.prepare()
    assert len(V2f.sharding.device_set) == 8
    assert len(W.sharding.device_set) == 8
    # per-device slab is (M, Mcap): the build never held (M, M)
    assert V2f.shape == (b.M, 8 * b.Mcap)
    J, K = b.jk(D)
    np.testing.assert_allclose(np.asarray(J), Jd, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), Kd, atol=1e-10)


def test_column_sharded_v2_beyond_toy():
    """Ethylene/6-31G*: d shells, real Schwarz screening, both tile
    orientations exercised through the ordered class-pair task grid."""
    from qchem_rs_tpu.parallel.v2_sharded import ColumnShardedPairFockBuilder

    system = load_reference_system("ethylene", "6-31G_st")
    n = system.n_basis()
    rng = np.random.default_rng(5)
    D = rng.standard_normal((n, n))
    D = D + D.T
    E = np.asarray(eri(system))
    Jd = np.einsum("ijkl,kl->ij", E, D)
    Kd = np.einsum("ikjl,kl->ij", E, D)
    scale = max(np.abs(Jd).max(), np.abs(Kd).max())
    mesh = data_mesh(8, axis="q")
    b = ColumnShardedPairFockBuilder(system, mesh, axis="q", threshold=1e-12)
    J, K = b.jk(D)
    assert np.abs(np.asarray(J) - Jd).max() / scale < 1e-10
    assert np.abs(np.asarray(K) - Kd).max() / scale < 1e-10


def test_column_sharded_rhf_energy(water):
    """Full RHF through the build-sharded builder reaches the dense energy
    (the traceable jk_sph form under jit, matvecs + psum on the mesh)."""
    import jax.numpy as jnp
    from qchem_rs_tpu.models.rhf import _rhf_scf_direct
    from qchem_rs_tpu.models import scf
    from qchem_rs_tpu.ops import one_electron
    from qchem_rs_tpu.parallel.v2_sharded import ColumnShardedPairFockBuilder

    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    dense = restricted_hartree_fock(water, cfg)

    mesh = data_mesh(8, axis="q")
    builder = ColumnShardedPairFockBuilder(water, mesh, axis="q", threshold=1e-14)
    V2f, W = builder.prepare()
    pos = jnp.asarray(water.positions)
    S = one_electron.overlap(water, pos)
    H = one_electron.kinetic(water, pos) + one_electron.nuclear(water, pos)
    X = scf.lowdin_x(S)
    nocc = water.n_electrons(0) // 2

    def run(H, X, S, V2f, W):
        jk = lambda D: builder.jk_sph(D, V2f, W)
        return _rhf_scf_direct(H, X, S, nocc, cfg, jk)

    st = jax.jit(run)(H, X, S, V2f, W)
    total = float(st.energy) + water.nuclear_repulsion()
    assert bool(st.converged)
    assert abs(total - dense.total_energy()) < 1e-9


def test_column_sharded_mp2_matches_dense(water):
    """MP2 through the build-sharded V2f: the whole correlation transform
    runs at 1/ndev memory with NO (M, M) build anywhere, and equals dense
    in-core MP2 to 1e-9."""
    from qchem_rs_tpu.models.mp2 import mp2, mp2_pair_space
    from qchem_rs_tpu.parallel.v2_sharded import ColumnShardedPairFockBuilder

    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    dense = mp2(water, cfg)
    mesh = data_mesh(8, axis="q")
    builder = ColumnShardedPairFockBuilder(water, mesh, axis="q", threshold=1e-14)
    sharded = mp2_pair_space(water, cfg, builder=builder)
    assert abs(sharded.correlation_energy - dense.correlation_energy) < 1e-9
    assert abs(sharded.scf_total_energy - dense.scf_total_energy) < 1e-9


def test_column_sharded_plan_invariants(water):
    """Host-side planner invariants (no device work beyond construction):
    the device tile-columns partition every real V2 column exactly once,
    permidx inverts colperm, and every real AO pair's column is owned."""
    from qchem_rs_tpu.parallel.v2_sharded import ColumnShardedPairFockBuilder

    mesh = data_mesh(8, axis="q")
    b = ColumnShardedPairFockBuilder(water, mesh, axis="q", threshold=1e-14)
    cp = b._colperm
    live = cp[cp >= 0]
    # no canonical column owned twice
    assert len(np.unique(live)) == len(live)
    # every column referenced by the AO pair map is owned by some device
    pmap = b.engine.layout.pmap
    assert np.isin(pmap, live).all()
    # permidx inverts colperm on live slots
    for d in range(cp.shape[0]):
        slots = np.flatnonzero(cp[d] >= 0)
        assert (b._permidx[cp[d, slots]] == d * b.Mcap + slots).all()
    # padding slots carry zero matvec weight
    wj = np.asarray(b._wj_l).reshape(cp.shape)
    assert (wj[cp < 0] == 0).all()
