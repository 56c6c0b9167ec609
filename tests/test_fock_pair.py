"""Pair-space J/K builder (ops/fock_pair.py) vs dense-tensor contraction.

The pair-space path is the no-n^4 scale design (the reference's binding
limit is its dense n^4 materialization, rhf.rs:45,58-62); these tests pin
its J and K to the dense einsum on small systems where n^4 is trivial.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qchem_rs_tpu.ops.eri import eri
from qchem_rs_tpu.ops.fock_pair import PairSpaceFockBuilder
from qchem_rs_tpu.utils.basis import BasisSet
from qchem_rs_tpu.utils.system import MolecularSystem


@pytest.mark.parametrize(
    "basis,mol",
    [("STO-3G", "water"), ("6-31G", "methane"), ("cc-pVDZ", "water")],
)
def test_pair_jk_matches_dense(data_dir, basis, mol):
    b = BasisSet.load(f"{data_dir}/basis/{basis}.json")
    s = MolecularSystem.load(f"{data_dir}/mol/{mol}.json", b)
    nao = s.n_basis()
    rng = np.random.default_rng(3)
    D = rng.standard_normal((nao, nao))
    D = D + D.T  # densities are symmetric

    e4 = np.asarray(eri(s))
    J_ref = np.einsum("ijkl,kl->ij", e4, D)
    K_ref = np.einsum("ijkl,jl->ik", e4, D)

    builder = PairSpaceFockBuilder(s, threshold=1e-14)
    J, K = builder.jk(jnp.asarray(D))
    scale = max(np.abs(J_ref).max(), 1.0)
    assert np.abs(np.asarray(J) - J_ref).max() / scale < 1e-11
    assert np.abs(np.asarray(K) - K_ref).max() / scale < 1e-11


def test_pair_lean_exchange_matches(data_dir):
    """lean mode (no W matrix — per-call row-scan exchange, the >12 GB
    naphthalene/cc-pVDZ memory fix) must produce identical J and
    near-identical K."""
    b = BasisSet.load(f"{data_dir}/basis/6-31G.json")
    s = MolecularSystem.load(f"{data_dir}/mol/water.json", b)
    nao = s.n_basis()
    rng = np.random.default_rng(7)
    D = rng.standard_normal((nao, nao))
    D = D + D.T

    full = PairSpaceFockBuilder(s, threshold=1e-14, lean=False)
    lean = PairSpaceFockBuilder(s, threshold=1e-14, lean=True)
    assert lean.lean and not full.lean
    assert lean.prepare()[1] is None
    Jf, Kf = full.jk(jnp.asarray(D))
    Jl, Kl = lean.jk(jnp.asarray(D))
    # lean J rides the double-float Pallas matvec over split-f32 storage
    # (~2^-45 effective mantissa), so agreement is df-exact, not bitwise
    jscale = max(np.abs(np.asarray(Jf)).max(), 1.0)
    assert np.abs(np.asarray(Jf) - np.asarray(Jl)).max() / jscale < 1e-12
    scale = max(np.abs(np.asarray(Kf)).max(), 1.0)
    assert np.abs(np.asarray(Kf) - np.asarray(Kl)).max() / scale < 1e-12


def test_pair_jk_screening_consistent(data_dir):
    """A loose-but-sane Schwarz threshold must not move J/K beyond ~tau."""
    b = BasisSet.load(f"{data_dir}/basis/STO-3G.json")
    s = MolecularSystem.load(f"{data_dir}/mol/ethylene.json", b)
    nao = s.n_basis()
    rng = np.random.default_rng(5)
    D = rng.standard_normal((nao, nao))
    D = D + D.T

    tight = PairSpaceFockBuilder(s, threshold=1e-14)
    loose = PairSpaceFockBuilder(s, threshold=1e-8)
    Jt, Kt = tight.jk(jnp.asarray(D))
    Jl, Kl = loose.jk(jnp.asarray(D))
    assert np.abs(np.asarray(Jt) - np.asarray(Jl)).max() < 1e-5
    assert np.abs(np.asarray(Kt) - np.asarray(Kl)).max() < 1e-5


def test_pair_mode_rhf_uhf_energies(data_dir):
    """fock_mode="pair" reaches the in-core fixed point (RHF + UHF)."""
    import dataclasses

    from qchem_rs_tpu import (
        HartreeFockConfig,
        restricted_hartree_fock,
        unrestricted_hartree_fock,
    )

    b = BasisSet.load(f"{data_dir}/basis/STO-3G.json")
    s = MolecularSystem.load(f"{data_dir}/mol/water.json", b)
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    pair = dataclasses.replace(cfg, fock_mode="pair")
    r_ref = restricted_hartree_fock(s, cfg)
    r_pair = restricted_hartree_fock(s, pair)
    assert r_pair.converged
    assert abs(r_pair.total_energy() - r_ref.total_energy()) < 1e-9
    u_ref = unrestricted_hartree_fock(s, cfg)
    u_pair = unrestricted_hartree_fock(s, pair)
    assert u_pair.converged
    assert abs(u_pair.total_energy() - u_ref.total_energy()) < 1e-9


def test_pair_mode_alt_convergence_metrics(data_dir):
    """Pair mode must support every convergence metric the CLI offers
    (review finding: the pair SCF loop once lacked energy/diis_err)."""
    import dataclasses

    from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock

    b = BasisSet.load(f"{data_dir}/basis/STO-3G.json")
    s = MolecularSystem.load(f"{data_dir}/mol/water.json", b)
    ref = restricted_hartree_fock(
        s, HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    ).total_energy()
    for metric, eps in [("energy", 1e-10), ("diis_err", 1e-9)]:
        out = restricted_hartree_fock(
            s,
            HartreeFockConfig(
                epsilon=eps, max_iterations=200, fock_mode="pair",
                convergence_metric=metric,
            ),
        )
        assert out.converged, metric
        assert abs(out.total_energy() - ref) < 1e-8, metric


def test_mirror_inplace_matches_elementwise():
    """mirror_inplace (donation-preserving block mirror) must equal the
    elementwise where(r>c, V2.T, V2) form, including the ragged tail."""
    import numpy as np
    import jax.numpy as jnp

    from qchem_rs_tpu.ops.fock_pair import _mirror, mirror_inplace

    rng = np.random.default_rng(7)
    for M, block in ((5, 2), (128, 32), (300, 128)):
        A = np.triu(rng.standard_normal((M, M)))
        want = np.asarray(_mirror(jnp.asarray(A)))
        got = np.asarray(mirror_inplace(jnp.asarray(A), block=block))
        np.testing.assert_array_equal(got, want)
