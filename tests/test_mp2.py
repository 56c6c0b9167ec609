"""MP2 correlation energy vs an independent numpy oracle."""

import numpy as np

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.models.mp2 import mp2
from qchem_rs_tpu.ops.eri import eri
from tests.helpers import load_reference_system


def _mp2_numpy(system, out, nocc):
    """Independent formulation: dense numpy transform + explicit loops-free
    einsum straight from the definition (no shared code with models/mp2)."""
    e4 = np.asarray(eri(system))
    C = np.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    Co, Cv = C[:, :nocc], C[:, nocc:]
    ovov = np.einsum("pqrs,pi,qa,rj,sb->iajb", e4, Co, Cv, Co, Cv, optimize=True)
    eo, ev = eps[:nocc], eps[nocc:]
    denom = eo[:, None, None, None] + eo[None, None, :, None] \
        - ev[None, :, None, None] - ev[None, None, None, :]
    t = ovov / denom
    return float(np.sum(t * (2.0 * ovov - ovov.transpose(0, 3, 2, 1))))


def test_mp2_matches_numpy_oracle():
    for mol, basis in [("hydrogen", "STO-3G"), ("water", "STO-3G")]:
        system = load_reference_system(mol, basis)
        cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
        out = restricted_hartree_fock(system, cfg)
        nocc = system.n_electrons(0) // 2
        ref = _mp2_numpy(system, out, nocc)
        res = mp2(system, cfg, output=out)
        assert res.correlation_energy < 0  # correlation always lowers E
        assert abs(res.correlation_energy - ref) < 1e-10, (mol, basis)


def test_mp2_frozen_core():
    """frozen="auto" (water: O 1s) equals an independent numpy transform
    restricted to non-core occupieds, across all three entry points."""
    from qchem_rs_tpu.models.mp2 import mp2_pair_space, ump2

    system = load_reference_system("water", "6-31G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    out = restricted_hartree_fock(system, cfg)
    nocc = system.n_electrons(0) // 2

    e4 = np.asarray(eri(system))
    C = np.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    Co, Cv = C[:, 1:nocc], C[:, nocc:]  # drop the O 1s core orbital
    ovov = np.einsum("pqrs,pi,qa,rj,sb->iajb", e4, Co, Cv, Co, Cv, optimize=True)
    eo, ev = eps[1:nocc], eps[nocc:]
    denom = eo[:, None, None, None] + eo[None, None, :, None] \
        - ev[None, :, None, None] - ev[None, None, None, :]
    t = ovov / denom
    ref = float(np.sum(t * (2.0 * ovov - ovov.transpose(0, 3, 2, 1))))

    fc = mp2(system, cfg, frozen="auto", output=out)
    assert abs(fc.correlation_energy - ref) < 1e-10
    full = mp2(system, cfg, output=out)
    # freezing the core drops (negative) correlation contributions
    assert full.correlation_energy < fc.correlation_energy < 0

    pair = mp2_pair_space(system, cfg, frozen="auto", output=out)
    assert abs(pair.correlation_energy - ref) < 1e-9

    u = ump2(system, cfg, frozen="auto")
    assert abs(u.correlation_energy - ref) < 1e-8


def test_mp2_basis_set_growth():
    """Correlation magnitude grows with the basis (more virtuals)."""
    system_small = load_reference_system("water", "STO-3G")
    system_big = load_reference_system("water", "6-31G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=300)
    small = mp2(system_small, cfg)
    big = mp2(system_big, cfg)
    assert big.correlation_energy < small.correlation_energy < 0
    assert big.total_energy() < big.scf_total_energy


def test_ump2_closed_shell_matches_rmp2():
    """UMP2 on a closed shell == restricted MP2."""
    from qchem_rs_tpu.models.mp2 import ump2

    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    r = mp2(system, cfg)
    u = ump2(system, cfg)
    assert abs(u.correlation_energy - r.correlation_energy) < 1e-8
    assert abs(u.scf_total_energy - r.scf_total_energy) < 1e-8


def test_ump2_triplet_oxygen():
    """Open-shell UMP2: triplet O2/STO-3G correlates and stays finite."""
    from qchem_rs_tpu.models.mp2 import ump2

    system = load_reference_system("oxygen", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-10, max_iterations=400, spin_multiplicity=3
    )
    u = ump2(system, cfg)
    assert u.correlation_energy < -0.01
    assert u.total_energy() < u.scf_total_energy


def test_ump2_pair_space_matches_incore():
    """The no-n^4 pair-space UMP2 == the dense-transform UMP2 (open shell,
    cart + spherical), including frozen-core."""
    from qchem_rs_tpu.models.mp2 import ump2, ump2_pair_space
    from qchem_rs_tpu.utils.basis import BasisSet
    from qchem_rs_tpu.utils.system import MolecularSystem
    import os

    data = os.path.join(os.path.dirname(__file__), "..", "data")
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=400, spin_multiplicity=2
    )
    for spherical in (False, True):
        b = BasisSet.load(os.path.join(data, "basis", "6-31G.json"))
        s = MolecularSystem.load(
            os.path.join(data, "mol", "hydroxyl.json"), b, spherical=spherical
        )
        dense = ump2(s, cfg, frozen="auto")
        pair = ump2_pair_space(s, cfg, frozen="auto")
        assert abs(pair.correlation_energy - dense.correlation_energy) < 1e-9, spherical
        assert abs(pair.scf_total_energy - dense.scf_total_energy) < 1e-8, spherical


def test_mp2_pair_space_matches_incore():
    """The no-n^4 pair-space MP2 == the dense-transform MP2 (cart + sph)."""
    from qchem_rs_tpu.models.mp2 import mp2_pair_space
    from qchem_rs_tpu.utils.basis import BasisSet
    from qchem_rs_tpu.utils.system import MolecularSystem
    import os

    data = os.path.join(os.path.dirname(__file__), "..", "data")
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=300)
    for spherical in (False, True):
        b = BasisSet.load(os.path.join(data, "basis", "cc-pVDZ.json"))
        s = MolecularSystem.load(
            os.path.join(data, "mol", "water.json"), b, spherical=spherical
        )
        dense = mp2(s, cfg)
        pair = mp2_pair_space(s, cfg)
        assert abs(pair.correlation_energy - dense.correlation_energy) < 1e-9, spherical
