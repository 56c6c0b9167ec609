"""CIS/TDHF excitation energies: closed-form oracle + invariants.

Oracles: (1) H2/STO-3G has exactly one occupied and one virtual orbital, so
the CIS/TDHF problems are 1x1/2x2 and solvable by hand from the MO
integrals; (2) the pair-space path must reproduce the dense transform; (3)
physics: all excitations positive at a stable RHF, TDHF <= CIS state by
state (RPA correlation lowers excitations), triplet <= singlet for the same
dominant transition (exchange splitting), triplet oscillator strengths are
spin-forbidden zeros.
"""

import dataclasses

import numpy as np
import pytest

from qchem_rs_tpu import HartreeFockConfig
from qchem_rs_tpu.models.cis import cis
from tests.helpers import load_reference_system as _load


@pytest.fixture(scope="module")
def h2():
    return _load("hydrogen", "STO-3G")


def test_h2_sto3g_closed_form(h2):
    """no = nv = 1: CIS singlet = (e_a - e_i) + 2(ia|ia) - (ii|aa), triplet
    drops the exchange 2(ia|ia); TDHF singlet = sqrt((A-B)(A+B)) with
    B = 2(ia|ia) - (ii|aa) — all straight from the MO-transformed ERI."""
    import jax.numpy as jnp

    from qchem_rs_tpu import restricted_hartree_fock
    from qchem_rs_tpu.models.rhf import _incore_tools

    cfg = HartreeFockConfig(epsilon=1e-12, max_iterations=100)
    out = restricted_hartree_fock(h2, cfg)
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    _, engine = _incore_tools(h2, cfg)
    e4 = np.asarray(engine.finish_eri(engine.build()))
    Ci, Ca = np.asarray(C[:, 0]), np.asarray(C[:, 1])
    iaia = np.einsum("pqrs,p,q,r,s->", e4, Ci, Ca, Ci, Ca)
    iiaa = np.einsum("pqrs,p,q,r,s->", e4, Ci, Ci, Ca, Ca)
    gap = eps[1] - eps[0]

    s = cis(h2, cfg, nstates=1, output=out)
    assert abs(s.excitation_energies[0] - (gap + 2 * iaia - iiaa)) < 1e-10

    t = cis(h2, cfg, nstates=1, triplet=True, output=out)
    assert abs(t.excitation_energies[0] - (gap - iiaa)) < 1e-10
    assert t.oscillator_strengths[0] == 0.0

    A = gap + 2 * iaia - iiaa
    B = 2 * iaia - iaia  # B[ia,ia] = 2(ia|ia) - (ib|ja)|_{1x1} = (ia|ia)
    td = cis(h2, cfg, nstates=1, tdhf=True, output=out)
    assert abs(td.excitation_energies[0] - np.sqrt((A - B) * (A + B))) < 1e-10


def test_pair_space_matches_dense():
    """water/6-31G: the pair-space V2f transform reproduces the dense
    incore transform (energies AND oscillator strengths)."""
    system = _load("water", "6-31G")
    dense_cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    pair_cfg = dataclasses.replace(dense_cfg, fock_mode="pair")
    d = cis(system, dense_cfg, nstates=6)
    p = cis(system, pair_cfg, nstates=6)
    np.testing.assert_allclose(
        p.excitation_energies, d.excitation_energies, atol=1e-9
    )
    np.testing.assert_allclose(
        p.oscillator_strengths, d.oscillator_strengths, atol=1e-8
    )


def test_invariants_water():
    system = _load("water", "6-31G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    from qchem_rs_tpu import restricted_hartree_fock

    out = restricted_hartree_fock(system, cfg)
    s = cis(system, cfg, nstates=8, output=out)
    td = cis(system, cfg, nstates=8, tdhf=True, output=out)
    t = cis(system, cfg, nstates=8, triplet=True, output=out)

    assert (s.excitation_energies > 0).all()
    assert (s.oscillator_strengths >= -1e-12).all()
    # RPA correlation lowers every excitation (A-B PD at a stable RHF)
    assert (td.excitation_energies <= s.excitation_energies + 1e-12).all()
    # exchange splitting: lowest triplet below lowest singlet
    assert t.excitation_energies[0] < s.excitation_energies[0]
    assert (t.oscillator_strengths == 0).all()
    # energies ascend
    assert (np.diff(s.excitation_energies) >= -1e-12).all()


def test_ucis_closed_shell_is_singlet_triplet_union():
    """Spin-orbital CIS on a closed-shell UHF reference == the sorted union
    of the restricted singlet and triplet CIS spectra (Ms=0 components) —
    a parameter-free oracle for every UCIS block."""
    system = _load("water", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=300, spin_multiplicity=1
    )
    from qchem_rs_tpu.models.cis import ucis

    nall = 2 * 5 * 2  # no*nv per spin, both spins (water/STO-3G: 5 occ, 2 virt)
    u = ucis(system, cfg, nstates=nall)
    s = cis(system, cfg, nstates=10)
    t = cis(system, cfg, nstates=10, triplet=True)
    union = np.sort(np.concatenate([s.excitation_energies, t.excitation_energies]))
    np.testing.assert_allclose(u.excitation_energies, union, atol=1e-7)
    # triplet components carry zero oscillator strength in the union too
    trip = np.isin(
        np.round(u.excitation_energies, 9), np.round(t.excitation_energies, 9)
    )
    assert np.abs(u.oscillator_strengths[trip]).max() < 1e-8


def test_ucis_open_shell_pair_matches_dense():
    """OH radical UCIS: dense and pair-space blocks agree; spectrum sane."""
    import dataclasses as dc

    from qchem_rs_tpu.models.cis import ucis

    from qchem_rs_tpu import unrestricted_hartree_fock

    system = _load("hydroxyl", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-11, max_iterations=400, spin_multiplicity=2
    )
    # one shared UHF reference: separate SCF runs differ at ~3e-4 in the
    # orbitals (OH's degenerate-pi hole converges slowly under diag_rms),
    # which would swamp the pair-vs-dense block numerics under test
    out = unrestricted_hartree_fock(system, cfg)
    d = ucis(system, cfg, nstates=6, output=out)
    p = ucis(system, dc.replace(cfg, fock_mode="pair"), nstates=6, output=out)
    # lowest excitation ~0 is PHYSICAL here: the alpha hole rotates freely
    # within OH's degenerate pi set
    assert (d.excitation_energies > -1e-10).all()
    np.testing.assert_allclose(
        p.excitation_energies, d.excitation_energies, atol=1e-8
    )
    np.testing.assert_allclose(
        p.oscillator_strengths, d.oscillator_strengths, atol=1e-7
    )


def test_unconverged_reference_raises(h2):
    cfg = HartreeFockConfig(epsilon=1e-14, max_iterations=1)
    with pytest.raises(RuntimeError, match="converged"):
        cis(h2, cfg)


def test_davidson_matches_dense():
    """Implicit-sigma Davidson reproduces the dense eigensolve: singlet and
    triplet, incore and pair-space matvecs (the pair path never assembles
    the (no*nv)^2 matrix — Coulomb streams through the resident V2f)."""
    system = _load("water", "6-31G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    for triplet in (False, True):
        dense = cis(system, cfg, nstates=4, triplet=triplet, solver="dense")
        dav = cis(system, cfg, nstates=4, triplet=triplet, solver="davidson")
        np.testing.assert_allclose(
            dav.excitation_energies, dense.excitation_energies, atol=1e-8
        )
        np.testing.assert_allclose(
            dav.oscillator_strengths, dense.oscillator_strengths, atol=1e-6
        )
    cfg_pair = dataclasses.replace(cfg, fock_mode="pair")
    dense = cis(system, cfg_pair, nstates=4, solver="dense")
    dav = cis(system, cfg_pair, nstates=4, solver="davidson")
    np.testing.assert_allclose(
        dav.excitation_energies, dense.excitation_energies, atol=1e-8
    )
    np.testing.assert_allclose(
        dav.oscillator_strengths, dense.oscillator_strengths, atol=1e-6
    )


def test_davidson_rejects_tdhf():
    system = _load("hydrogen", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-9, max_iterations=50)
    with pytest.raises(ValueError, match="davidson"):
        cis(system, cfg, tdhf=True, solver="davidson")


def test_ucis_davidson_matches_dense():
    """Open-shell Davidson (concatenated alpha|beta sigma vectors) equals
    the dense UCIS eigensolve on the OH radical."""
    from qchem_rs_tpu.models.cis import ucis

    system = _load("hydroxyl", "STO-3G")
    cfg = HartreeFockConfig(
        epsilon=1e-9, max_iterations=300, spin_multiplicity=2
    )
    dense = ucis(system, cfg, nstates=4, solver="dense")
    dav = ucis(system, cfg, nstates=4, solver="davidson")
    np.testing.assert_allclose(
        dav.excitation_energies, dense.excitation_energies, atol=1e-8
    )
    np.testing.assert_allclose(
        dav.oscillator_strengths, dense.oscillator_strengths, atol=1e-6
    )
