"""Structure-keyed engine caches: displaced geometries (optimize /
frequencies / chained sweeps) must reuse compiled programs instead of
rebuilding engines per geometry (models/rhf._tools_slot +
TiledEriEngine.rebind_positions)."""

import os

import numpy as np
import pytest

from qchem_rs_tpu import BasisSet, HartreeFockConfig, MolecularSystem, restricted_hartree_fock

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _h2(basis):
    return MolecularSystem.load(os.path.join(DATA, "mol", "hydrogen.json"), basis)


def test_incore_engine_shared_across_displacements():
    from qchem_rs_tpu.models.rhf import _incore_tools

    basis = BasisSet.load(os.path.join(DATA, "basis", "STO-3G.json"))
    s0 = _h2(basis)
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    _, eng0 = _incore_tools(s0, cfg)
    pos = np.asarray(s0.positions).copy()
    pos[1, 2] += 1e-2
    s1 = s0.with_positions(pos)
    ones1, eng1 = _incore_tools(s1, cfg)
    assert eng1 is eng0  # same structure -> same engine (rebound geometry)
    # and the rebound engine computes the DISPLACED geometry's energy
    e0 = restricted_hartree_fock(s0, cfg).total_energy()
    e1 = restricted_hartree_fock(s1, cfg).total_energy()
    fresh = MolecularSystem(
        s1.atoms, BasisSet.load(os.path.join(DATA, "basis", "STO-3G.json"))
    )
    e1_fresh = restricted_hartree_fock(fresh, cfg).total_energy()
    assert e0 != pytest.approx(e1, abs=1e-8)
    assert e1 == pytest.approx(e1_fresh, abs=1e-11)


def test_pair_builder_shared_and_reprepared():
    from qchem_rs_tpu.models.rhf import _direct_tools

    basis = BasisSet.load(os.path.join(DATA, "basis", "STO-3G.json"))
    s0 = _h2(basis)
    cfg = HartreeFockConfig(
        epsilon=1e-10, max_iterations=100, fock_mode="pair",
        screening_threshold=1e-12,
    )
    b0 = _direct_tools(s0, cfg, "pair")
    b0.prepare()
    pos = np.asarray(s0.positions).copy()
    pos[0, 0] -= 2e-2
    s1 = s0.with_positions(pos)
    b1 = _direct_tools(s1, cfg, "pair")
    assert b1 is b0
    assert b1._prepared is None  # stale pair matrices were invalidated
    e1 = restricted_hartree_fock(s1, cfg).total_energy()
    e1_ref = restricted_hartree_fock(
        MolecularSystem(s1.atoms, BasisSet.load(os.path.join(DATA, "basis", "STO-3G.json"))),
        HartreeFockConfig(epsilon=1e-10, max_iterations=100),
    ).total_energy()
    assert e1 == pytest.approx(e1_ref, abs=1e-9)


def test_rebind_drift_guard_rescreens():
    """A rebind beyond QCHEM_RESCREEN_DRIFT re-screens in place: tile lists
    and bound-sort follow the new geometry, and the rebound engine matches a
    FRESH engine built there (VERDICT round 4, weak item 6 — no silently
    stale Schwarz screening on large geometry steps)."""
    from qchem_rs_tpu.ops.eri_tiled import TiledEriEngine

    basis = BasisSet.load(os.path.join(DATA, "basis", "STO-3G.json"))
    s0 = _h2(basis)
    eng = TiledEriEngine(s0, 1e-10)
    ref0 = np.asarray(eng._screen_positions).copy()

    pos = np.asarray(s0.positions).copy()
    pos[1, 2] += 0.8  # stretch well past the 0.25 Bohr drift tolerance
    eng.rebind_positions(pos)
    assert not np.array_equal(np.asarray(eng._screen_positions), ref0)
    np.testing.assert_allclose(np.asarray(eng._screen_positions), pos)

    fresh = TiledEriEngine(s0.with_positions(pos), 1e-10)
    e4_rebound = np.asarray(eng.finish_eri(eng.build()))
    e4_fresh = np.asarray(fresh.finish_eri(fresh.build()))
    np.testing.assert_allclose(e4_rebound, e4_fresh, atol=1e-12)

    # small displacements keep the screening geometry (operand-only rebind)
    eng2 = TiledEriEngine(s0, 1e-10)
    pos2 = np.asarray(s0.positions).copy()
    pos2[1, 2] += 1e-3
    eng2.rebind_positions(pos2)
    np.testing.assert_allclose(np.asarray(eng2._screen_positions), ref0)


def test_hessian_builds_one_engine_set(monkeypatch):
    """H2 frequencies: 3N=6 columns x 2 displacements each, but only ~2
    engine constructions total (one SCF engine + one inside the single
    gradient trace) — the round-3 behavior was 2 fresh engines PER
    displacement."""
    from qchem_rs_tpu.models.hessian import hessian_fd
    from qchem_rs_tpu.ops import eri_tiled

    basis = BasisSet.load(os.path.join(DATA, "basis", "STO-3G.json"))
    system = _h2(basis)
    cfg = HartreeFockConfig(epsilon=1e-11, max_iterations=200)

    count = {"n": 0}
    orig = eri_tiled.TiledEriEngine.__init__

    def counting_init(self, *a, **kw):
        count["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(eri_tiled.TiledEriEngine, "__init__", counting_init)
    H = hessian_fd(system, cfg)
    assert H.shape == (6, 6)
    # symmetric, translation-invariant-ish
    np.testing.assert_allclose(H, H.T, atol=1e-10)
    assert count["n"] <= 3, f"engines rebuilt per displacement: {count['n']}"
