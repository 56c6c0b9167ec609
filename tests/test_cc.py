"""CCSD / CCSD(T) against the FCI anchor and MP2 consistency.

Trust chain: models/fci.py is validated element-by-element against a
brute-force second-quantization oracle (tests/test_fci.py); CCSD must then
(a) start exactly at MP2 (independently tested module), (b) reproduce FCI
to machine precision on two-electron systems — where CCSD is exact — and
(c) land inside the FCI envelope on >2-electron systems, with (T) moving
it closer. The UHF and RHF reference paths must coincide on closed shells.
"""

import numpy as np
import pytest

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.models.cc import ccsd
from qchem_rs_tpu.models.fci import fci
from tests.helpers import load_reference_system


def test_h2_ccsd_equals_fci():
    """Two electrons: CCSD is exact, so it must match FCI to ~1e-9."""
    from qchem_rs_tpu.models.mp2 import mp2

    system = load_reference_system("hydrogen", "6-31G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    cc = ccsd(system, config, cc_epsilon=1e-10)
    assert cc.converged
    ref = fci(system, config)
    assert cc.total_energy() == pytest.approx(ref.total_energy(), abs=1e-9)
    m = mp2(system, config)
    assert cc.mp2_correlation_energy == pytest.approx(
        m.correlation_energy, abs=1e-9
    )
    # (T) on a 2-electron system is strictly zero (no triples possible)
    cc_t = ccsd(system, config, triples=True, cc_epsilon=1e-10)
    assert cc_t.triples_correction == pytest.approx(0.0, abs=1e-12)


def test_water_sto3g_ccsd_fci_envelope():
    """10 electrons: CCSD recovers most of the FCI correlation and (T)
    tightens it; iteration 0 is exactly MP2."""
    from qchem_rs_tpu.models.mp2 import mp2

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    cc = ccsd(system, config, triples=True, cc_epsilon=1e-9)
    assert cc.converged
    ref = fci(system, config)
    m = mp2(system, config)
    assert cc.mp2_correlation_energy == pytest.approx(
        m.correlation_energy, abs=1e-9
    )
    e_fci = ref.total_energy()
    e_ccsd = cc.scf_total_energy + cc.correlation_energy
    # CCSD beats MP2 and sits within a few mEh of FCI at equilibrium
    assert abs(e_ccsd - e_fci) < 3e-3
    assert abs(e_ccsd - e_fci) < abs(m.total_energy() - e_fci)
    # (T) moves toward FCI
    assert abs(cc.total_energy() - e_fci) < abs(e_ccsd - e_fci)


def test_uhf_reference_matches_rhf_on_closed_shell():
    """The spinorbital code path fed a UHF output on a closed shell must
    reproduce the RHF-reference result (alpha == beta blocks)."""
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    cc_r = ccsd(system, config, cc_epsilon=1e-10)
    u_out = unrestricted_hartree_fock(system, config)
    assert u_out.converged
    cc_u = ccsd(system, config, cc_epsilon=1e-10, output=u_out)
    assert cc_u.correlation_energy == pytest.approx(
        cc_r.correlation_energy, abs=1e-7
    )


def test_open_shell_ccsd_hydroxyl():
    """OH radical (doublet): UHF-based CCSD lands within the FCI envelope
    and below UMP2."""
    from qchem_rs_tpu.models.mp2 import ump2

    system = load_reference_system("hydroxyl", "STO-3G")
    config = HartreeFockConfig(
        epsilon=1e-9, max_iterations=300, spin_multiplicity=2
    )
    cc = ccsd(system, config, triples=True, cc_epsilon=1e-9)
    assert cc.converged
    ref = fci(system, config)
    e_fci = ref.total_energy()
    e_ccsd = cc.scf_total_energy + cc.correlation_energy
    m = ump2(system, config)
    assert cc.mp2_correlation_energy == pytest.approx(
        m.correlation_energy, abs=1e-8
    )
    assert abs(e_ccsd - e_fci) < 3e-3
    assert abs(e_ccsd - e_fci) < abs(m.total_energy() - e_fci)
    # CCSD is already uEh-exact here (measured 8e-7); (T) may overshoot
    # slightly rather than strictly improve — it must stay in that noise.
    assert abs(cc.total_energy() - e_fci) < 5e-6


def test_frozen_core_ccsd():
    """Frozen core drops the O 1s: correlation shrinks but stays the right
    order, and the run still converges."""
    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    full = ccsd(system, config, cc_epsilon=1e-9)
    fz = ccsd(system, config, frozen="auto", cc_epsilon=1e-9)
    assert fz.converged
    assert 0 > fz.correlation_energy > full.correlation_energy
    assert abs(fz.correlation_energy - full.correlation_energy) < 5e-3


def test_spatial_formulation_matches_spinorbital():
    """The closed-shell spin-adapted fast path (16x less memory) reproduces
    the spinorbital formulation exactly: correlation energy to 1e-9 on
    water in two bases, with and without frozen core."""
    for basis in ("STO-3G", "6-31G"):
        system = load_reference_system("water", basis)
        config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
        so = ccsd(system, config, cc_epsilon=1e-10, formulation="spinorbital")
        sp = ccsd(system, config, cc_epsilon=1e-10, formulation="spatial")
        assert sp.converged and so.converged
        assert sp.correlation_energy == pytest.approx(
            so.correlation_energy, abs=1e-9
        )
        assert sp.mp2_correlation_energy == pytest.approx(
            so.mp2_correlation_energy, abs=1e-10
        )
    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    so = ccsd(system, config, cc_epsilon=1e-10, frozen="auto",
              formulation="spinorbital")
    sp = ccsd(system, config, cc_epsilon=1e-10, frozen="auto",
              formulation="spatial")
    assert sp.correlation_energy == pytest.approx(so.correlation_energy, abs=1e-9)


def test_spatial_formulation_guards():
    system = load_reference_system("hydroxyl", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-9, max_iterations=300,
                               spin_multiplicity=2)
    with pytest.raises(ValueError, match="closed shell"):
        ccsd(system, config, formulation="spatial")


def test_spatial_triples_matches_spinorbital():
    """Closed-shell (T) in spatial orbitals (block-decomposed formula)
    equals the spinorbital (T) to 1e-10 after identically converged
    amplitudes."""
    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    so = ccsd(system, config, cc_epsilon=1e-11, triples=True,
              formulation="spinorbital")
    sp = ccsd(system, config, cc_epsilon=1e-11, triples=True,
              formulation="spatial")
    assert sp.triples_correction == pytest.approx(
        so.triples_correction, abs=1e-10
    )
    assert sp.triples_correction < 0.0


def test_spatial_pair_blocks_match_incore():
    """fock_mode='pair' CCSD (MO blocks through the resident V2f, no n^4
    AO tensor) equals the incore transform, cartesian and spherical."""
    import dataclasses

    for spherical in (False, True):
        system = load_reference_system("water", "6-31G")
        if spherical:
            from qchem_rs_tpu.utils.basis import BasisSet
            from qchem_rs_tpu.utils.system import MolecularSystem
            from tests.helpers import DATA_BASIS, DATA_MOL

            b = BasisSet.load(f"{DATA_BASIS}/6-31G.json")
            system = MolecularSystem.load(
                f"{DATA_MOL}/water.json", b, spherical=True
            )
        config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
        inc = ccsd(system, config, cc_epsilon=1e-10)
        pair = ccsd(
            system,
            dataclasses.replace(config, fock_mode="pair"),
            cc_epsilon=1e-10,
        )
        assert pair.converged
        assert pair.correlation_energy == pytest.approx(
            inc.correlation_energy, abs=1e-9
        )


def test_batched_triples_matches_full_tensor():
    """The lax.scan-batched (T) (o^2 v^3 peak memory) equals the full-tensor
    spatial (T) to machine precision on random amplitudes and real MO
    blocks."""
    import jax.numpy as jnp

    from qchem_rs_tpu.models.cc import (
        _mo_phys_blocks,
        _triples_energy_rhf,
        _triples_energy_rhf_batched,
    )
    from qchem_rs_tpu.models.rhf import _incore_tools, restricted_hartree_fock

    system = load_reference_system("water", "STO-3G")
    config = HartreeFockConfig(epsilon=1e-10, max_iterations=100)
    out = restricted_hartree_fock(system, config)
    C = jnp.asarray(out.coefficients)
    eps = np.asarray(out.orbital_energies)
    _, engine = _incore_tools(system, config)
    e4 = engine.finish_eri(engine.build())
    no = system.n_electrons(0) // 2
    g = _mo_phys_blocks(e4, C[:, :no], C[:, no:])
    eps_o, eps_v = jnp.asarray(eps[:no]), jnp.asarray(eps[no:])
    nv = C.shape[1] - no

    rng = np.random.default_rng(7)
    t1 = jnp.asarray(0.1 * rng.standard_normal((no, nv)))
    T = 0.1 * rng.standard_normal((no, no, nv, nv))
    T = jnp.asarray(0.5 * (T + T.transpose(1, 0, 3, 2)))
    e_full = float(_triples_energy_rhf(t1, T, eps_o, eps_v, g))
    e_batch = float(_triples_energy_rhf_batched(t1, T, eps_o, eps_v, g))
    assert e_batch == pytest.approx(e_full, abs=1e-13)
    assert abs(e_full) > 1e-6  # non-trivial value
