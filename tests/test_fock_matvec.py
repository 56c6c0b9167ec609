"""Double-float Pallas Fock matvec (ops/fock_matvec.py): kernel vs the f64
matmul it replaces, and the in-core RHF path under QCHEM_INCORE_MATVEC=df.

Runs in Pallas interpret mode off-TPU (same gate as ops/eri_pallas.py)."""

import numpy as np
import jax.numpy as jnp

from qchem_rs_tpu import HartreeFockConfig, restricted_hartree_fock
from qchem_rs_tpu.ops import fock_matvec as fm
from tests.helpers import load_reference_system


def test_matvec_df_matches_f64_matmul():
    rng = np.random.default_rng(0)
    m = 150  # not a multiple of any block size: exercises padding
    T = rng.normal(size=(m, m)) * 3.0
    T = T + T.T  # terms matrices are symmetric; the kernel computes d^T @ T
    d = rng.normal(size=(m,))
    th, tl = fm.split_terms(jnp.asarray(T))
    assert th.shape[0] % max(fm.block_sizes()) == 0
    g = np.asarray(fm.matvec_df(th, tl, jnp.asarray(d), m))
    ref = T @ d
    # df contract: error-free products + ~66 sloppy adds << 1e-10 at O(1) data
    assert np.max(np.abs(g - ref)) < 1e-10


def test_matvec_df_multiblock_grid():
    rng = np.random.default_rng(1)
    bk, bj = fm.block_sizes()
    m = max(bk, bj) + 37  # forces a 2x2+ block grid with a ragged edge
    T = rng.normal(size=(m, m))
    T = T + T.T
    d = rng.normal(size=(m,))
    th, tl = fm.split_terms(jnp.asarray(T))
    g = np.asarray(fm.matvec_df(th, tl, jnp.asarray(d), m))
    assert np.max(np.abs(g - T @ d)) < 1e-9


def test_rhf_incore_df_matvec_energy(monkeypatch):
    # the full in-core RHF path with the df matvec: same fixed point as the
    # f64 path to well below the SCF tolerance
    monkeypatch.setenv("QCHEM_INCORE_MATVEC", "df")
    system = load_reference_system("water", "STO-3G")
    cfg = HartreeFockConfig(epsilon=1e-10, max_iterations=200)
    out = restricted_hartree_fock(system, cfg)
    assert out.converged
    monkeypatch.setenv("QCHEM_INCORE_MATVEC", "f64")
    ref = restricted_hartree_fock(system, cfg)
    assert abs(out.total_energy() - ref.total_energy()) < 1e-9
    np.testing.assert_allclose(
        out.orbital_energies, ref.orbital_energies, atol=1e-8
    )
