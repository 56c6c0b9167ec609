"""Pair-space analytic RHF gradients — no n^4 tensor anywhere.

The dense gradient (models/gradients.py) materializes the (n^2, n^2) RHF
operator inside its trace; this module differentiates the SAME frozen-
coefficient energy functional, but with the two-electron energy assembled
tile-by-tile in the pair space of the tiled ERI engine — the memory envelope
that lets fock_mode="pair" run naphthalene/cc-pVDZ on one chip extends to
nuclear gradients.

Two-electron energy over the mirrored pair matrix V2f (row P = unordered AO
pair (a_P, b_P); live rows carry weights w_P (J) and u_P (exchange), zero on
padding/duplicate rows):

    Tr[D J] = dJ^T V2f dJ,          dJ_P = w_P D[a_P, b_P]
    Tr[D K] = 2 sum_{PQ} V2f[P,Q] u_P u_Q
                 (D[a_P,a_Q] D[b_P,b_Q] + D[a_P,b_Q] D[b_P,a_Q])
    E_2e    = 1/2 Tr[D J] - 1/4 Tr[D K]

(the u derivation: each unordered pair has 2 orderings off-diagonal, 1 on;
u = 1 / 0.5 / 0 for off-diagonal / diagonal / dead rows makes the ordered-
quartet sum come out exactly — same convention as ops/fock_stream.py).

Per tile block (rows r0:r0+nr of V2): the local Z matrix (the pair-space
two-particle density) contracts elementwise with the tile's integral values;
strictly-upper tiles count twice (V2f is symmetric, the engine builds upper
blocks), same-class diagonal tiles once. Each class-pair segment is its own
bounded jax.grad program (device watchdog: executions >~60 s are killed),
with jax.checkpoint on the scan body so the backward pass recomputes tile
integrals instead of storing every Hermite intermediate — the remat trade
that makes reverse-mode through the integral engine HBM-viable.

Tile values run the XLA f64 path (eri_tiled._tile_vals) regardless of
QCHEM_KERNEL: Mosaic kernels define no VJP, and the f64 tile graph is the
battle-tested differentiable formulation.

Replaces: nothing in the reference (qchem-rs computes single-point energies
only, /root/reference/core/src/hf/rhf.rs); capability parity target is the
dense rhf_gradient, oracle-tested against it (tests/test_gradients_pair.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.config import HartreeFockConfig
from qchem_rs_tpu.ops import one_electron
from qchem_rs_tpu.utils.system import MolecularSystem

#: device-execution budget per gradient segment, as a fraction of the
#: forward engines' SEG_UNITS (backward ~2-3x the forward flops + remat)
_GRAD_SEG_FRACTION = 1.0 / 3.0


def _pair_weights(layout, nao: int):
    """(wj, u, ra, rb, pidx) host arrays over the M pair rows."""
    from qchem_rs_tpu.ops.fock_pair import pair_row_ao

    row_i, row_j, dup = pair_row_ao(layout)
    pad = row_i < 0
    ci = np.where(pad, 0, row_i).astype(np.int32)
    cj = np.where(pad, 0, row_j).astype(np.int32)
    dead = pad | dup
    wj = np.where(dead, 0.0, np.where(ci == cj, 1.0, 2.0))
    u = np.where(dead, 0.0, np.where(ci == cj, 0.5, 1.0))
    pidx = (ci * nao + cj).astype(np.int32)
    return wj, u, ci, cj, pidx


class PairGradientProgram:
    """Per-structure pair-space gradient: a set of bounded per-class-pair
    segment programs plus the one-electron rest. Call with (positions, C0,
    occ) — all geometry is runtime operands, so one instance serves every
    same-structure geometry (hessian columns, optimizer steps)."""

    def __init__(self, system: MolecularSystem, config: HartreeFockConfig,
                 scale: float = 2.0):
        from qchem_rs_tpu.models.rhf import _direct_tools
        from qchem_rs_tpu.ops.eri_tiled import (
            SEG_UNITS,
            _tile_list,
            _tile_shapes,
            _tile_units,
        )

        self.system = system
        engine = _direct_tools(system, config, "pair").engine
        self.engine = engine
        layout = engine.layout
        nao = system.n_basis_cart()
        wj, u, ra, rb, pidx = _pair_weights(layout, nao)
        self._wj = jnp.asarray(wj)
        self._u = jnp.asarray(u)
        self._ra = jnp.asarray(ra)
        self._rb = jnp.asarray(rb)
        self._pidx = jnp.asarray(pidx)
        self._scale = scale
        self._charges = jnp.asarray(system.charges)
        self._sphT = jnp.asarray(system.sph_T) if system.spherical else None

        metas = layout.metas
        budget = SEG_UNITS * _GRAD_SEG_FRACTION
        self._tasks = []  # (grad_fn, [segment xs])
        for i1, m1 in enumerate(metas):
            for i2 in range(i1, len(metas)):
                m2 = metas[i2]
                T1, T2 = _tile_shapes(m1, m2)
                same = i2 == i1
                if same:
                    # square tiles: every kept tile is strictly upper or
                    # exactly diagonal (the x2/x1 mirror weights need this)
                    T1 = T2 = min(T1, T2)
                b1 = b2 = None
                if engine.threshold > 0 and engine._sorted_bounds is not None:
                    b1 = engine._sorted_bounds[i1]
                    b2 = engine._sorted_bounds[i2]
                ti, tj, _ = _tile_list(
                    m1, m2, T1, T2, b1, b2, engine.threshold, same=same
                )
                if len(ti) == 0:
                    continue
                per_tile = _tile_units(m1, m2, T1, T2)
                seg = min(len(ti), max(1, int(budget // max(per_tile, 1.0))))
                nseg = -(-len(ti) // seg)
                pad = nseg * seg - len(ti)
                if pad:
                    # sentinel tiles (ti = -1): masked to zero weight
                    ti = np.concatenate([ti, np.full(pad, -1, ti.dtype)])
                    tj = np.concatenate([tj, np.full(pad, -1, tj.dtype)])
                segments = [
                    (jnp.asarray(ti[s * seg: (s + 1) * seg]),
                     jnp.asarray(tj[s * seg: (s + 1) * seg]))
                    for s in range(nseg)
                ]
                self._tasks.append(
                    (self._make_task_grad(i1, i2, m1, m2, T1, T2, same),
                     segments)
                )
        self._rest_grad = self._make_rest_grad()

    # --- traced pieces ----------------------------------------------------

    def _density(self, positions, C0, occ):
        """Frozen-coefficient PER-SPIN densities (2, nao, nao) in the
        CARTESIAN AO basis (the pair space is Cartesian), with the Pulay
        re-orthonormalization C(x) = C0 (3I - C0^T S C0)/2 — see
        models/gradients._inv_sqrt_sym. C0/occ carry a leading spin axis;
        closed shells pass the same C0 twice (D_sigma = D_total / 2)."""
        S = one_electron.overlap(self.system, positions)
        n = S.shape[0]

        def one(C0s, occs):
            M = C0s.T @ S @ C0s
            C = C0s @ (1.5 * jnp.eye(n) - 0.5 * M)
            D = (C * occs[None, :]) @ C.T
            if self._sphT is not None:
                D = self._sphT @ D @ self._sphT.T
            return D

        return jax.vmap(one)(C0, occ)

    def _make_task_grad(self, i1, i2, m1, m2, T1, T2, same):
        from qchem_rs_tpu.ops.eri_tiled import _tile_vals

        A, C_ = m1.A, m2.A
        rbase, cbase = m1.row_base, m2.row_base
        Lb, Lk = m1.la + m1.lb, m2.la + m2.lb
        nr, nc = T1 * A, T2 * C_
        wj, u, ra, rb = self._wj, self._u, self._ra, self._rb
        pidx = self._pidx

        def e2e(positions, C0, occ, xs):
            Ds = self._density(positions, C0, occ)  # (2, nao, nao) per spin
            Dt = Ds[0] + Ds[1]
            padded = self.engine.padded_groups(positions)
            E1, p1, P1 = padded[i1]
            E2, p2, P2 = padded[i2]
            dJ = Dt.reshape(-1)[pidx] * wj

            def body(acc, x):
                t_i, t_j = x
                live = (t_i >= 0).astype(jnp.float64)
                t_i = jnp.maximum(t_i, 0)
                t_j = jnp.maximum(t_j, 0)
                zero = jnp.zeros((), t_i.dtype)
                sl = lambda arr, t, T: jax.lax.dynamic_slice(
                    arr, (t,) + (zero,) * (arr.ndim - 1), (T,) + arr.shape[1:]
                )
                vals = _tile_vals(
                    Lb, Lk,
                    sl(E1, t_i, T1), sl(p1, t_i, T1), sl(P1, t_i, T1),
                    sl(E2, t_j, T2), sl(p2, t_j, T2), sl(P2, t_j, T2),
                )
                r0 = rbase + t_i * A
                c0 = cbase + t_j * C_
                s1 = lambda a, s, n: jax.lax.dynamic_slice(a, (s,), (n,))
                dJr, dJc = s1(dJ, r0, nr), s1(dJ, c0, nc)
                ur, uc = s1(u, r0, nr), s1(u, c0, nc)
                rar, rbr = s1(ra, r0, nr), s1(rb, r0, nr)
                rac, rbc = s1(ra, c0, nc), s1(rb, c0, nc)
                # exchange couples same-spin densities only:
                # E_K = -1/2 sum_sigma Tr[D_sigma K(D_sigma)]; the closed-
                # shell D_a = D_b = D_t/2 case reduces to the old
                # 0.5 * Zk(D_t) factor exactly
                def Zk(D):
                    G = lambda i_, j_: D[i_[:, None], j_[None, :]]
                    return (ur[:, None] * uc[None, :]) * (
                        G(rar, rac) * G(rbr, rbc) + G(rar, rbc) * G(rbr, rac)
                    )

                Z = 0.5 * (dJr[:, None] * dJc[None, :]) - (Zk(Ds[0]) + Zk(Ds[1]))
                w = jnp.where(t_i == t_j, 1.0, 2.0) if same else 2.0
                return acc + live * w * jnp.sum(vals * Z), None

            e, _ = jax.lax.scan(jax.checkpoint(body), jnp.zeros(()), xs)
            return e

        return jax.jit(jax.grad(e2e, argnums=0))

    def _make_rest_grad(self):
        from qchem_rs_tpu.parallel.sweep import nuclear_repulsion_jnp

        system, charges, scale = self.system, self._charges, self._scale

        def rest(positions, C0, occ):
            S = one_electron.overlap(system, positions)
            H = one_electron.kinetic(system, positions) + one_electron.nuclear(
                system, positions
            )
            n = S.shape[0]

            def one(C0s, occs):
                M = C0s.T @ S @ C0s
                C = C0s @ (1.5 * jnp.eye(n) - 0.5 * M)
                return (C * occs[None, :]) @ C.T

            D = jax.vmap(one)(C0, occ).sum(0)  # spin-summed one-electron D
            return jnp.sum(D * H) + nuclear_repulsion_jnp(charges, positions)

        return jax.jit(jax.grad(rest, argnums=0))

    def __call__(self, positions, C0, occ):
        """C0 (n, n) + occ (n,) = closed shell (occ over doubly-occupied
        orbitals; densities split evenly per spin); C0 (2, n, n) + occ
        (2, n) = spin-resolved (UHF)."""
        C0 = jnp.asarray(C0)
        occ = jnp.asarray(occ)
        if C0.ndim == 2:
            C0 = jnp.stack([C0, C0])
            occ = jnp.stack([occ, occ])
        g = self._rest_grad(positions, C0, occ)
        for grad_fn, segments in self._tasks:
            for xs in segments:
                g = g + grad_fn(positions, C0, occ, xs)
        return g


def rhf_gradient_pair(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    output=None,
) -> np.ndarray:
    """Analytic d E_RHF / d positions via the pair-space engine, (natom, 3)
    Hartree/Bohr. Matches models/gradients.rhf_gradient without ever
    materializing the n^4 operator tensor."""
    from qchem_rs_tpu.models.gradients import _grad_program
    from qchem_rs_tpu.models.rhf import restricted_hartree_fock

    config = config or HartreeFockConfig(
        epsilon=1e-10, max_iterations=200, fock_mode="pair"
    )
    out = output or restricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; gradient would be meaningless")
    n = system.n_basis()
    nocc = system.n_electrons(config.charge) // 2
    occ = (jnp.arange(n) < nocc).astype(jnp.float64)
    C0 = jnp.asarray(out.coefficients)
    prog = _grad_program(
        system, config, "rhf_grad_pair",
        lambda: PairGradientProgram(system, config),
    )
    g = prog(jnp.asarray(system.positions), C0, occ)
    return np.asarray(g)


def uhf_gradient_pair(
    system: MolecularSystem,
    config: Optional[HartreeFockConfig] = None,
    *,
    output=None,
) -> np.ndarray:
    """Analytic d E_UHF / d positions via the pair-space engine — the
    open-shell twin of rhf_gradient_pair (matches models/gradients.
    uhf_gradient without the n^4 operator tensor). Same tile programs as
    the closed-shell path: only the spin-resolved densities differ, and
    exchange couples same-spin blocks only."""
    from qchem_rs_tpu.models import scf
    from qchem_rs_tpu.models.gradients import _grad_program
    from qchem_rs_tpu.models.uhf import unrestricted_hartree_fock

    config = config or HartreeFockConfig(
        epsilon=1e-10, max_iterations=300, fock_mode="pair"
    )
    out = output or unrestricted_hartree_fock(system, config)
    if not out.converged:
        raise RuntimeError("SCF not converged; gradient would be meaningless")
    n = system.n_basis()
    nocc = scf.electron_counts(
        system.n_electrons(config.charge), config.spin_multiplicity
    )
    occ = jnp.stack(
        [(jnp.arange(n) < nocc[0]), (jnp.arange(n) < nocc[1])]
    ).astype(jnp.float64)
    C0 = jnp.asarray(out.coefficients)  # (2, n, n)
    prog = _grad_program(
        system, config, "rhf_grad_pair",  # same programs: shapes are shared
        lambda: PairGradientProgram(system, config),
    )
    g = prog(jnp.asarray(system.positions), C0, occ)
    return np.asarray(g)
