"""One-electron integrals: overlap S, kinetic T, nuclear attraction V.

Replaces ``molint::{overlap, kinetic, nuclear}`` (consumed at
/root/reference/core/src/hf/rhf.rs:41-43). TPU-first layout: shell pairs are
batched per (la, lb) class with padded primitive axes; the MD recursions
unroll at trace time, so each class is one fused XLA kernel over the whole
pair batch. Padded primitives carry coefficient 0 and so contribute nothing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qchem_rs_tpu.ops.angular import cart_components, ncart
from qchem_rs_tpu.ops.mcmurchie import e_cubes, hermite_expansion_dense, r_table_leading
from qchem_rs_tpu.utils.system import MolecularSystem, ShellClass


def _pair_batch(ca: ShellClass, cb: ShellClass, positions):
    """Full cross product of shells from two classes as flat batched arrays.

    ``positions`` may be a traced (natom, 3) array — shell centers are
    gathered from it, which is what makes jit/vmap conformer sweeps work.
    """
    nA, nB = ca.nshells, cb.nshells
    ia, ib = np.meshgrid(np.arange(nA), np.arange(nB), indexing="ij")
    ia, ib = ia.ravel(), ib.ravel()
    a = jnp.asarray(ca.alphas[ia])[:, :, None]  # (n, Ka, 1)
    b = jnp.asarray(cb.alphas[ib])[:, None, :]  # (n, 1, Kb)
    cc = jnp.asarray(ca.coefs[ia])[:, :, None] * jnp.asarray(cb.coefs[ib])[:, None, :]
    A = positions[ca.atom_indices[ia]]  # (n, 3)
    B = positions[cb.atom_indices[ib]]
    AB = (A - B)[:, None, None, :]  # (n, 1, 1, 3)
    return ia, ib, a, b, cc, A, B, AB


@partial(jax.jit, static_argnums=(0, 1))
def _overlap_class(la: int, lb: int, a, b, cc, AB):
    p = a + b
    ex, ey, ez = e_cubes(la, lb, a, b, AB)
    comps_a, comps_b = cart_components(la), cart_components(lb)
    pref = (jnp.pi / p) ** 1.5 * cc  # (n, Ka, Kb)
    blocks = []
    for (i1, j1, k1) in comps_a:
        row = []
        for (i2, j2, k2) in comps_b:
            s = ex[..., i1, i2, 0] * ey[..., j1, j2, 0] * ez[..., k1, k2, 0]
            row.append(jnp.sum(pref * s, axis=(-1, -2)))
        blocks.append(jnp.stack(row, axis=-1))
    return jnp.stack(blocks, axis=-2)  # (n, ncA, ncB)


@partial(jax.jit, static_argnums=(0, 1))
def _kinetic_class(la: int, lb: int, a, b, cc, AB):
    p = a + b
    # per-dimension overlaps up to j+2 on the ket side
    ex, ey, ez = e_cubes(la, lb + 2, a, b, AB)
    comps_a, comps_b = cart_components(la), cart_components(lb)
    pref = (jnp.pi / p) ** 1.5 * cc

    def tdim(e, i, j):
        # <i| -1/2 d^2/dx^2 |j> / sqrt-factor, from
        # d^2/dx^2 x^j e^{-b x^2} = j(j-1) x^{j-2} - 2b(2j+1) x^j + 4b^2 x^{j+2}
        term = -2.0 * b * b * e[..., i, j + 2, 0] + b * (2 * j + 1) * e[..., i, j, 0]
        if j >= 2:
            term = term - 0.5 * j * (j - 1) * e[..., i, j - 2, 0]
        return term

    blocks = []
    for (i1, j1, k1) in comps_a:
        row = []
        for (i2, j2, k2) in comps_b:
            sx = ex[..., i1, i2, 0]
            sy = ey[..., j1, j2, 0]
            sz = ez[..., k1, k2, 0]
            t = (
                tdim(ex, i1, i2) * sy * sz
                + sx * tdim(ey, j1, j2) * sz
                + sx * sy * tdim(ez, k1, k2)
            )
            row.append(jnp.sum(pref * t, axis=(-1, -2)))
        blocks.append(jnp.stack(row, axis=-1))
    return jnp.stack(blocks, axis=-2)


@partial(jax.jit, static_argnums=(0, 1))
def _nuclear_class(la: int, lb: int, a, b, cc, A, B, AB, charges, positions):
    p = a + b  # (n, Ka, Kb)
    P = (a[..., None] * A[:, None, None, :] + b[..., None] * B[:, None, None, :]) / p[..., None]
    L = la + lb
    E = hermite_expansion_dense(la, lb, a, b, AB)  # (n, Ka, Kb, A, S)
    # batch atoms as a leading axis; R stacked with the Hermite axis leading
    # (see r_table_leading layout note)
    PC = P[None, ...] - positions[:, None, None, None, :]  # (nat, n, Ka, Kb, 3)
    R = r_table_leading(L, p[None, ...], PC)  # (S, nat, n, Ka, Kb)
    RZ = jnp.einsum("c,scnab->snab", charges, R)
    pref = (2.0 * jnp.pi / p) * cc
    V = -jnp.einsum("nab,nabAs,snab->nA", pref, E, RZ)
    n = V.shape[0]
    return V.reshape(n, ncart(la), ncart(lb))


def _assemble(system: MolecularSystem, class_fn, positions) -> jnp.ndarray:
    nao = system.n_basis_cart()
    out = jnp.zeros((nao, nao), dtype=jnp.float64)
    classes = system.shell_classes
    for la, ca in classes.items():
        for lb, cb in classes.items():
            ia, ib, a, b, cc, A, B, AB = _pair_batch(ca, cb, positions)
            block = class_fn(la, lb, ca, cb, a, b, cc, A, B, AB)
            rows = (ca.ao_offsets[ia][:, None, None] + np.arange(ncart(la))[None, :, None])
            cols = (cb.ao_offsets[ib][:, None, None] + np.arange(ncart(lb))[None, None, :])
            out = out.at[rows, cols].set(block)
    norms = jnp.asarray(system.ao_norms)
    out = out * norms[:, None] * norms[None, :]
    if system.spherical:
        T = jnp.asarray(system.sph_T)
        out = T.T @ out @ T
    return out


def _positions(system, positions):
    return jnp.asarray(system.positions) if positions is None else positions


def overlap(system: MolecularSystem, positions=None) -> jnp.ndarray:
    """Full AO overlap matrix S (nao, nao)."""
    positions = _positions(system, positions)
    return _assemble(
        system,
        lambda la, lb, ca, cb, a, b, cc, A, B, AB: _overlap_class(la, lb, a, b, cc, AB),
        positions,
    )


def kinetic(system: MolecularSystem, positions=None) -> jnp.ndarray:
    """Full AO kinetic-energy matrix T (nao, nao)."""
    positions = _positions(system, positions)
    return _assemble(
        system,
        lambda la, lb, ca, cb, a, b, cc, A, B, AB: _kinetic_class(la, lb, a, b, cc, AB),
        positions,
    )


def nuclear(system: MolecularSystem, positions=None) -> jnp.ndarray:
    """Full AO nuclear-attraction matrix V (nao, nao)."""
    positions = _positions(system, positions)
    charges = jnp.asarray(system.charges)
    return _assemble(
        system,
        lambda la, lb, ca, cb, a, b, cc, A, B, AB: _nuclear_class(
            la, lb, a, b, cc, A, B, AB, charges, positions
        ),
        positions,
    )


@partial(jax.jit, static_argnums=(0, 1, 2))
def _moment_class(d: int, la: int, lb: int, a, b, cc, A, B, AB):
    """<i| r_d |j> for one class pair (Cartesian moment about the origin):
    per dimension, <x^i | x | x^j> = E^{ij}_1 + P_x E^{ij}_0 (the t=1
    Hermite expansion coefficient plus the Gaussian-product center), the
    other two dimensions are plain overlaps."""
    p = a + b
    P = (
        a[..., None] * A[:, None, None, :] + b[..., None] * B[:, None, None, :]
    ) / p[..., None]
    es = e_cubes(la, lb, a, b, AB)
    comps_a, comps_b = cart_components(la), cart_components(lb)
    pref = (jnp.pi / p) ** 1.5 * cc

    def dim(e, i, j, moment):
        s0 = e[..., i, j, 0]
        if not moment:
            return s0
        e1 = e[..., i, j, 1] if e.shape[-1] > 1 else jnp.zeros_like(s0)
        return e1 + P[..., d] * s0

    blocks = []
    for ca_ in comps_a:
        row = []
        for cb_ in comps_b:
            s = 1.0
            for dd in range(3):
                s = s * dim(es[dd], ca_[dd], cb_[dd], moment=(dd == d))
            row.append(jnp.sum(pref * s, axis=(-1, -2)))
        blocks.append(jnp.stack(row, axis=-1))
    return jnp.stack(blocks, axis=-2)


def dipole_integrals(system: MolecularSystem, positions=None) -> jnp.ndarray:
    """Cartesian moment matrices <i| r |j>, shape (3, nao, nao), origin 0.

    A capability beyond the reference (qchem-rs computes S/T/V/ERI only);
    built from the same trace-time Hermite expansions as the overlap."""
    positions = _positions(system, positions)
    mats = [
        _assemble(
            system,
            lambda la, lb, ca, cb, a, b, cc, A, B, AB, d=d: _moment_class(
                d, la, lb, a, b, cc, A, B, AB
            ),
            positions,
        )
        for d in range(3)
    ]
    return jnp.stack(mats)
