"""Independent plain-numpy RHF for cross-validation.

Deliberately different machinery from the production path: Obara-Saika
integrals (tests/reference/os_integrals.py), scipy's *generalized* symmetric
eigensolver (no Löwdin orthogonalization), plain damped fixed-point iteration
(no DIIS). Agreement of converged energies to ~1e-9 with the JAX framework is
a strong end-to-end correctness check.
"""

import numpy as np
import scipy.linalg

from tests.reference.os_integrals import eri_np, kinetic_np, nuclear_np, overlap_np


def rhf_np(system, nocc=None, max_iter=300, tol=1e-11, damping=0.5):
    S = overlap_np(system)
    H = kinetic_np(system) + nuclear_np(system)
    ERI = eri_np(system)
    n = S.shape[0]
    if nocc is None:
        nocc = system.n_electrons() // 2

    D = np.zeros((n, n))
    E_old = 0.0
    for _ in range(max_iter):
        J = np.einsum("ijkl,kl->ij", ERI, D)
        K = np.einsum("ikjl,kl->ij", ERI, D)
        F = H + J - 0.5 * K
        w, C = scipy.linalg.eigh(F, S)
        Cocc = C[:, :nocc]
        D_new = 2.0 * Cocc @ Cocc.T
        D = damping * D_new + (1 - damping) * D
        E = 0.5 * np.sum(D * (H + F))
        if abs(E - E_old) < tol:
            E_old = E
            break
        E_old = E
    # final consistent energy from the last density
    J = np.einsum("ijkl,kl->ij", ERI, D)
    K = np.einsum("ikjl,kl->ij", ERI, D)
    F = H + J - 0.5 * K
    E_elec = 0.5 * np.sum(D * (H + F))
    return E_elec + system.nuclear_repulsion(), w
