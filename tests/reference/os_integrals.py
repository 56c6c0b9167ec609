"""Thin re-export: the plain-numpy Obara-Saika integrals oracle moved into
the package (qchem_rs_tpu/ops/np_integrals.py) because the SAD guess
(models/sad.py) needs host-side integrals with no jax backend dependency.
The implementation is still fully independent of the production McMurchie-
Davidson JAX path — tests keep importing from here to mark oracle usage."""

from qchem_rs_tpu.ops.np_integrals import (  # noqa: F401
    boys_np,
    eri_np,
    kinetic_np,
    nuclear_np,
    overlap_np,
    prim_eri,
    prim_kinetic,
    prim_nuclear,
    prim_overlap,
)
