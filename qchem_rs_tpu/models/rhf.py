"""Placeholder — implemented in M2."""
restricted_hartree_fock = None
RestrictedHartreeFockOutput = None
