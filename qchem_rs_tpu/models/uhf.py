"""Placeholder — implemented in M3."""
unrestricted_hartree_fock = None
UnrestrictedHartreeFockOutput = None
