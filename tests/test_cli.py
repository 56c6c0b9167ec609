"""CLI parity tests (reference printed fields: main.rs:98-106/143-152)."""

import numpy as np
import pytest

from qchem_rs_tpu import cli
from tests.helpers import DATA_BASIS, DATA_MOL


def test_rhf_subcommand(capsys):
    rc = cli.main(
        [
            "rhf",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--epsilon", "1e-8",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "hartree fock converged after" in out
    assert "electronic energy:" in out
    assert "nuclear repulsion energy:" in out
    assert "hartree fock energy: -1.117" in out
    assert "orbital energies:" in out


def test_uhf_subcommand(capsys):
    rc = cli.main(
        [
            "uhf",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--epsilon", "1e-8",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "orbital energies alpha spin:" in out
    assert "orbital energies beta spin:" in out


def test_uhf_charge_spin_flags_work(capsys):
    # the reference accepts these flags and ignores them (main.rs:111-117);
    # here they must actually change the result
    args = [
        "uhf",
        "-b", f"{DATA_BASIS}/STO-3G.json",
        "-m", f"{DATA_MOL}/water.json",
        "--epsilon", "1e-8",
    ]
    assert cli.main(args) == 0
    neutral = capsys.readouterr().out
    assert cli.main(args + ["--charge", "1", "--spin-multiplicity", "2"]) == 0
    cation = capsys.readouterr().out

    def energy(s):
        line = [l for l in s.splitlines() if l.startswith("hartree fock energy")][0]
        return float(line.split(":")[1])

    assert energy(neutral) != energy(cation)


def test_info_subcommand(capsys):
    rc = cli.main(
        ["info", "-b", f"{DATA_BASIS}/STO-3G.json", "-m", f"{DATA_MOL}/water.json"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "7 AOs" in out
    assert "electrons: 10" in out


def test_nonconvergence_exit_code(capsys):
    rc = cli.main(
        [
            "rhf",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/water.json",
            "--max-iterations", "1",
            "--epsilon", "1e-14",
        ]
    )
    assert rc == 1
    assert "did not converge" in capsys.readouterr().err


def test_mp2_subcommand(capsys):
    rc = cli.main(
        [
            "mp2",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--epsilon", "1e-10",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "mp2 correlation energy: -0.01" in out
    assert "mp2 total energy:" in out


def test_cis_subcommand(capsys):
    rc = cli.main(
        [
            "cis",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--epsilon", "1e-10",
            "--nstates", "1",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "cis (singlet) finished" in out
    assert "state 1:" in out and "eV  f =" in out


def test_optimize_subcommand(capsys):
    rc = cli.main(
        [
            "optimize",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--epsilon", "1e-11",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "geometry optimization converged" in out
    assert "final energy: -1.117" in out


def test_property_flags(capsys):
    rc = cli.main(
        [
            "rhf",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/water.json",
            "--epsilon", "1e-9",
            "--dipole", "--mulliken",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "dipole moment (a.u.):" in out
    assert "mulliken charges:" in out


def test_ccsd_subcommand(capsys):
    rc = cli.main(
        [
            "ccsd",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--triples",
            "--epsilon", "1e-9",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "ccsd converged after" in out
    assert "ccsd correlation energy:" in out
    # exactly zero for 2 electrons (may format as -0.000000)
    tline = [l for l in out.splitlines() if l.startswith("(t) correction:")][0]
    assert abs(float(tline.split(":")[1])) < 1e-9
    assert "ccsd total energy:" in out


def test_fci_subcommand(capsys):
    rc = cli.main(
        [
            "fci",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--nroots", "2",
            "--epsilon", "1e-9",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "fci solved: 4 determinants" in out
    assert "fci correlation energy:" in out
    assert "fci root 1 total energy:" in out


def test_eom_subcommand(capsys):
    rc = cli.main(
        [
            "eom",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--nstates", "2",
            "--epsilon", "1e-9",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "eom-ccsd finished" in out
    assert "ccsd total energy:" in out
    assert "state 1:" in out and "eV" in out


def test_eom_ip_subcommand(capsys):
    rc = cli.main(
        [
            "eom",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--ip", "--nstates", "1",
            "--epsilon", "1e-9",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "ionization potentials:" in out
    assert "koopmans estimate:" in out


def test_frequencies_thermo_flag(capsys):
    rc = cli.main(
        [
            "frequencies",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--thermo", "--symmetry-number", "2",
            "--epsilon", "1e-9",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "thermochemistry (RRHO" in out
    assert "zero-point energy:" in out
    assert "entropy:" in out


def test_rhf_guess_and_composite_flags(capsys):
    rc = cli.main(
        [
            "rhf",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--epsilon", "1e-8",
            "--guess", "sad",
            "--convergence", "composite:1e-5",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "hartree fock energy: -1.117" in out


def test_bad_convergence_metric_rejected(capsys):
    with pytest.raises(SystemExit):
        cli.main(
            [
                "rhf",
                "-b", f"{DATA_BASIS}/STO-3G.json",
                "-m", f"{DATA_MOL}/hydrogen.json",
                "--convergence", "bogus",
            ]
        )
    assert "unknown convergence metric" in capsys.readouterr().err


def test_ccsd_relaxed_dipole_flag(capsys):
    rc = cli.main(
        [
            "ccsd",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--dipole", "--relaxed",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "ccsd dipole (relaxed, a.u.):" in out


def test_eom_matrix_free_oscillator_strengths(capsys):
    rc = cli.main(
        [
            "eom",
            "-b", f"{DATA_BASIS}/STO-3G.json",
            "-m", f"{DATA_MOL}/hydrogen.json",
            "--nstates", "2",
            "--oscillator-strengths", "--matrix-free",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "amplitude space" in out
    assert "f =" in out
