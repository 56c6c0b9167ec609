"""bench.py stopping-rule selection: env overrides beat the calibration
file; the per-backend calibration applies only to its backend; absent
both, the diag_rms@1e-8 default stands."""

import importlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    import bench as mod

    importlib.reload(mod)
    monkeypatch.setattr(mod, "ROOT", str(tmp_path))
    monkeypatch.delenv("QCHEM_BENCH_METRIC", raising=False)
    monkeypatch.delenv("QCHEM_BENCH_EPS", raising=False)
    return mod, tmp_path


def test_default_without_calibration(bench):
    mod, _ = bench
    assert mod.stop_rule("tpu") == (None, None)


def test_calibration_applies_per_backend(bench):
    mod, root = bench
    (root / "data").mkdir()
    (root / "data" / "calibration.json").write_text(json.dumps(
        {"tpu": {"metric": "diis_err", "epsilon": 1e-6}}
    ))
    assert mod.stop_rule("tpu") == ("diis_err", 1e-6)
    assert mod.stop_rule("cpu") == (None, None)


def test_env_overrides_calibration(bench, monkeypatch):
    mod, root = bench
    (root / "data").mkdir()
    (root / "data" / "calibration.json").write_text(json.dumps(
        {"tpu": {"metric": "diis_err", "epsilon": 1e-6}}
    ))
    monkeypatch.setenv("QCHEM_BENCH_METRIC", "diag_rms")
    monkeypatch.setenv("QCHEM_BENCH_EPS", "1e-8")
    assert mod.stop_rule("tpu") == ("diag_rms", "1e-8")


def test_corrupt_calibration_falls_back(bench):
    mod, root = bench
    (root / "data").mkdir()
    (root / "data" / "calibration.json").write_text("{not json")
    assert mod.stop_rule("tpu") == (None, None)
