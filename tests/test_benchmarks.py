"""Benchmark-harness unit tests (no real fits — the timing path is
stubbed).  Pins the --only/--append CSV merge semantics so a partial
re-run never drops rows of scenarios it did not touch (the harness's
crash-resilience contract, ``benchmarks/grids.py``)."""

import csv
import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_grids():
    spec = importlib.util.spec_from_file_location(
        "bench_grids", ROOT / "benchmarks" / "grids.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_grids"] = mod
    spec.loader.exec_module(mod)
    return mod


class _StubTiming:
    seconds = 0.5
    throughput = 123.0
    peak_rss_mb = 1.0
    peak_device_mb = 0.0


def _stub(mod, monkeypatch):
    monkeypatch.setattr(mod, "timed_fit",
                        lambda make, X, y, **kw: _StubTiming())
    monkeypatch.setattr(mod, "make_estimators",
                        lambda select=10: {"Stub": lambda: None})
    monkeypatch.setattr(mod, "classification_data",
                        lambda n, p, seed=42: (None, None))
    monkeypatch.setattr(mod, "device_kind", lambda: "stub")


def _rows(path):
    with open(path, newline="") as fh:
        return [tuple(r) for r in csv.reader(fh)][1:]


def test_only_filters_scenarios(tmp_path, monkeypatch):
    mod = _load_grids()
    _stub(mod, monkeypatch)
    out = tmp_path / "r.csv"
    mod.run(out=str(out), only=["n_dominant"])
    scenarios = {r[0] for r in _rows(out)}
    assert scenarios == {"n_dominant"}


def test_append_keeps_untouched_scenarios(tmp_path, monkeypatch):
    mod = _load_grids()
    _stub(mod, monkeypatch)
    out = tmp_path / "r.csv"
    # full small run -> both scenarios present
    mod.run(out=str(out))
    before = _rows(out)
    assert {r[0] for r in before} == {"p_dominant", "n_dominant"}
    # partial re-run of ONE scenario with --append:
    # p_dominant rows must survive, n_dominant rows must be fresh
    monkeypatch.setattr(mod, "timed_fit",
                        lambda make, X, y, **kw: _StubTiming())
    mod.run(out=str(out), only=["n_dominant"], append=True)
    after = _rows(out)
    assert [r for r in after if r[0] == "p_dominant"] == \
        [r for r in before if r[0] == "p_dominant"]
    assert {r[0] for r in after} == {"p_dominant", "n_dominant"}


def test_append_without_only_is_full_rewrite(tmp_path, monkeypatch):
    mod = _load_grids()
    _stub(mod, monkeypatch)
    out = tmp_path / "r.csv"
    mod.run(out=str(out))
    n_full = len(_rows(out))
    mod.run(out=str(out), append=True)
    assert len(_rows(out)) == n_full  # no duplicated rows
