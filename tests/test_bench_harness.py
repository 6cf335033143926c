"""JSON-emit guards for bench.py's reporting paths.

The bench harness is the driver's only per-round artifact, and its
modes are normally exercised by hand — a NameError in the final
json.dumps block (as shipped once in --extended: it referenced
default mode's ``skipped`` local) burns a full multi-minute run and
leaves the round with no extended record. These tests stub out Spark
and the query loops and drive each mode's reporting code to the
printed JSON line, so a broken emit block fails in milliseconds
instead of after the measurement.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeSpark:
    def stop(self):
        pass


def _last_json_line(capsys):
    out = [
        line
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert out, "mode printed no JSON line"
    return json.loads(out[-1])


def test_extended_mode_emits_one_json_line(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "make_spark", lambda *a, **k: _FakeSpark())
    monkeypatch.setattr(bench_mod, "_warm_pool", lambda s: None)
    monkeypatch.setattr(
        bench_mod,
        "bench_named",
        lambda spark, sf_dir, names: (
            {"q": 0.1},
            {"q": 42},
            {"q": [0.3, 0.2, 0.1]},
        ),
    )
    bench_mod.run_extended("/root/testdata/sf0.1")
    d = _last_json_line(capsys)
    assert d["queries"] == {"q": 0.1}
    assert d["runs"] == {"q": [0.3, 0.2, 0.1]}
    assert d["rows"] == {"q": 42}
    # bench_named fails loudly on unknown names, so a printed extended
    # total always ran every listed query
    assert d["skipped"] == []
    assert d["value"] == 0.1
    assert d["sf"] == 0.1


def test_scaling_mode_preserves_curated_tail(
    bench_mod, monkeypatch, capsys, tmp_path
):
    """--scaling rewrites everything ABOVE the curated-sections marker
    in BENCH/BASELINE.md and must carry the marker + tail through
    verbatim — losing the tail would destroy the measurement history
    that every round's prose analysis lives in."""
    legs = {
        "32": {"wall_s": 10.0, "control_wall_s": 4.0, "rows": 1000},
        "8": {"wall_s": 30.0, "control_wall_s": 12.0, "rows": 1000},
    }
    monkeypatch.setattr(
        bench_mod,
        "_run_scaling_leg",
        lambda sf_dir, cpus, replicate: legs[cpus],
    )
    monkeypatch.chdir(tmp_path)
    marker = "<!-- curated sections below survive --scaling reruns -->"
    curated = marker + "\n\n### History\n\nhand-written analysis\n"
    (tmp_path / "BENCH").mkdir()
    (tmp_path / "BENCH" / "BASELINE.md").write_text(
        "# old auto block\n\nstale table\n\n" + curated
    )
    bench_mod.run_scaling("/root/testdata/sf0.1")
    d = _last_json_line(capsys)
    # raw eff = (thr32/thr8)/4 = (30/10)/4
    assert d["value"] == 0.75
    assert d["machine_ceiling_efficiency"] == 0.75
    assert d["normalized_efficiency"] == 1.0
    out = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "stale table" not in out
    assert out.count(marker) == 1
    assert out.endswith(curated)
    assert "| local[32], pinned to 32 cores | 1000 | 10.00 |" in out


def test_weak_scaling_mode_emits_one_json_line(bench_mod, monkeypatch, capsys):
    legs = {
        "32": {"wall_s": 12.0, "control_wall_s": 4.0, "rows": 4000},
        "8": {"wall_s": 10.0, "control_wall_s": 12.0, "rows": 1000},
    }
    monkeypatch.setattr(
        bench_mod,
        "_run_scaling_leg",
        lambda sf_dir, cpus, replicate: legs[cpus],
    )
    bench_mod.run_weak_scaling("/root/testdata/sf0.1")
    d = _last_json_line(capsys)
    assert d["value"] == round(10.0 / 12.0, 3)
    assert d["rows"] == {"local8": 1000, "local32": 4000}


def test_sf_scaling_mode_emits_known_exponents(bench_mod, monkeypatch, capsys):
    """The ladder mode is the longest-running bench mode; its
    reporting is pure math over bench_named results — pin it with a
    known answer (10x rows, 10x wall -> exponent exactly 1.0)."""
    walls = {"0.01": 0.2, "0.1": 2.0}

    def fake_bench_named(spark, sf_dir, names):
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        return {q: walls[sf] for q in names}, {q: 1 for q in names}, {}

    monkeypatch.setattr(bench_mod, "make_spark", lambda *a, **k: _FakeSpark())
    monkeypatch.setattr(bench_mod, "_warm_pool", lambda s: None)
    monkeypatch.setattr(bench_mod, "bench_named", fake_bench_named)
    bench_mod.run_sf_scaling(
        ["/root/testdata/sf0.1", "/root/testdata/sf0.01"], queries=("q1", "q2")
    )
    d = _last_json_line(capsys)
    assert d["exponents"] == {"q1": 1.0, "q2": 1.0}
    assert d["value"] == 1.0
    assert d["unit"] == "exponent"


def test_default_mode_emits_one_json_line(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "make_spark", lambda *a, **k: _FakeSpark())
    monkeypatch.setattr(bench_mod, "_warm_pool", lambda s: None)
    monkeypatch.setattr(
        bench_mod,
        "bench_queries",
        lambda spark, sf_dir: (
            {"q": 0.5},
            {"q": 7},
            {"q": [0.7, 0.6, 0.5]},
            ["missing_query"],
        ),
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench_mod.main()
    d = _last_json_line(capsys)
    assert d["value"] == 0.5
    # a shrunken headline set must be visible in the artifact itself
    assert d["skipped"] == ["missing_query"]
    assert d["sf"] == 0.1
