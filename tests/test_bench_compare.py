"""Drift adjudication in tools/bench_compare.py (r9 verdict ask #2):
the uniform-drift vs moved-against-the-pack verdict is computed, not
manual."""

import importlib.util
import json
import pathlib
import sys


def _load_module():
    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "bench_compare", root / "tools" / "bench_compare.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_uniform_drift_flags_nothing():
    bc = _load_module()
    old = {"queries": {f"q{i}": 1.0 for i in range(10)}, "value": 10.0}
    # every query inflates 1.4x together: loaded host, not a regression
    new = {"queries": {f"q{i}": 1.4 for i in range(10)}, "value": 14.0}
    v = bc.compare(old, new)
    assert abs(v["median_ratio"] - 1.4) < 1e-9
    assert v["moved_against_pack"] == []


def test_against_pack_query_flags():
    bc = _load_module()
    old = {"queries": {f"q{i}": 1.0 for i in range(10)}, "value": 10.0}
    q = {f"q{i}": 1.3 for i in range(10)}
    q["q7"] = 2.0  # 2.0 / 1.3-median = 1.54 > PACK_FACTOR
    new = {"queries": q, "value": sum(q.values())}
    v = bc.compare(old, new)
    assert abs(v["median_ratio"] - 1.3) < 1e-9
    assert v["moved_against_pack"] == ["q7"]


def test_r9_driver_artifact_auto_flags_the_watch_items():
    """The rule reproduces the r9 manual adjudication on the REAL
    committed artifacts: both named watch items (dedup_edit_distance
    2.02, audit_table_checksums 1.94) auto-flag, and the flags are
    ranked most-suspect first."""
    bc = _load_module()
    root = pathlib.Path(__file__).resolve().parents[1]
    old = bc.load(str(root / "BENCH_r08.json"))
    new = bc.load(str(root / "BENCH_r09.json"))
    v = bc.compare(old, new)
    assert v["moved_against_pack"][:2] == [
        "dedup_edit_distance",
        "audit_table_checksums",
    ]
    assert 1.0 < v["median_ratio"] < 1.5


def test_disjoint_and_empty_inputs():
    bc = _load_module()
    v = bc.compare(
        {"queries": {"a": 1.0}, "value": 1.0},
        {"queries": {"b": 2.0}, "value": 2.0},
    )
    assert v["shared"] == [] and v["only_new"] == ["b"]
    assert v["only_old"] == ["a"] and v["moved_against_pack"] == []


def test_json_mode_round_trips(tmp_path, capsys, monkeypatch):
    bc = _load_module()
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"queries": {"q": 1.0}, "value": 1.0}))
    b.write_text(json.dumps({"queries": {"q": 1.1}, "value": 1.1}))
    monkeypatch.setattr(
        sys, "argv", ["bench_compare.py", "--json", str(a), str(b)]
    )
    assert bc.main() == 0
    out = json.loads(capsys.readouterr().out)
    assert out["median_ratio"] == 1.1 and out["moved_against_pack"] == []
