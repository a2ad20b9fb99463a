"""CLI tests: source-kind sniffing + end-to-end command-file run
(reference: src/main.lisp, src/api.lisp:29-141)."""

from __future__ import annotations

import json
import subprocess
import sys

from pgloader_spark.cli import command_from_uris, sniff_source_kind


def test_sniff_source_kind():
    assert sniff_source_kind("data.csv") == "csv"
    assert sniff_source_kind("/path/file.dbf") == "dbf"
    assert sniff_source_kind("file.copy") == "copy"
    assert sniff_source_kind("mysql://u@h/db") == "database"
    assert sniff_source_kind("postgresql:///db") == "database"
    assert sniff_source_kind("archive.zip") == "archive"


def test_command_from_uris():
    cmd = command_from_uris("/data/in.csv", "postgresql:///out?t")
    assert cmd.source_kind == "csv"
    assert cmd.options["header"] is True
    assert cmd.target == "postgresql:///out?t"


def test_cli_end_to_end_load_file(tmp_path):
    src = tmp_path / "people.csv"
    src.write_text("id,name\n1,alice\n2,bob\n")
    load = tmp_path / "people.load"
    load.write_text(
        f"""
LOAD CSV
  FROM '{src}' (id, name)
  INTO postgresql:///db?people (id int, name)
  WITH skip header = 1, fields terminated by ',';
"""
    )
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, "-m", "pgloader_spark",
            str(load), str(out_dir),
            "--summary", "json", "--master", "local[2]",
            "--root-dir", str(tmp_path / "rejects"),
        ],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "2"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    data = json.loads(line)
    assert data["tables"][0]["loaded"] == 2
    assert data["tables"][0]["errors"] == 0
