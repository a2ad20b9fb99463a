"""Streaming tests: syslog scanner routing on both batch and real
Structured Streaming micro-batches (reference: src/sources/syslog.lisp)."""

from __future__ import annotations

import time

import pytest

from pgloader_spark.streaming.syslog import (
    Scanner,
    route,
    rsyslog_scanner,
    windowed_counts,
)

LINES = [
    "<13>Feb  5 10:15:32 web01 nginx[1234]: GET /index.html 200",
    "<4>Feb  5 10:15:33 db01 postgres[999]: checkpoint complete",
    "not a syslog line at all",
    "<13>Feb  5 10:15:34 web01 app: user login ok",
]


def test_scanner_batch_routing(spark):
    lines = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    scan = rsyslog_scanner()
    out = scan.apply(lines)
    rows = out.collect()
    assert len(rows) == 3  # the non-matching line is dropped
    first = {r["host"]: r for r in rows}
    assert first["db01"]["priority"] == 4
    assert first["db01"]["program"] == "postgres"
    assert first["db01"]["pid"] == 999
    assert first["db01"]["message"] == "checkpoint complete"
    # no-pid line parses with NULL pid
    app = [r for r in rows if r["program"] == "app"][0]
    assert app["pid"] is None


def test_multi_scanner_route(spark):
    lines = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    web = Scanner("web", r"nginx\[(\d+)\]: (\S+) (\S+) (\d+)",
                  [("pid", 1, "int"), ("verb", 2, "string"),
                   ("path", 3, "string"), ("status", 4, "int")])
    db = Scanner("db", r"postgres\[(\d+)\]: (.*)",
                 [("pid", 1, "int"), ("msg", 2, "string")])
    routed = route(lines, [web, db])
    assert routed["web"].collect()[0]["status"] == 200
    assert routed["db"].collect()[0]["msg"] == "checkpoint complete"


def test_streaming_file_source_to_memory_sink(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.log").write_text("\n".join(LINES) + "\n")
    lines = spark.readStream.format("text").load(str(src))
    assert lines.isStreaming
    out = rsyslog_scanner().apply(lines)
    q = (
        out.writeStream.format("memory")
        .queryName("syslog_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM syslog_mem").collect()
        assert len(got) == 3
        assert {r["host"] for r in got} == {"web01", "db01"}
    finally:
        q.stop()


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    rows = [
        "2024-01-01 00:00:10,a",
        "2024-01-01 00:00:50,a",
        "2024-01-01 00:01:10,b",
    ]
    (src / "b.csv").write_text("\n".join(rows) + "\n")
    stream = (
        spark.readStream.format("csv")
        .schema("ts timestamp, k string")
        .load(str(src))
    )
    agg = windowed_counts(stream, "ts", "1 minute", "2 minutes", ["k"])
    q = (
        agg.writeStream.format("memory")
        .queryName("win_mem")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["k"]): r["n"]
            for r in spark.sql("SELECT * FROM win_mem").collect()
        }
        assert got[("2024-01-01 00:00:00", "a")] == 2
        assert got[("2024-01-01 00:01:00", "b")] == 1
    finally:
        q.stop()


def test_abnf_scanner_compilation():
    """WITH grammar blocks -> regexes with registered group indices
    (the command-syslog.lisp:48-60 surface)."""
    import re

    from pgloader_spark.streaming.abnf import compile_scanner

    cs = compile_scanner(
        'apache = rsyslog DATA = IP REST '
        'IP = 1*3DIGIT "." 1*3DIGIT "." 1*3DIGIT "." 1*3DIGIT '
        'REST = ~/.*/'
    )
    m = re.match(cs.regex, "<13>Aug 14 12:00:01 web01 httpd[123]: 10.0.0.7 GET / 200")
    assert m
    assert m.group(cs.groups["ip"]) == "10.0.0.7"
    assert m.group(cs.groups["timestamp"]) == "Aug 14 12:00:01"
    assert m.group(cs.groups["app-name"]) == "httpd"
    # a non-IP payload must NOT match apache's overridden DATA
    assert not re.match(
        cs.regex, "<13>Aug 14 12:00:02 db01 postgres: checkpoint done"
    )
    plain = compile_scanner("others = rsyslog")
    m2 = re.match(
        plain.regex, "<13>Aug 14 12:00:02 db01 postgres: checkpoint done"
    )
    assert m2 and m2.group(plain.groups["data"]) == "checkpoint done"
