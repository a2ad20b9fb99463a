"""LOAD ARCHIVE end-to-end: zip -> nested CSV loads -> FINALLY
(reference: src/parsers/command-archive.lisp, src/utils/archive.lisp)."""

from __future__ import annotations

import zipfile

from pgloader_spark.parsers.loadcmd import parse_load
from pgloader_spark.plans.executor import ExecutionContext, execute_archive


def test_archive_end_to_end(spark, tmp_path):
    z = tmp_path / "geo.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("locations.csv", "1,paris\n2,berlin\n")
        zf.writestr("blocks.csv", "16909060,16909070,1\n")
    cmd = parse_load(
        f"""
LOAD ARCHIVE
   FROM {z}
   INTO postgresql:///db
   BEFORE LOAD DO $$ create schema geo; $$
   LOAD CSV FROM FILENAME MATCHING ~/locations\\.csv/ (locid, city)
        INTO postgresql:///db?geo.location (locid int, city)
        WITH fields terminated by ','
    AND LOAD CSV FROM FILENAME MATCHING ~/blocks\\.csv/ (startIpNum, endIpNum, locId)
        INTO postgresql:///db?geo.blocks
             (iprange text using (ip-range startIpNum endIpNum), locId int)
        WITH fields terminated by ','
   FINALLY DO $$ analyze geo.location; $$;
"""
    )
    ran: list[str] = []
    ctx = ExecutionContext(spark=spark, root_dir=str(tmp_path), sql_runner=ran.append)
    reports = execute_archive(ctx, cmd)
    assert [r.loaded for r in reports] == [2, 1]
    cities = {r["locid"]: r["city"] for r in reports[0].result.collect()}
    assert cities == {1: "paris", 2: "berlin"}
    blocks = reports[1].result.collect()[0]
    assert blocks["iprange"] == "1.2.3.4-1.2.3.14"
    assert ran[0].startswith("create schema")
    assert ran[-1].startswith("analyze")
