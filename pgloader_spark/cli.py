"""Command-line entry points.

Re-expresses pgloader's two invocation modes (``src/main.lisp``,
``src/api.lisp:29-141``):

1. ``python -m pgloader_spark file.load`` — parse and run a command
   file (§3.1);
2. ``python -m pgloader_spark SOURCE TARGET`` — sniff the source type
   from the URI / file extension (``cli-type``,
   ``src/parsers/command-parser.lisp:229+``) and synthesize the same
   LoadCommand the DSL would have produced (§3.2).

The summary report prints in the reference's table format.
"""

from __future__ import annotations

import argparse
import os
import sys

from pgloader_spark.parsers.loadcmd import LoadCommand, parse_load

_EXT_KINDS = {
    ".csv": "csv",
    ".tsv": "csv",
    ".txt": "fixed",
    ".fixed": "fixed",
    ".copy": "copy",
    ".dat": "copy",
    ".dbf": "dbf",
    ".db3": "dbf",
    ".ixf": "ixf",
}

_URI_KINDS = ("mysql", "sqlite", "mssql", "postgresql", "pgsql")


def sniff_source_kind(source: str) -> str:
    """URI scheme or file extension -> source kind (cli-type)."""
    for kind in _URI_KINDS:
        if source.startswith(f"{kind}://"):
            return "database"
    ext = os.path.splitext(source.split("?", 1)[0])[1].lower()
    if ext in _EXT_KINDS:
        return _EXT_KINDS[ext]
    if ext in (".gz", ".zip", ".tgz", ".tar"):
        return "archive"
    return "csv"  # the reference's default guess


def command_from_uris(source: str, target: str) -> LoadCommand:
    kind = sniff_source_kind(source)
    if kind == "archive":
        from pgloader_spark.sources.files import expand_archive

        files = expand_archive(source)
        if not files:
            raise ValueError(f"empty archive: {source}")
        source = files[0]
        kind = sniff_source_kind(source)
    cmd = LoadCommand(source_kind=kind, source=source, target=target)
    if kind == "csv":
        cmd.options["header"] = True  # bare-URI mode guesses from data
    return cmd


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="pgloader_spark",
        description="PySpark-native pgloader-capability engine",
    )
    ap.add_argument("source", help="command file (.load) or source URI/path")
    ap.add_argument("target", nargs="?", help="target URI (postgresql://... or a parquet dir)")
    ap.add_argument("--root-dir", default="/tmp/pgloader_spark", help="reject-file root")
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--summary", choices=["text", "csv", "json"], default="text")
    ap.add_argument("--on-error-stop", action="store_true")
    ap.add_argument(
        "--load-py-file",
        action="append",
        default=[],
        metavar="FILE.py",
        help="import a user Python file that calls "
        "register_transform(name, fn) before parsing (the reference's "
        "--load user-Lisp hook, src/main.lisp:174-183)",
    )
    args = ap.parse_args(argv)

    from pgloader_spark.functions.transforms import load_plugin_file

    for plugin in args.load_py_file:
        load_plugin_file(plugin)

    from pgloader_spark.plans.executor import ExecutionContext, execute
    from pgloader_spark.session import get_spark

    if args.source.endswith(".load"):
        with open(args.source) as fh:
            cmd = parse_load(fh.read())
    else:
        if not args.target:
            ap.error("TARGET is required when SOURCE is not a .load file")
        cmd = command_from_uris(args.source, args.target)

    spark = get_spark("pgloader_spark", master=args.master)
    try:
        ctx = ExecutionContext(
            spark=spark, root_dir=args.root_dir, on_error_stop=args.on_error_stop
        )
        if cmd.source_kind == "database":
            from pgloader_spark.plans.executor import execute_database

            reports = execute_database(ctx, cmd)
        else:
            report = execute(ctx, cmd)
            # parquet-dir targets land the data; a postgresql:// target
            # goes through the COPY sink (live server required)
            if args.target and not args.target.startswith("postgresql"):
                report.result.write.mode("overwrite").parquet(args.target)
            elif args.target:
                from pgloader_spark.sources.pg_live import write_pg_copy

                write_pg_copy(report.result, args.target, report.table)
            reports = [report]

        from pgloader_spark.plans.orchestrate import MigrationSummary, TableResult

        summary = MigrationSummary(
            results=[
                TableResult(
                    table=r.table,
                    read=r.read,
                    loaded=r.loaded,
                    errors=r.errors,
                )
                for r in reports
            ]
        )
        out = {
            "text": summary.to_text,
            "csv": summary.to_csv,
            "json": summary.to_json,
        }[args.summary]()
        print(out)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
