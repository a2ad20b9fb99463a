"""Syslog-style streaming ingest.

Re-expresses pgloader's only streaming source
(``src/sources/syslog.lisp:28-95``: a UDP server whose regex
*scanners* route each message into per-scanner queues that COPY into
their own target tables) as Structured Streaming:

- a line stream (socket / file / rate source — anything that yields a
  ``value`` string column),
- one ``Scanner`` per reference scanner: a named regex whose groups
  become typed columns (``regexp_extract`` — JVM-side, codegen'd),
- ``route()``: per-scanner filtered projections of the same stream —
  Spark multiplexes one source across N sinks, each with its own
  checkpoint, matching the reference's queue-per-scanner design,
- ``foreachBatch`` JDBC/parquet sinks give at-least-once delivery,
  the same guarantee the reference's COPY loop provides.

Beyond the reference (it has **no** watermarks/windows,
SURVEY §2.11), ``windowed_counts`` exposes event-time windows + late
data handling since they come free on this substrate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the RFC3164-ish pattern pgloader's syslog sample config uses
RSYSLOG_PATTERN = (
    r"<(\d+)>\s*(\w{3}\s+\d+\s+\d{2}:\d{2}:\d{2})\s+(\S+)\s+([^:\[]+)(?:\[(\d+)\])?:\s*(.*)"
)


@dataclass
class Scanner:
    """One syslog scanner: name, regex, and (column, group-index,
    type) projections (syslog.lisp:28-60)."""

    name: str
    regex: str
    columns: list[tuple[str, int, str]] = field(
        default_factory=lambda: [("message", 0, "string")]
    )

    def apply(self, lines: DataFrame, value_col: str = "value") -> DataFrame:
        """Filter lines matching this scanner and extract its columns.
        The whole thing is one codegen'd map+filter — no Python."""
        v = F.col(value_col)
        matched = lines.filter(v.rlike(self.regex))
        # unmatched optional groups extract as '' -> NULL, then
        # try_cast keeps ANSI mode happy on malformed remnants
        return matched.select(
            *[
                F.nullif(F.regexp_extract(v, self.regex, idx), F.lit(""))
                .try_cast(typ)
                .alias(name)
                for name, idx, typ in self.columns
            ]
        )


def rsyslog_scanner(name: str = "rsyslog") -> Scanner:
    return Scanner(
        name=name,
        regex=RSYSLOG_PATTERN,
        columns=[
            ("priority", 1, "int"),
            ("ts", 2, "string"),
            ("host", 3, "string"),
            ("program", 4, "string"),
            ("pid", 5, "int"),
            ("message", 6, "string"),
        ],
    )


def route(lines: DataFrame, scanners: list[Scanner]) -> dict[str, DataFrame]:
    """One input stream -> one projected stream per scanner (the
    queue-per-scanner fanout, syslog.lisp:61-95). Works identically on
    batch and streaming DataFrames."""
    return {s.name: s.apply(lines) for s in scanners}


def start_scanner_sinks(
    routed: dict[str, DataFrame],
    out_dir: str,
    checkpoint_dir: str,
    format: str = "parquet",
):
    """Start one writeStream per scanner (its own checkpoint =
    independent progress, like the reference's independent queues).
    Returns the StreamingQuery handles."""
    queries = []
    for name, df in routed.items():
        q = (
            df.writeStream.format(format)
            .option("path", f"{out_dir}/{name}")
            .option("checkpointLocation", f"{checkpoint_dir}/{name}")
            .outputMode("append")
            .start()
        )
        queries.append(q)
    return queries


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark for late
    data — the streaming agg surface the reference lacks."""
    g = [F.window(F.col(ts_col), window_duration).alias("window")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*g)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n",
        )
    )
