"""CSV source: options-complete reader + separator/quote guessing.

Re-expresses pgloader's CSV source (``src/sources/csv/csv.lisp:84-128``
— separator / quote / escape / escape-mode / trim / skip-lines /
header / empty-string->nil) as ``spark.read.csv`` options, and the
parameter-guessing pass (``src/sources/csv/csv-guess.lisp:57-80``:
sample lines, try separators × quotes, keep the first combination that
parses consistently) as a driver-side sample over ``spark.read.text``.
"""

from __future__ import annotations

import csv as _csv
import io
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the separators the reference tries, in order (csv-guess.lisp:57)
GUESS_SEPARATORS = ["\t", ",", ";", "|", "%", "^", "!", "$"]
GUESS_QUOTES = ['"', "'"]
GUESS_SAMPLE_LINES = 1000


@dataclass
class CsvOptions:
    """The WITH-option surface of LOAD CSV (command-csv.lisp:56-179)."""

    separator: str = ","
    quote: str = '"'
    escape: str | None = None  # None => doubled quotes (escape-mode quote)
    header: bool = False
    skip_lines: int = 0
    null_as: str = ""
    trim_both: bool = False
    encoding: str = "UTF-8"
    multi_line: bool = False
    fields: list[str] = field(default_factory=list)  # declared field names


def read_csv(spark: SparkSession, path: str, opts: CsvOptions) -> DataFrame:
    """One declarative read; Catalyst prunes/pushes into the scan."""
    reader = (
        spark.read.option("sep", opts.separator)
        .option("quote", opts.quote or "\u0000")
        .option("escape", opts.escape or opts.quote or "\u0000")
        .option("header", opts.header)
        .option("nullValue", opts.null_as)
        .option("encoding", opts.encoding)
        .option("multiLine", opts.multi_line)
        .option("mode", "PERMISSIVE")
        .option("ignoreLeadingWhiteSpace", opts.trim_both)
        .option("ignoreTrailingWhiteSpace", opts.trim_both)
    )
    if opts.skip_lines:
        # Spark has no skipLines; drop the first N physical lines by
        # reading text, slicing, and re-parsing. Only the sliced head
        # is driver-side (N lines); the body stays distributed.
        text = spark.read.text(path)
        body = text.rdd.zipWithIndex().filter(
            lambda t: t[1] >= opts.skip_lines
        ).map(lambda t: t[0][0])
        df = reader.csv(spark.createDataFrame(body, "string").rdd.map(lambda r: r[0]))
    else:
        df = reader.csv(path)
    if opts.fields:
        df = df.toDF(*opts.fields)
    return df


def guess_csv_params(spark: SparkSession, path: str) -> CsvOptions:
    """Sample lines, try separator × quote combos, keep the first that
    yields a consistent column count > 1 (csv-guess.lisp:57-80)."""
    sample_rows = spark.read.text(path).limit(GUESS_SAMPLE_LINES).collect()
    lines = [r[0] for r in sample_rows if r[0]]
    best: CsvOptions | None = None
    for sep in GUESS_SEPARATORS:
        for quote in GUESS_QUOTES:
            counts = set()
            ok = True
            for ln in lines:
                try:
                    parsed = next(
                        _csv.reader(io.StringIO(ln), delimiter=sep, quotechar=quote)
                    )
                except (StopIteration, _csv.Error):
                    ok = False
                    break
                counts.add(len(parsed))
            if ok and len(counts) == 1 and counts.pop() > 1:
                best = CsvOptions(separator=sep, quote=quote)
                break
        if best:
            break
    if best is None:
        best = CsvOptions()  # reference falls back to defaults
    return best


def header_fields(spark: SparkSession, path: str, opts: CsvOptions) -> list[str]:
    """Parse the first line as field names (csv.lisp:60-82)."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        return []
    return next(
        _csv.reader(io.StringIO(first[0][0]), delimiter=opts.separator, quotechar=opts.quote)
    )


def read_inline(spark: SparkSession, data: str, opts: CsvOptions) -> DataFrame:
    """Inline data after the LOAD command (command-csv.lisp:306-346):
    parse driver-side (inline payloads are small by construction)."""
    # strict quoting + manual iteration: a malformed row (unterminated
    # quote at EOF — errors.load's last line) drops with an error
    # instead of silently producing a truncated row, and blank lines
    # vanish — both the reference's CSV semantics
    reader = _csv.reader(
        io.StringIO(data),
        delimiter=opts.separator,
        quotechar=opts.quote,
        strict=True,
    )
    rows = []
    while True:
        try:
            r = next(reader)
        except StopIteration:
            break
        except _csv.Error:
            continue  # malformed row rejected (reference drops + counts)
        if r:
            rows.append(r)
    rows = rows[opts.skip_lines:]
    names = opts.fields
    if opts.header and rows:
        names = names or rows[0]
        rows = rows[1:]
    if not names and rows:
        names = [f"_c{i}" for i in range(len(rows[0]))]
    norm = []
    for r in rows:
        vals = [None if v == opts.null_as else v for v in r]
        # pgloader pads short rows with NULLs and drops extra cells
        # (csv-missing-col.load is the regress test for exactly this)
        vals = (vals + [None] * len(names))[: len(names)]
        norm.append(tuple(vals))
    df = spark.createDataFrame(norm, ", ".join(f"`{n}` string" for n in names))
    if opts.trim_both:
        df = df.select(*[F.trim(F.col(c)).alias(c) for c in df.columns])
    return df
