"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings (AQE, adaptive
coalescing, UTC session time, Arrow) are what we would ship on a real
cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "pgloader_spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Shuffle partitions sized to the local core count; on a real
        # cluster AQE coalescing re-sizes them at runtime anyway.
        .config("spark.sql.shuffle.partitions", str(min(int(cpus) * 2, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # testdata ships one parquet file per table; without this a
        # 25 MB file becomes a single scan task. On a real cluster
        # (many files) the default 128 MB is fine — this only lowers
        # the split size so local[32] actually fans out.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in
        # load_tables (floor-truncate to micros, matching DuckDB).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    return builder.getOrCreate()


def read_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = False
) -> DataFrame:
    """Read one testdata table, tolerant of TIMESTAMP(NANOS) parquet.

    Works on any session (the driver's included): sets the legacy
    nanos-as-long conf at runtime, then floor-truncates ns to micros —
    the same truncation DuckDB applies, so oracles agree.

    ``widen=True`` repartitions a single-file table to the session's
    parallelism. The testdata ships ONE parquet file with ONE row
    group per table, so the scan cannot split — downstream stages of a
    compute-heavy query would run on one core. Callers whose per-row
    work dominates (datetime transforms, language ID, embedding math)
    opt in; scan-then-shuffle queries (joins, aggs, windows) must not:
    their own exchange already redistributes, and measured at sf0.1
    the extra round-robin shuffle slows them 1.5-3x. On a real
    dataset (many files / row groups) the condition never fires.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
            )
    if widen:
        try:
            single_file = os.path.isfile(path) and os.path.getsize(path) > (64 << 10)
        except OSError:
            single_file = False
        if single_file:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table under ``sf_dir`` and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = read_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
