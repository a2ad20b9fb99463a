"""Redshift sink: stage to S3, then server-side COPY.

Re-expresses ``src/pg-copy/copy-rows-in-batch-through-s3.lisp:9-120``:
the reference writes each batch as an S3 object and issues
``COPY table FROM 's3://...'`` against Redshift. On Spark the staging
write is one distributed job (CSV or parquet to the S3 prefix) and a
single JDBC COPY statement ingests the whole prefix — Redshift
parallelizes ingestion across its slices by file, which is why
``num_files`` should be a multiple of the cluster's slice count.

S3 credentials/connectivity are environment concerns; this module
only *plans* (SQL text + staging layout) plus runs the staging write,
so everything except the live COPY is unit-testable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class RedshiftCopyPlan:
    staging_path: str  # s3://bucket/prefix or file:///... in tests
    table: str
    iam_role: str | None = None
    format: str = "CSV"
    gzip: bool = True

    def copy_sql(self) -> str:
        opts = [self.format]
        if self.gzip and self.format == "CSV":
            opts.append("GZIP")
        cred = f" IAM_ROLE '{self.iam_role}'" if self.iam_role else ""
        return (
            f"COPY {self.table} FROM '{self.staging_path}'"
            f"{cred} {' '.join(opts)}"
        )


def stage_for_redshift(
    df: DataFrame,
    plan: RedshiftCopyPlan,
    num_files: int | None = None,
) -> RedshiftCopyPlan:
    """Write the staging objects. Returns the plan whose ``copy_sql()``
    the caller executes over JDBC once staging completes."""
    out = df
    if num_files:
        out = out.repartition(num_files)
    writer = out.write.mode("overwrite")
    if plan.format == "CSV":
        writer = writer.option("compression", "gzip" if plan.gzip else "none")
        writer.csv(plan.staging_path)
    else:
        writer.parquet(plan.staging_path)
    return plan
