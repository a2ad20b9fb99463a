"""Sinks: validation-first reject split, COPY/JDBC/parquet writers."""
