"""pgloader_spark — a PySpark-native data-loading / ETL engine.

A from-scratch re-expression of the capabilities of dimitri/pgloader
(reference surveyed in SURVEY.md) on top of the Spark DataFrame/SQL
engine, extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
column plumbing).

Design: everything is declared as DataFrame/Column expressions so
Catalyst can push filters, prune columns and pick join strategies;
Python UDFs appear only for byte-twiddling transforms that have no
built-in equivalent.
"""

__version__ = "0.1.0"
