from pgloader_spark.parsers.dateformat import pg_to_spark_datetime_format

__all__ = ["pg_to_spark_datetime_format"]
