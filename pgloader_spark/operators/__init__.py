from pgloader_spark.operators import dedup, projection, similarity, text

__all__ = ["dedup", "projection", "similarity", "text"]
