from pgloader_spark.functions import transforms
from pgloader_spark.functions.transforms import TRANSFORMS, get_transform

__all__ = ["transforms", "TRANSFORMS", "get_transform"]
