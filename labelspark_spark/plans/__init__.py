from labelspark_spark.plans import explain

__all__ = ["explain"]
