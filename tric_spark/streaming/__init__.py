from tric_spark.streaming.supersteps import SuperstepDriver

__all__ = ["SuperstepDriver"]
