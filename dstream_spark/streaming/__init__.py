from dstream_spark.streaming.pipeline import Pipeline  # noqa: F401
