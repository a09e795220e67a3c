from dstream_spark.sources.registry import SOURCES, get_source  # noqa: F401
