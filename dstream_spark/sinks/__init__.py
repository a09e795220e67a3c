from dstream_spark.sinks.merge import MergeSink  # noqa: F401
from dstream_spark.sinks.registry import SINKS, get_sink  # noqa: F401
