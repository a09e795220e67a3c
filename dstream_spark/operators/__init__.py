from dstream_spark.operators import cdc, dedup, joins, skew, windows  # noqa: F401
