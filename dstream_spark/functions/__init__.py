from dstream_spark.functions import dedup_text, similarity, text  # noqa: F401
