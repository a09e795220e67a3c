"""dstream_spark — a PySpark-native structured-streaming / CEP engine.

Reimplements the capabilities of katasec/dstream (reference snapshot at
/root/reference, 2026-04-24) as an idiomatic Spark engine: CDC-style
change capture over transcript tables, (conv_id, turn_idx) LSN-style
ordered/deduplicated delivery, tumbling/sliding/session windows with
event-time watermarks, stateful stream-stream joins, and exactly-once
idempotent MERGE sinks with per-partition lineage — plus the
training-data-pipeline operators (dedup families, similarity search,
text analysis, multimodal plumbing) that make the engine useful at
100 TB scale.

This is NOT a port: the reference is a Go process-orchestration relay
(see SURVEY.md §0); its computational content is a set of reliability
CONTRACTS (ordered delivery, dual-key dedup, publish-then-advance
checkpointing, per-table isolation) which we re-express on Spark's
DataFrame / Structured Streaming execution model.
"""

from dstream_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
