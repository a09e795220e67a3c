from dstream_spark.fixtures.transcripts import (  # noqa: F401
    TRANSCRIPTS_CTE,
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    transcripts_from_events,
)
