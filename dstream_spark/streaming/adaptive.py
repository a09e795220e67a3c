"""S4 dynamic batch sizing.

The reference resamples the observed average row size hourly and
resizes its CDC poll batches to a byte budget
(docs/capability-inventory.md:136). The Spark analog: a file-source
micro-batch is ``maxFilesPerTrigger`` files, fixed at query start — so
the engine runs the stream in SEGMENTS, and between segments a
controller recomputes files-per-trigger from the segment's observed
progress (rows per batch at the current setting → rows per file →
files needed for the target batch size). Exactly-once across the
restart is free: the checkpoint carries the offsets and the MergeSink
is idempotent (Pipeline.run_adaptive).

Row-based targeting (not wall-clock) keeps the controller
deterministic; durations vary run-to-run, row counts don't.
"""

from __future__ import annotations


def _progress_field(p, name: str):
    """StreamingQueryProgress attr or plain-dict key (PySpark version
    differences)."""
    if isinstance(p, dict):
        return p.get(name)
    return getattr(p, name, None)


class BatchSizeController:
    """Recommend maxFilesPerTrigger targeting ``target_rows`` input
    rows per micro-batch, clamped to [min_files, max_files]."""

    def __init__(
        self,
        target_rows: int = 500_000,
        min_files: int = 1,
        max_files: int = 256,
    ):
        self.target_rows = target_rows
        self.min_files = min_files
        self.max_files = max_files

    def recommend(self, progresses, current_files: int) -> int:
        """New files-per-trigger from a segment's batch progress list.
        Batches with zero input (idle ticks) are ignored; with no
        signal the current setting stands."""
        rows = [
            int(_progress_field(p, "numInputRows") or 0)
            for p in progresses
        ]
        rows = [r for r in rows if r > 0]
        if not rows or current_files <= 0:
            return current_files
        rows_per_file = (sum(rows) / len(rows)) / current_files
        if rows_per_file <= 0:
            return current_files
        want = round(self.target_rows / rows_per_file)
        return max(self.min_files, min(self.max_files, int(want) or 1))
