"""Streaming observability: a `StreamingQueryListener` that captures
per-micro-batch progress (rows, processing time, state size, watermark)
into a driver-side buffer and exposes it as a DataFrame — the metrics
table an on-call engineer graphs before trusting a stateful pipeline.

Spark already EMITS all of this in every `StreamingQueryProgress` event;
what pipelines usually lack is the 20 lines that persist it somewhere
queryable.  `MetricsRecorder` is those lines: attach, run your queries,
then `recorder.progress_df(spark)` (or `.rows`) gives one row per
micro-batch with the fields capacity planning needs — input rate,
batch duration, state rows/bytes (for `applyInPandasWithState` /
windowed aggs), and the event-time watermark for late-data lag.

At 100 TB scale the same listener writes each event to an append-only
parquet/Kafka sink instead of a list; the shape is identical (the
listener runs on the DRIVER and receives one small JSON per batch —
cost is independent of data volume).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

#: schema of the captured per-batch metrics relation
PROGRESS_SCHEMA = (
    "query_name string, batch_id long, num_input_rows long, "
    "batch_duration_ms long, state_rows long, state_bytes long, "
    "watermark string, timestamp string"
)


class MetricsRecorder(StreamingQueryListener):
    """Collects every `onQueryProgress` event into ``self.rows``."""

    def __init__(self) -> None:
        self.rows: list[tuple] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state_rows = sum(
            op.get("numRowsTotal", 0) for op in p.get("stateOperators", [])
        )
        state_bytes = sum(
            op.get("memoryUsedBytes", 0) for op in p.get("stateOperators", [])
        )
        duration = p.get("durationMs", {}).get("triggerExecution", 0)
        self.rows.append(
            (
                p.get("name") or p.get("id", ""),
                int(p.get("batchId", -1)),
                int(p.get("numInputRows", 0)),
                int(duration),
                int(state_rows),
                int(state_bytes),
                str(p.get("eventTime", {}).get("watermark", "")),
                str(p.get("timestamp", "")),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def progress_df(self, spark: SparkSession) -> DataFrame:
        """The captured metrics as a DataFrame (one row per micro-batch)."""
        return spark.createDataFrame(self.rows, PROGRESS_SCHEMA)


def record_metrics(spark: SparkSession) -> MetricsRecorder:
    """Attach a fresh `MetricsRecorder` to the session and return it.
    Caller detaches with ``spark.streams.removeListener(rec)``."""
    rec = MetricsRecorder()
    spark.streams.addListener(rec)
    return rec
