"""Structured-Streaming surface (SURVEY §1.3 streaming row, §2.B
streaming-style ops).

Crawl rounds themselves are deterministic synchronous micro-batches run by
the driver loop in rounds.py (the foreachBatch-equivalent — required for
ordering parity, BASELINE.json:14).  This module provides the true
``readStream`` path for the event-analytics side: tumbling/sliding window
aggregations with watermarked late-data handling, runnable with an
availableNow trigger over a parquet directory so results are comparable
to the batch equivalents (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over an events parquet directory."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with a watermark bounding late-data state —
    works identically on a stream or a batch DataFrame."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(F.col("w.start").alias("ws"), "n", "v")
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    escape hatch for semantics window/session aggs can't express):
    per-user running totals carried in explicit group state across
    micro-batches — the shape a crawl-rate monitor / per-host budget
    tracker takes on a true stream.  Emits the updated running total
    for each user seen in the batch ('update' semantics: the LAST row
    per user is the final answer, asserted ≡ batch groupBy in tests."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])

    def fn(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].fillna(0.0).sum())
        state.update((n, v))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(v, 2)]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session-window counts per user (stateful session merge on stream)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      query_name: str = "sparkcrawl_stream",
                      output_mode: str = "complete"):
    """Drain the whole source as micro-batches into an in-memory sink and
    block until done; returns the StreamingQuery (results via
    ``spark.table(query_name)``)."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def _lake_hwm_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "_sparkcrawl_lake_hwm.json")


def _lake_hwm_read(checkpoint_dir: str) -> int:
    try:
        with open(_lake_hwm_path(checkpoint_dir)) as f:
            return int(json.load(f)["batch_id"])
    except (FileNotFoundError, ValueError, KeyError):
        return -1


def _lake_hwm_write(checkpoint_dir: str, batch_id: int) -> None:
    fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".hwm.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"batch_id": int(batch_id)}, f)
    os.replace(tmp, _lake_hwm_path(checkpoint_dir))


def make_lake_sink(table, checkpoint_dir: str):
    """The foreachBatch callable for stream_to_lake, split out so the
    at-least-once redelivery branch is directly exercisable in tests.

    Idempotence is keyed on the stream's OWN high-water mark — a marker
    file beside the checkpoint, committed atomically after each append —
    NOT on the table's global manifest round.  Batch ids are monotonic
    only per checkpoint: comparing against the table round would
    silently drop early batches whenever a fresh checkpoint writes into
    a table that already holds snapshots (or one shared with
    round-numbered crawl appends).  The marker lives and dies with the
    checkpoint, so its lifecycle matches the batch-id domain exactly."""
    os.makedirs(checkpoint_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= _lake_hwm_read(checkpoint_dir):
            return  # redelivered batch (restart replay): already landed
        table.append(batch_df, int(batch_id))
        _lake_hwm_write(checkpoint_dir, int(batch_id))

    return sink


def stream_to_lake(events: DataFrame, table, checkpoint_dir: str,
                   query_name: str = "sparkcrawl_stream_lake"):
    """foreachBatch sink: land a stream in the Icebergish lake table
    with one ATOMIC append commit per micro-batch, idempotent on the
    batch id via the checkpoint-scoped high-water marker (see
    make_lake_sink) — a batch re-delivered after restart is skipped,
    giving exactly-once table contents over the at-least-once
    foreachBatch contract, while a FRESH checkpoint against a non-empty
    table starts cleanly at batch 0 instead of silently dropping early
    batches.  This is the streaming-ingest twin of the crawl round's
    frontier append: same manifest commit protocol, same snapshot
    lineage/time travel over the landed batches.  At scale the table's
    partition column keeps per-batch files clustered (storage.py
    repartitions before partitionBy — no tiny-file storm)."""
    query = (events.writeStream.foreachBatch(make_lake_sink(table, checkpoint_dir))
             .queryName(query_name)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return query


def dedup_event_stream(events: DataFrame,
                       watermark: str = "24 hours") -> DataFrame:
    """Streaming exact dedup on event_id — the URL-seen-set analog on a
    true stream.  ``dropDuplicatesWithinWatermark`` keeps dedup state
    only for ids newer than the watermark, so state size is bounded by
    rate × watermark instead of growing with the full history (the
    batch crawl engine gets the same bound from its per-bucket filter
    blobs + exact anti-join).  On a batch frame it degrades to plain
    dropDuplicates so stream ≡ batch is assertable."""
    if events.isStreaming:
        return (events.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(["event_id"]))
    return events.dropDuplicates(["event_id"])
