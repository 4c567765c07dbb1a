"""Structured Streaming ≡ batch on the same bounded source: window and
session aggregations drained with availableNow must equal the batch
results (SURVEY §2.B streaming-style row)."""

import pytest

from sparkcrawl import streaming

SF = "/root/testdata/sf0.001"


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("agg,name", [
    (streaming.windowed_counts, "win_counts"),
    (streaming.session_counts, "sess_counts"),
])
def test_stream_equals_batch(spark, tmp_path, agg, name):
    # the file stream source requires a directory; stage the single
    # parquet file into one
    import shutil

    src_dir = tmp_path / "events_dir"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    path = str(src_dir)
    stream = streaming.read_event_stream(spark, path)
    assert stream.isStreaming
    streaming.run_available_now(agg(stream), str(tmp_path / name), name)
    got = _collect_sorted(spark.table(name))
    want = _collect_sorted(agg(spark.read.parquet(f"{SF}/events.parquet")))
    assert got == want
    assert len(got) > 0


def test_stateful_user_totals_equals_batch(spark, tmp_path):
    """applyInPandasWithState across MULTIPLE micro-batches: running
    per-user totals carried in group state; the last emitted row per
    user must equal the batch groupBy."""
    import pandas as pd
    from pyspark.sql import functions as F

    src_dir = tmp_path / "events_multi"
    src_dir.mkdir()
    # split events into 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
    events = spark.read.parquet(f"{SF}/events.parquet")
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1) \
            .write.parquet(str(src_dir / f"chunk{i}"))
    # file source needs a flat dir of files
    import glob
    import shutil
    flat = tmp_path / "flat"
    flat.mkdir()
    for j, f in enumerate(sorted(glob.glob(str(src_dir / "chunk*/part-*.parquet")))):
        shutil.copy(f, flat / f"part-{j}.parquet")

    stream = streaming.read_event_stream(spark, str(flat),
                                         max_files_per_trigger=1)
    streaming.run_available_now(
        streaming.stateful_user_totals(stream),
        str(tmp_path / "ckpt"), "user_totals", output_mode="update")
    out = spark.table("user_totals").toPandas()
    # 'update' emits one row per user per touching batch; last wins
    got = (out.groupby("user_id").last()
           .reset_index().sort_values("user_id"))
    want = (events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2)
                 .alias("total_value"))
            .orderBy("user_id").toPandas())
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["n_events"]) == list(want["n_events"])
    assert [round(x, 2) for x in got["total_value"]] == \
        [round(x, 2) for x in want["total_value"]]


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same events delivered in TWO
    micro-batches (duplicated source files) must come out exactly once —
    the streaming analog of the crawl seen-set."""
    import shutil

    flat = tmp_path / "dups"
    flat.mkdir()
    # identical file twice -> every event arrives in two micro-batches
    shutil.copy(f"{SF}/events.parquet", flat / "part-0.parquet")
    shutil.copy(f"{SF}/events.parquet", flat / "part-1.parquet")

    stream = streaming.read_event_stream(spark, str(flat),
                                         max_files_per_trigger=1)
    streaming.run_available_now(
        streaming.dedup_event_stream(stream),
        str(tmp_path / "ckpt_dedup"), "dedup_events", output_mode="append")
    got = spark.table("dedup_events")
    batch = streaming.dedup_event_stream(
        spark.read.parquet(f"{SF}/events.parquet"))
    assert got.count() == batch.count()
    assert (_collect_sorted(got.select("event_id"))
            == _collect_sorted(batch.select("event_id")))


def test_watermark_drops_late_data_after_finalization(spark, tmp_path):
    """The watermark's late-data guarantee, exercised on a true
    multi-batch stream: once a window has been FINALIZED (watermark
    passed its end and append-mode eviction emitted it), a late event
    for that window is dropped — it neither changes the emitted count
    nor re-opens the window as a duplicate output row.  (The guarantee
    is one-sided: a late-but-pre-eviction row may still merge into
    live state, verified while designing this test — hence the
    three-batch arrangement that forces eviction FIRST.)"""
    import os
    import pandas as pd

    src = tmp_path / "late_src"
    src.mkdir()

    def write_events(name, rows, mtime):
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                         "event_type", "value", "props"])
        df["ts"] = pd.to_datetime(df["ts"])
        path = str(src / name)
        # Spark's TimestampType is microseconds; pandas defaults to ns
        df.to_parquet(path, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        os.utime(path, (mtime, mtime))

    # batch 0: window A (12:00) gets one event; the 20:00 event pushes
    # the watermark to 18:00 (> window A's 13:00 close) at batch end
    write_events("part-0.parquet",
                 [(1, "2024-01-01 12:10:00", 1, "view", 1.0, "{}"),
                  (2, "2024-01-01 20:00:00", 2, "view", 1.0, "{}")],
                 mtime=1_700_000_000)
    # batch 1: neutral event — during this batch window A is evicted
    # and emitted with n=1
    write_events("part-1.parquet",
                 [(3, "2024-01-01 20:30:00", 3, "view", 1.0, "{}")],
                 mtime=1_700_000_100)
    # batch 2: a LATE event for the finalized window A + a fresh one
    write_events("part-2.parquet",
                 [(4, "2024-01-01 12:40:00", 4, "view", 1.0, "{}"),
                  (5, "2024-01-01 20:40:00", 5, "view", 1.0, "{}")],
                 mtime=1_700_000_200)

    stream = streaming.read_event_stream(spark, str(src),
                                         max_files_per_trigger=1)
    streaming.run_available_now(
        streaming.windowed_counts(stream),
        str(tmp_path / "ckpt_late"), "late_counts", output_mode="append")
    rows = [(r["ws"].isoformat(), r["n"])
            for r in spark.table("late_counts").collect()
            if r["ws"].isoformat().startswith("2024-01-01T12")]
    # exactly ONE emission for window A, with the pre-eviction count
    assert rows == [("2024-01-01T12:00:00", 1)], rows


def test_stream_to_lake_atomic_idempotent(spark, tmp_path):
    """foreachBatch → Icebergish: every micro-batch lands as one atomic
    snapshot; total contents equal the batch source; draining the SAME
    checkpoint again appends nothing (idempotence on batch id)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from sparkcrawl.storage import IcebergishTable

    flat = tmp_path / "flat"
    flat.mkdir()
    events = spark.read.parquet(f"{SF}/events.parquet")
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1) \
            .write.parquet(str(tmp_path / f"chunk{i}"))
    for j, f in enumerate(sorted(glob.glob(str(tmp_path / "chunk*/part-*.parquet")))):
        shutil.copy(f, flat / f"part-{j}.parquet")

    tbl = IcebergishTable(str(tmp_path / "lake"), streaming.EVENTS_SCHEMA)
    ckpt = str(tmp_path / "ckpt")
    stream = streaming.read_event_stream(spark, str(flat),
                                         max_files_per_trigger=1)
    streaming.stream_to_lake(stream, tbl, ckpt)

    n_src = events.count()
    assert tbl.read(spark).count() == n_src
    n_snapshots = tbl.current_snapshot_id() + 1
    assert n_snapshots == 3  # one atomic commit per micro-batch

    # same checkpoint, no new files -> no batches -> no new snapshots
    stream2 = streaming.read_event_stream(spark, str(flat),
                                          max_files_per_trigger=1)
    streaming.stream_to_lake(stream2, tbl, ckpt)
    assert tbl.current_snapshot_id() + 1 == n_snapshots
    assert tbl.read(spark).count() == n_src

    # a re-delivered old batch id is ignored: drive the SINK itself with
    # batch 0's data again (the at-least-once replay after a restart) and
    # assert no new snapshot lands
    first_batch = tbl.read_new(spark, 0)
    assert first_batch.count() > 0
    before = tbl.current_snapshot_id()
    sink = streaming.make_lake_sink(tbl, ckpt)
    sink(first_batch, 0)
    assert tbl.current_snapshot_id() == before
    assert tbl.read(spark).count() == n_src
    # ...but a batch id ABOVE the high-water mark does land
    sink(first_batch.limit(1), streaming._lake_hwm_read(ckpt) + 1)
    assert tbl.current_snapshot_id() == before + 1
    assert tbl.read(spark).count() == n_src + 1


def test_stream_to_lake_fresh_checkpoint_nonempty_table(spark, tmp_path):
    """A FRESH checkpoint writing into a table that already has snapshots
    must land its batches (batch ids restart at 0 per checkpoint; the old
    manifest-round comparison silently dropped them)."""
    from pyspark.sql import functions as F

    from sparkcrawl.storage import IcebergishTable

    events = spark.read.parquet(f"{SF}/events.parquet")
    tbl = IcebergishTable(str(tmp_path / "lake"), streaming.EVENTS_SCHEMA)
    # pre-existing history: a round-numbered append (crawl-style writer)
    tbl.append(events.limit(10), 7)
    assert tbl.current_manifest()["round"] == 7

    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil
    shutil.copy(f"{SF}/events.parquet", flat / "part-0.parquet")
    stream = streaming.read_event_stream(spark, str(flat))
    streaming.stream_to_lake(stream, tbl, str(tmp_path / "fresh_ckpt"))
    # batch 0 must NOT be dropped despite manifest round 7
    assert tbl.read(spark).count() == events.count() + 10
