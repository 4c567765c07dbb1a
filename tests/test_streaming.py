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
