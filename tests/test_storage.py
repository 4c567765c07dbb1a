"""Icebergish shim: atomic append/replace, snapshot time travel, rollback."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.storage import IcebergishTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("host_bucket", T.IntegerType()),
])


@pytest.fixture
def table(tmp_path):
    return IcebergishTable(str(tmp_path / "t"), SCHEMA, partition_by="host_bucket")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("host_bucket"))


def test_empty_read(spark, table):
    df = table.read(spark)
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_append_accumulates(spark, table):
    table.append(_df(spark, 0, 10), round_no=1)
    table.append(_df(spark, 10, 30), round_no=2)
    assert table.read(spark).count() == 30
    assert table.current_snapshot_id() == 1


def test_replace_supersedes(spark, table):
    table.append(_df(spark, 0, 10), 1)
    table.replace(_df(spark, 0, 5), 2)
    assert table.read(spark).count() == 5


def test_time_travel(spark, table):
    s0 = table.append(_df(spark, 0, 10), 1)
    s1 = table.append(_df(spark, 10, 30), 2)
    assert table.read(spark, snapshot_id=s0).count() == 10
    assert table.read(spark, snapshot_id=s1).count() == 30


def test_rollback_via_manifest(spark, table):
    s0 = table.append(_df(spark, 0, 10), 1)
    table.append(_df(spark, 10, 30), 2)
    table._commit(table.manifest_for(s0))  # rollback
    assert table.read(spark).count() == 10
    # appending after rollback does not resurrect rolled-back data
    table.append(_df(spark, 100, 105), 3)
    ks = {r["k"] for r in table.read(spark).collect()}
    assert ks == set(range(10)) | set(range(100, 105))


def test_partition_layout_on_disk(spark, table):
    table.append(_df(spark, 0, 20), 1)
    snap = os.path.join(table.path, "data", "snap-000000")
    assert any(d.startswith("host_bucket=") for d in os.listdir(snap))


def test_partition_pruning_in_plan(spark, table):
    table.append(_df(spark, 0, 100), 1)
    plan = table.read(spark).filter(F.col("host_bucket") == 2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "host_bucket" in plan


def test_compact_preserves_content(spark, table):
    table.append(_df(spark, 0, 10), 1)
    table.append(_df(spark, 10, 30), 2)
    before = sorted(r["k"] for r in table.read(spark).collect())
    sid = table.compact(spark, round_no=3)
    manifest = table.current_manifest()
    assert manifest["snapshot_id"] == sid
    assert len(manifest["data_dirs"]) == 1
    assert sorted(r["k"] for r in table.read(spark).collect()) == before


def test_gc_unreachable(spark, table):
    import os
    table.append(_df(spark, 0, 10), 1)
    table.append(_df(spark, 10, 30), 2)
    sid = table.compact(spark, 3)
    removed = table.gc_unreachable(sid)
    assert removed == 2
    data_root = os.path.join(table.path, "data")
    assert len(os.listdir(data_root)) == 1
    assert table.read(spark).count() == 30


def test_read_expired_snapshot_raises(spark, table):
    """A manifest referencing GC'd data dirs must fail loudly, not read
    back as silently-missing rows (corruption masking)."""
    table.append(_df(spark, 0, 10), 1)
    old_sid = table.current_snapshot_id()
    sid = table.compact(spark, 2)
    table.gc_unreachable(sid)
    with pytest.raises(FileNotFoundError, match="missing data dirs"):
        table.read(spark, snapshot_id=old_sid)


def test_overwrite_partitions_merges(spark, table):
    """Dynamic partition overwrite: the new snapshot's rows win for the
    named partition values; other partitions keep the old rows; the
    commit writes ONLY the named partitions' dirs."""
    table.append(_df(spark, 0, 40), 1)  # buckets 0..3, 10 rows each
    repl = (spark.range(1000, 1006)
            .select(F.col("id").alias("k"),
                    (F.col("id") % 2).cast("int").alias("host_bucket")))
    sid = table.overwrite_partitions(repl, [0, 1], 2)
    got = table.read(spark)
    assert got.filter(F.col("host_bucket").isin([0, 1])).count() == 6
    assert sorted(r["k"] for r in
                  got.filter(F.col("host_bucket").isin([0, 1])).collect()) \
        == list(range(1000, 1006))
    # untouched partitions: original rows intact
    assert got.filter(F.col("host_bucket").isin([2, 3])).count() == 20
    # the overwrite snapshot's dir holds only the named partitions
    snap = os.path.join(table.path, "data", f"snap-{sid:06d}")
    bdirs = {d for d in os.listdir(snap) if d.startswith("host_bucket=")}
    assert bdirs == {"host_bucket=0", "host_bucket=1"}


def test_overwrite_partitions_time_travel_and_chain(spark, table):
    """Masking is per-snapshot: time travel before the overwrite sees the
    old rows; chained overwrites stack (later wins)."""
    s0 = table.append(_df(spark, 0, 40), 1)
    one = spark.createDataFrame([(500, 2)], SCHEMA)
    table.overwrite_partitions(one, [2], 2)
    two = spark.createDataFrame([(600, 2), (601, 3)], SCHEMA)
    s2 = table.overwrite_partitions(two, [2, 3], 3)
    assert table.read(spark, snapshot_id=s0).count() == 40
    got = {r["k"] for r in table.read(spark)
           .filter(F.col("host_bucket").isin([2, 3])).collect()}
    assert got == {600, 601}
    assert table.read(spark).count() == 22  # 20 in buckets 0/1 + 2 new
    # compact folds the masking into one dir and preserves content
    before = sorted(r["k"] for r in table.read(spark).collect())
    table.compact(spark, 4)
    assert sorted(r["k"] for r in table.read(spark).collect()) == before
    assert s2 >= 0


def test_overwrite_partitions_rejects_stray_rows(spark, table):
    table.append(_df(spark, 0, 8), 1)
    stray = spark.createDataFrame([(900, 0), (901, 3)], SCHEMA)
    with pytest.raises(ValueError, match="outside the declared"):
        table.overwrite_partitions(stray, [0], 2)
    # a failed guard must not leak an uncommitted snapshot dir
    assert table.current_snapshot_id() == 0
    assert table.read(spark).count() == 8


def test_overwrite_partitions_rejects_null_partition(spark, table):
    """NULL partition values bypass isin() masking (isin is NULL for
    them), so they must be stray: admitted they'd land in the Hive
    default partition and later overwrites could never kill them."""
    table.append(_df(spark, 0, 8), 1)
    nullrow = spark.createDataFrame([(900, 0), (901, None)], SCHEMA)
    with pytest.raises(ValueError, match="outside the declared"):
        table.overwrite_partitions(nullrow, [0], 2)


def test_append_after_overwrite_keeps_masked_rows_dead(spark, table):
    """append() must carry the parent's overwrites map forward: rows of
    an overwritten partition that live in OLDER dirs stay masked after a
    subsequent plain append (the primitives compose — crawl appends over
    upserted tables)."""
    table.append(_df(spark, 0, 40), 1)          # buckets 0..3, 10 each
    repl = spark.createDataFrame([(500, 2)], SCHEMA)
    table.overwrite_partitions(repl, [2], 2)    # bucket 2 := {500}
    table.append(spark.createDataFrame([(600, 0)], SCHEMA), 3)
    got = sorted(r["k"] for r in table.read(spark)
                 .filter(F.col("host_bucket") == 2).collect())
    assert got == [500], f"masked bucket-2 rows resurfaced: {got}"
    assert table.read(spark).count() == 32      # 30 in 0/1/3 + 500 + 600


def test_chained_merge_upserts_then_compact(spark, table):
    """Three successive keyed merge batches through
    merge_upsert_partitions (updates + inserts, overlapping partitions)
    must leave exactly the last-writer-wins contents; compact then
    folds the accumulated history into one dir with contents intact."""
    from sparkcrawl.textops import merge_upsert_partitions

    def batch(rows):
        return spark.createDataFrame(
            [(k, b) for k, b in rows],
            "vec_id long, cell int").withColumnRenamed("vec_id", "k") \
            .selectExpr("k", "cell AS host_bucket")

    table.replace(_df(spark, 0, 12), 0)  # keys 0-11, buckets k%4
    state = {k: k % 4 for k in range(12)}
    batches = [
        [(1, 2), (100, 0)],            # move key 1, insert 100
        [(100, 3), (2, 2), (101, 1)],  # re-move 100, move 2, insert 101
        [(1, 0)],                      # move 1 again
    ]
    for rows in batches:
        merge_upsert_partitions(spark, table, batch(rows),
                                key="k", part="host_bucket")
        state.update(dict(rows))
    got = {r["k"]: r["host_bucket"] for r in table.read(spark).collect()}
    assert got == state
    # one replace + three overwrite commits accumulated 4 data dirs
    assert len(table.current_manifest()["data_dirs"]) == 4
    table.compact(spark, 9)
    assert len(table.current_manifest()["data_dirs"]) == 1
    got2 = {r["k"]: r["host_bucket"] for r in table.read(spark).collect()}
    assert got2 == state


def test_read_new_is_incremental(spark, table):
    """read_new(sid) scans only the files snapshot sid added — the
    round loop's read-back must not grow with table history."""
    s1 = table.append(_df(spark, 0, 10), 1)
    s2 = table.append(_df(spark, 10, 25), 2)
    assert table.read_new(spark, s1).count() == 10
    assert table.read_new(spark, s2).count() == 15
    assert sorted(r["k"] for r in table.read_new(spark, s2).collect()) == \
        list(range(10, 25))
    assert table.read(spark).count() == 25
