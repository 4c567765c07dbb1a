"""Pure-Python XXH64 ≡ Spark builtin xxhash64 (the load-bearing identity
for model-crawler parity, SURVEY §2.A A3)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkcrawl.hashing import spark_xxhash64_str, to_signed64, xxh64


def test_known_vectors_against_spark(spark):
    samples = ["", "a", "abc", "http://example.com/", "x" * 7, "y" * 8,
               "z" * 31, "w" * 32, "unicode-日本語-ümlaut-é",
               "http://host0.example/p/123?a=1&b=2", "q" * 100, "r" * 1000]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]) \
        .select("s", F.xxhash64("s").alias("h"))
    for row in df.collect():
        assert spark_xxhash64_str(row["s"]) == row["h"], repr(row["s"])


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=200))
def test_deterministic_and_signed(s):
    h1, h2 = spark_xxhash64_str(s), spark_xxhash64_str(s)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_seed_changes_hash():
    assert xxh64(b"abc", 42) != xxh64(b"abc", 0)


def test_to_signed64():
    assert to_signed64((1 << 64) - 1) == -1
    assert to_signed64(5) == 5
    assert to_signed64(1 << 63) == -(1 << 63)
