"""Strict local emulation of the driver's DuckDB-oracle comparison:
row count + sorted-by-name columns + order-insensitive value equality.
Stricter than the driver (bit-exact after normalization) so that passing
here implies passing the driver gate."""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{name}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, (np.floating, float)):
        # Driver-faithful: a float renders with a trailing ".0" even when
        # integral, so a DuckDB HUGEINT column (rendered float64 by its
        # pandas bridge) MISMATCHES a Spark BIGINT — exactly like the
        # driver's hash (the r3 red rows slipped through when %.12g
        # collapsed 59837.0 and 59837).
        s = f"{float(v):.12g}"
        if s.lstrip("-").isdigit():
            s += ".0"
        return s
    if isinstance(v, (np.integer, int, np.bool_, bool)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date,
                      np.datetime64)):
        ts = pd.Timestamp(v)
        return "∅" if pd.isna(ts) else ts.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def normalize(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    ngot, nwant = normalize(got), normalize(want)
    bad = [(g, w) for g, w in zip(ngot, nwant) if g != w]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first 3: {bad[:3]}"
