"""Query registry shared by the driver-contract modules
(queries.py = relational §2.B, textops.py = training-data ops,
crawlq.py = crawl-engine queries)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q(name: str, oracle: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import every registering module (idempotent)."""
    from . import crawlq, graphops, queries, sources, textops  # noqa: F401
