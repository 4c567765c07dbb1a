"""sparkcrawl — a PySpark-native web-crawl engine (frontier + fetch scheduler
+ HTML→text extraction) built from scratch per the behavioral spec in
BASELINE.json / SURVEY.md.

The reference snapshot (rebkwok/alcazar at /root/reference) was empty at
build time (SURVEY.md §0); all semantics here are frozen by this repo's own
spec + golden tests, designed so re-targeting to the reference's exact
husker/cleaner output is a localized change in ``extract.py``.

Pure PySpark: DataFrame API + vectorized pandas/Arrow UDFs only — no RDD
API surface, no per-row Python UDFs, ``spark-submit --py-files`` shippable.
"""

__version__ = "0.1.0"
