"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``montecarlopagerank_spark.contract``;
self-check locally with ``python tools/check_oracles.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: converged power-iteration
    PageRank over the transcript-derived edge graph, top-20 central
    vertices (SURVEY.md §7.1 step 4)."""
    from montecarlopagerank_spark.contract import q_pagerank_power_top20

    return q_pagerank_power_top20(spark, "/root/testdata/sf0.001", steps=35)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline ops)."""
    from montecarlopagerank_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; iterative/stochastic
    /LSH ops are intentionally absent → rows-only checks."""
    from montecarlopagerank_spark.contract import ORACLE_SQL

    return dict(ORACLE_SQL)
