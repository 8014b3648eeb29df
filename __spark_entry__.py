"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship path: the actual CDC engine end-to-end
(WAL generate -> streaming-shaped replay -> LWW MERGE -> snapshot scan) on
sf0.001, projected scalar-comparable and checked against the independently
computed sequential pandas oracle. ``queries()`` exposes one entry per
implemented operator family from SURVEY.md §2 (+§2.11) plus the
training-data operators (dedup / similarity / text analysis /
multimodal); ``oracle_sql()`` carries the DuckDB-equivalent SQL for every
entry except ``multimodal_features_stub`` (its decoder is an
honestly-declared stub — nothing exists for DuckDB to recompute).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_engine.contract import ORACLE_SQL, QUERIES, q_cdc_replay_mini  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay (engine, not a query) on sf0.001."""
    return q_cdc_replay_mini(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
