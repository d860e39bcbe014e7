"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries`` exposes every implemented
operator from SURVEY.md §2 (+ north-star LLM-pipeline operators);
``oracle_sql`` gives the DuckDB-equivalent SQL for each. Implementations live
in ``go_iceberg_spark.workload`` (one QuerySpec per name, Spark fn + oracle
SQL generated from shared constants).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_iceberg_spark.workload import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the training-data curation
    pipeline end-to-end — exact dedup over a corpus with planted duplicates,
    CCNet-style quality gate, deterministic 90/5/5 split, per-split token
    audit — composed entirely from the engine's operators."""
    return QUERIES["pipeline_curation_end_to_end"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2 + north-star)."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
