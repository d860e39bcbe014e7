"""Distinct-count sketching: KMV (k-minimum-values).

The north-star engine needs cardinality sketches whose results are
REPRODUCIBLE across engines (Spark's approx_count_distinct is an HLL++ whose
estimate depends on internal hashing — no cross-engine oracle possible). KMV
with the engine's portable md5-based hash is deterministic: both Spark and
DuckDB compute the exact same k smallest normalized hash values, hence the
same estimate. Estimator: distinct(g) ≈ (k-1) / h_(k) where h_(k) is the
k-th smallest hash scaled to [0,1) (Bar-Yossef et al. 2002; see PAPERS.md).

Scale note: this formulation materializes the distinct hash set per group
before slicing the k minimum (collect_set is unbounded in the partial
aggregate). On a real cluster swap the groupBy for a custom Aggregator
keeping a bounded k-element heap per partition — the estimator and hash stay
identical, so results (and the oracle) do not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60

HASH_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str, *, k: int = 64) -> DataFrame:
    """Per-group KMV distinct estimate + exact count (for small groups the
    sketch IS exact: fewer than k distinct values -> estimate = n)."""
    # md5 needs string/binary input; numeric keys hash via their decimal
    # string form (matches the oracle's CAST(x AS VARCHAR))
    h = portable_hash60(F.col(value_col).cast("string"))
    g = df.select(*group_cols, h.alias("_h")).distinct()
    agg = g.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_mins"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    hk = F.element_at("_mins", k).cast("double") / F.lit(HASH_SPACE)
    est = F.when(F.col("n_exact") >= k, F.round(F.lit(k - 1) / hk, 2)).otherwise(
        F.col("n_exact").cast("double")
    )
    return agg.select(*group_cols, F.col("n_exact"), est.alias("n_estimate"))
