"""Time-series regularization over event streams.

The reference has no time-series surface; these are the resampling
primitives an events table needs before windowed training or dashboarding:
bucket to a fixed grid, fill gaps explicitly, and carry the last observation
forward. Everything is built-in expressions — the spine generation is one
``sequence`` per key (never a driver loop), the join is keyed on (key,
bucket), and LOCF is a bounded running window per key.

Scale notes (100 TB): the spine is |keys| x |buckets| rows generated
executor-side from a 1-row min/max aggregate; the raw stream shuffles once
to bucket counts. LOCF's window runs per key ordered by bucket — partitions
are single-key time series, which are short by construction after
bucketing. A key whose series would not fit one task should be range-split
by time first (the same repartitionByRange lever the sorted writer uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    *,
    bucket: str = "hour",
) -> DataFrame:
    """Resample to a fixed ``bucket`` grid per key: every (key, bucket) cell
    in [min, max] of the stream exists in the output, with the event count
    (0 on gaps), the in-bucket mean value (NULL on gaps), and the mean
    carried forward across gaps (LOCF). Output: (key, bucket_ts, n, avg_v,
    locf_v)."""
    b = F.date_trunc(bucket, F.col(ts_col))
    agg = (
        df.groupBy(F.col(key_col).alias("_k"), b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg(value_col), 4).alias("avg_v"))
    )
    bounds = df.agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("_lo"),
        F.date_trunc(bucket, F.max(ts_col)).alias("_hi"),
    )
    spine = (
        df.select(F.col(key_col).alias("_k")).distinct()
        .join(F.broadcast(bounds))
        .select("_k", F.explode(F.expr(f"sequence(_lo, _hi, interval 1 {bucket})")).alias("_b"))
    )
    w = Window.partitionBy("_k").orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    # null-SAFE key equality: a NULL key is a legal group (groupBy keeps it),
    # but a null-unsafe spine join would never match it — its cells all came
    # back n=0 with the events silently zeroed (r7 degenerate sweep find).
    # _b needs no null-safety (spine buckets come from sequence(), never NULL;
    # NULL-ts events have no grid cell and stay out by design).
    return (
        spine.join(agg, [spine["_k"].eqNullSafe(agg["_k"]), spine["_b"] == agg["_b"]], "left")
        .drop(agg["_k"]).drop(agg["_b"])
        .select(
            F.col("_k").alias(key_col),
            F.col("_b").alias("bucket_ts"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.col("avg_v"),
            F.last("avg_v", ignorenulls=True).over(w).alias("locf_v"),
        )
    )
