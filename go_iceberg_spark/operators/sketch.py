"""Distinct-count sketching: KMV (k-minimum-values).

The north-star engine needs cardinality sketches whose results are
REPRODUCIBLE across engines (Spark's approx_count_distinct is an HLL++ whose
estimate depends on internal hashing — no cross-engine oracle possible). KMV
with the engine's portable md5-based hash is deterministic: both Spark and
DuckDB compute the exact same k smallest normalized hash values, hence the
same estimate. Estimator: distinct(g) ≈ (k-1) / h_(k) where h_(k) is the
k-th smallest hash scaled to [0,1) (Bar-Yossef et al. 2002; see PAPERS.md).

Scale note: no aggregation buffer ever exceeds k entries. The grouped path
ranks each group's distinct hashes with a sort-based window (row_number,
streaming + spillable) and collect_list's only the k survivors; the global
(one-sketch) path is ``orderBy(h).limit(k)`` which Spark plans as
TakeOrderedAndProject — a k-element heap per partition, merged once. The
estimator and hash are unchanged, so results (and the oracle) are identical
to the naive collect_set formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash60

HASH_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str, *, k: int = 64) -> DataFrame:
    """Per-group KMV distinct estimate + exact count (for small groups the
    sketch IS exact: fewer than k distinct values -> estimate = n)."""
    # md5 needs string/binary input; numeric keys hash via their decimal
    # string form (matches the oracle's CAST(x AS VARCHAR)). NULL values
    # are NOT distinct values (COUNT DISTINCT semantics) — and their NULL
    # hash used to inflate n_exact past the sketch's size while
    # collect_list dropped it, so a group with exactly k distincts plus a
    # NULL crashed ANSI element_at(_mins, k) (r7 degenerate sweep).
    h = portable_hash60(F.col(value_col).cast("string"))
    g = (df.filter(F.col(value_col).isNotNull())
         .select(*group_cols, h.alias("_h")).distinct())
    # Bounded two-level shape: rank within group (sort-based window, spills),
    # keep k, THEN collect — the collect_list buffer is ≤ k elements. The
    # exact count reuses g's exchange (same grouping key).
    w = Window.partitionBy(*group_cols).orderBy("_h")
    mins = (
        g.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("_mins"))
    )
    counts = g.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_exact"))
    agg = mins.join(counts, list(group_cols))
    hk = F.element_at("_mins", k).cast("double") / F.lit(HASH_SPACE)
    est = F.when(F.col("n_exact") >= k, F.round(F.lit(k - 1) / hk, 2)).otherwise(
        F.col("n_exact").cast("double")
    )
    return agg.select(*group_cols, F.col("n_exact"), est.alias("n_estimate"))


def kmv_set_ops(a: DataFrame, b: DataFrame, value_col: str, *, k: int = 64) -> DataFrame:
    """Theta-sketch-style set operations from two KMV sketches (audience
    overlap without materializing either set): estimate |A|, |B|, |A∪B|,
    Jaccard, and |A∩B| from the k minimum hash values of each side.

    The union sketch is the k smallest of the two sketches' union (identical
    to the k-min of the full union — a standard KMV property); Jaccard is
    the fraction of the union sketch present in BOTH input sketches
    (Broder's minwise estimate); |A∩B| = J · |A∪B|. Deterministic portable
    hash, so the DuckDB oracle reproduces every estimate bit-for-bit.

    Scale shape: each side reduces to ONE k-element sketch row; the k-min
    selection is ``orderBy.limit(k)`` (TakeOrderedAndProject — a bounded
    k-element heap per partition, no buffer ever holds more than k hashes);
    the set algebra is array expressions over the two single rows — nothing
    corpus-sized ever joins or aggregates."""
    def sketch(df: DataFrame, name: str) -> DataFrame:
        # NULLs are not set members (kmv_distinct's r7 NULL rule)
        h = portable_hash60(F.col(value_col).cast("string"))
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(h.alias("_h")).distinct()
            .orderBy("_h").limit(k)
            .agg(F.array_sort(F.collect_list("_h")).alias(name))
        )

    def est(mins, n) -> F.Column:
        hk = F.element_at(mins, k).cast("double") / F.lit(HASH_SPACE)
        return F.when(n >= k, F.round(F.lit(k - 1) / hk, 2)).otherwise(n.cast("double"))

    both = sketch(a, "_ma").crossJoin(sketch(b, "_mb"))
    mu = F.slice(F.array_sort(F.array_distinct(F.concat(F.col("_ma"), F.col("_mb")))), 1, k)
    out = both.select(
        F.col("_ma"), F.col("_mb"), mu.alias("_mu"),
        F.size("_ma").alias("_na"), F.size("_mb").alias("_nb"), F.size(mu).alias("_nu"),
    )
    inter = F.size(F.filter(
        F.col("_mu"),
        lambda h: F.array_contains(F.col("_ma"), h) & F.array_contains(F.col("_mb"), h),
    ))
    est_u = est(F.col("_mu"), F.col("_nu"))
    # two empty audiences: union sketch is empty — Jaccard is defined as
    # 0.0 rather than crashing ANSI division (r7 degenerate sweep)
    jacc = F.when(F.col("_nu") > 0,
                  inter.cast("double") / F.col("_nu")).otherwise(F.lit(0.0))
    return out.select(
        est(F.col("_ma"), F.col("_na")).alias("est_a"),
        est(F.col("_mb"), F.col("_nb")).alias("est_b"),
        est_u.alias("est_union"),
        F.round(jacc, 6).alias("jaccard"),
        F.round(jacc * est_u, 2).alias("est_intersection"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 256,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates from a fixed-width MERGEABLE histogram — the
    distribution sketch a quality-score gate needs at corpus scale.
    Spark's approx_percentile (GK sketch) has engine-internal tie-breaks
    with no cross-engine oracle; a fixed [lo, hi) equal-width histogram is
    deterministic: both engines bin identically, so the interpolated
    quantiles match bit-for-bit. Values outside [lo, hi) clamp to the edge
    bins; NULLs are not population members. Estimator: within the first
    bin whose cumulative count reaches q*total, interpolate linearly —
    standard histogram_numeric semantics.

    Scale shape: ONE map-side-combined aggregation to <= ``bins`` rows
    (counts add across partitions/shards — the sketch is mergeable by
    construction), then all quantile arithmetic runs on the tiny bin
    table. Nothing else touches the corpus. Output: (q, est).

    Degenerate guards (r8 sweep): hi <= lo silently produced negative-
    width-bin garbage (hi == lo was an ANSI DIVIDE_BY_ZERO job kill),
    bins < 1 a raw ZeroDivisionError — all rejected driver-side."""
    from ..errors import ValidationError

    if not hi > lo:
        raise ValidationError(f"histogram range empty: lo={lo} hi={hi}")
    if bins < 1:
        raise ValidationError(f"bins must be >= 1, got {bins}")
    if any(not 0.0 <= q <= 1.0 for q in quantiles):
        raise ValidationError(f"quantiles must be in [0, 1]: {quantiles}")
    w = (hi - lo) / bins
    b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(w))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(b.cast("long").alias("bin"))
              .agg(F.count(F.lit(1)).alias("c")))
    w_cum = (Window.orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, 0))
    cum = (counts.withColumn("cum", F.sum("c").over(w_cum))
           .withColumn("cum_prev", F.col("cum") - F.col("c"))
           .withColumn("total", F.sum("c").over(
               Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing))))
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    hits = (cum.select("*", qs)
            .withColumn("target", F.col("q") * F.col("total"))
            .filter(F.col("cum") >= F.col("target")))
    first = (hits.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("q").orderBy("bin")))
        .filter(F.col("rn") == 1))
    est = (F.lit(lo) + F.col("bin") * F.lit(w)
           + F.lit(w) * (F.col("target") - F.col("cum_prev")) / F.col("c"))
    return first.select(F.col("q"), est.alias("est")).orderBy("q")
