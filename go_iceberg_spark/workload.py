"""The declared query corpus: every entry pairs a Spark implementation with a
byte-equivalent DuckDB oracle SQL string (None only for ops SQL cannot
express). This is the correctness gate for SURVEY.md §2's inventory plus the
north-star LLM-pipeline operators.

Determinism rules used throughout (so order-insensitive value-hashes match):
- monetary aggregates are computed in double and round()ed to 2/4 decimals
  at the very end, identically in both engines (raw parallel double sums
  differ in the last ulp between engines; rounding collapses that, and both
  engines then hold identical float64 bits);
- every LIMIT is preceded by a total order (explicit tie-breaks);
- counts are BIGINT/long on both sides; year()/length() etc. cast to the same
  width on both sides;
- all hash-bearing operators (minhash, simhash, LSH planes, fingerprints) use
  the md5-based ``portable_hash60`` primitive so DuckDB reproduces them
  bit-for-bit — the oracle SQL for those is GENERATED from the same frozen
  constants the Spark implementation uses (dedup.MINHASH_COEFFS etc.).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .expr import and_, col as C, eq, not_, to_column
from .operators import dedup as D
from .operators import joins as J
from .operators import multimodal as M
from .operators import similarity as S
from .operators import text as X

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")


_NS_COLS_CACHE: dict[str, list[str]] = {}


def invalidate_load_cache(spark: SparkSession | None = None) -> None:
    """Drop memoized ``load()`` plans (r13, ADVICE): call after rewriting a
    parquet path in place (refreshed sf directories) so the next ``load``
    re-lists files and re-inspects footers. With ``spark`` given, clears
    only that session's memo; otherwise clears the footer cache too."""
    if spark is not None:
        getattr(spark, "_graft_load_cache", {}).clear()
        return
    _NS_COLS_CACHE.clear()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table. Parquet TIMESTAMP(NANOS) columns (events.ts)
    are read as long and truncated to microseconds — exactly what DuckDB 1.0
    does on read, so both engines see identical values. The driver-side
    footer inspection is cached per path (it would otherwise add a local
    metadata read to every query invocation).

    The returned DataFrame — a LAZY PLAN, no data, never .cache()d — is
    memoized per (session, path) (r12): each ``spark.read.parquet`` call
    pays ~0.1 s of JVM file-listing + schema inference, and a 7-join query
    re-paid it 8x on EVERY invocation (profiled: 0.79 s of q8's 1.23 s
    construction was re-reading the same footers). Executions still scan
    the parquet from disk every run — only the plan object is reused, the
    same lifetime contract as ``register_views``.

    r13 (ADVICE): the memo lives ON the session object (not a module dict
    keyed by id(spark)), so a stopped/collected session releases its plans
    with it and a recycled id() can never serve another session's plan.
    The plan freezes the path's file list/schema at first load — rewriting
    a parquet path in place mid-session requires ``invalidate_load_cache``."""
    path = f"{sf_dir}/{name}.parquet"
    cache = getattr(spark, "_graft_load_cache", None)
    if cache is None:
        cache = {}
        spark._graft_load_cache = cache
    cached = cache.get(path)
    if cached is not None:
        return cached
    ns_cols = _NS_COLS_CACHE.get(path)
    if ns_cols is None:
        import pyarrow.parquet as pq

        schema = pq.ParquetFile(path).schema_arrow
        ns_cols = [f.name for f in schema if str(f.type).startswith("timestamp[ns")]
        _NS_COLS_CACHE[path] = ns_cols
    if not ns_cols:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    cache[path] = df
    return df


_VIEWS_REGISTERED: dict[int, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for spark.sql queries);
    skipped when this session's views already point at this sf_dir (views
    are session-global, so only the LAST registered sf_dir is live)."""
    if _VIEWS_REGISTERED.get(id(spark)) == sf_dir:
        return
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    _VIEWS_REGISTERED[id(spark)] = sf_dir


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, bench: bool = False):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle, bench)
        return fn

    return deco


DEC2 = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Relational core (Spark-native capabilities the reference lacks, SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1(spark, sf):
    """TPC-H Q1-style pricing summary: hash aggregate with partial (map-side)
    combine — one shuffle on the 4-group key."""
    l = load(spark, sf, "lineitem").filter(F.col("l_shipdate") < "1998-09-03")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(_rev()), 2).alias("sum_disc_price"),
        F.round(F.sum(_rev() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    bench=True,
)
def q3(spark, sf):
    """TPC-H Q3-style. orders/customer scale with the data volume, so they
    carry NO broadcast hint — AQE picks broadcast when the runtime size
    allows and falls back to shuffle joins at scale (a forced hint here is
    an executor OOM at 100x)."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    l = load(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    bench=True,
)
def q5(spark, sf):
    """TPC-H Q5-style six-way join. Only the genuinely bounded dims
    (nation, region) keep broadcast hints; orders/customer/supplier grow
    with scale factor and are left to AQE's size-based choice."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice*l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    bench=True,
)
def q6(spark, sf):
    """TPC-H Q6-style: pure scan+filter+agg — filters push to the parquet
    reader (PushedFilters), no shuffle beyond the final single-row combine."""
    l = load(spark, sf, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name < n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark, sf):
    """TPC-H Q7-style volume shipping: 5-way join with the nation dim joined
    TWICE under different roles (both broadcast); theta condition on the two
    nation names prunes symmetric pairs."""
    s = load(spark, sf, "supplier")
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf, "nation").select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == l.l_orderkey)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    # exact decimal arithmetic end to end: inputs carry <= 2 decimal digits,
    # so casting THEM to decimal is unambiguous (casting the double PRODUCT
    # rounds half-cases differently across engines); multiply and sum are
    # then exact and order-independent
    vol = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    # round the DECIMAL (exact .5 cases round half-up identically in both
    # engines), THEN cast to double — rounding the double instead diverges
    # when the exact sum ends in .xx5
    return j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")).agg(
        F.round(F.sum(vol), 2).cast("double").alias("revenue")
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "join_semi_customers_with_big_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark, sf):
    """Anti join: customers with no order above 300k (non-empty at every sf,
    unlike 'no orders at all' — the generator gives every customer orders)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "correlated_scalar_subquery",
    """
    SELECT o_orderkey FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_subquery(spark, sf):
    """Catalyst decorrelates the subquery into an aggregate + join."""
    register_views(spark, sf)
    return spark.sql(
        "SELECT o_orderkey FROM orders o WHERE o_totalprice > "
        "(SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"
    )


@query(
    "agg_distinct_per_priority",
    """
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark, sf):
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "rollup_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_q(spark, sf):
    l = load(spark, sf, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_q(spark, sf):
    l = load(spark, sf, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))


@query(
    "window_nulls_ordering",
    """
    WITH b AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer)
    SELECT c_custkey, bal,
           CAST(row_number() OVER (ORDER BY bal DESC NULLS LAST, c_custkey) AS INT) AS rn_last,
           CAST(row_number() OVER (ORDER BY bal ASC NULLS FIRST, c_custkey) AS INT) AS rn_first
    FROM b
    """,
)
def window_nulls_ordering_q(spark, sf):
    """NULL ordering discipline in window sorts: the same synthesized-NULL
    column ranked with DESC NULLS LAST and ASC NULLS FIRST — both engines
    must place the NULL group identically and break ties by key. A single
    global-order window is driver-of-one-partition by construction; real
    rankings partition first (see window_top3), this query pins the NULL
    placement semantics only."""
    c = load(spark, sf, "customer")
    bal = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    b = c.select("c_custkey", bal.alias("bal"))
    w_last = Window.orderBy(F.col("bal").desc_nulls_last(), F.col("c_custkey").asc())
    w_first = Window.orderBy(F.col("bal").asc_nulls_first(), F.col("c_custkey").asc())
    return b.select(
        "c_custkey", "bal",
        F.row_number().over(w_last).cast("int").alias("rn_last"),
        F.row_number().over(w_first).cast("int").alias("rn_first"),
    )


@query(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, CAST(rnk AS INT) AS rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
    bench=True,
)
def window_rank(spark, sf):
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
                F.col("rnk").cast("int").alias("rnk"))
    )


@query(
    "window_running_and_lag",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
           round(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
    FROM orders
    """,
    bench=True,
)
def window_running(spark, sf):
    o = load(spark, sf, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(wrun), 2).alias("running_total"),
        F.round(F.lag("o_totalprice").over(wo), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(wo), 2).alias("next_price"),
    )


@query(
    "sort_topk_lineitems",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    bench=True,
)
def sort_topk(spark, sf):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    no full sort, no shuffle of the full table."""
    l = load(spark, sf, "lineitem")
    return (
        l.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", F.round(F.col("l_extendedprice"), 2).alias("l_extendedprice"))
        .limit(100)
    )


@query(
    "set_union_customers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_union(spark, sf):
    a = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = load(spark, sf, "orders").filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct()


@query(
    "set_intersect_customers",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark, sf):
    a = load(spark, sf, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@query(
    "set_except_customers",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except(spark, sf):
    a = load(spark, sf, "customer").select("c_custkey")
    b = load(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.exceptAll(b).distinct()


@query(
    "scalar_string_math_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 12) AS name12,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           round(abs(p_retailprice - 1000.0), 2) AS price_dev,
           CAST(floor(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
           coalesce(nullif(p_size, 5), -1) AS size_adj
    FROM part
    """,
)
def scalar_funcs(spark, sf):
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 12).alias("name12"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dev"),
        F.floor(F.col("p_retailprice") / 100.0).cast("long").alias("price_bucket"),
        F.coalesce(F.nullif(F.col("p_size"), F.lit(5)), F.lit(-1)).alias("size_adj"),
    )


@query(
    "scalar_date_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(dayofmonth(o_orderdate) AS INT) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
)
def date_funcs(spark, sf):
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


# ---------------------------------------------------------------------------
# Expression-DSL scan semantics (the reference's ScanBuilder surface, §2.2)
# ---------------------------------------------------------------------------


@query(
    "scan_filter_project_dsl",
    """
    SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_returnflag IN ('A','R') AND l_shipdate IS NOT NULL
    """,
)
def scan_dsl(spark, sf):
    """Expression DSL (reference: table/expression.go) → Catalyst filter with
    parquet pushdown; projection applied as in ScanBuilder.Select."""
    l = load(spark, sf, "lineitem")
    e = and_(C("l_quantity").between(10, 20), C("l_returnflag").isin("A", "R"), C("l_shipdate").is_not_null())
    return l.filter(to_column(e)).select(
        "l_orderkey", "l_linenumber", F.round(F.col("l_quantity"), 2).alias("l_quantity"), "l_returnflag"
    )


@query(
    "filter_not_three_valued_logic",
    """
    SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS rf
    FROM lineitem WHERE NOT (nullif(l_returnflag, 'N') = 'R')
    """,
)
def filter_3vl(spark, sf):
    """SQL three-valued logic probe (SURVEY §2.6.1): rows where rf IS NULL are
    dropped by NOT(rf='R') — the documented divergence from the reference's
    two-valued row interpreter (reference: table/delete.go:344-346)."""
    l = load(spark, sf, "lineitem").withColumn("rf", F.nullif(F.col("l_returnflag"), F.lit("N")))
    return l.filter(to_column(not_(eq("rf", "R")))).select("l_orderkey", "l_linenumber", "rf")


@query(
    "filter_starts_with",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE 's%' OR NOT (p_name LIKE 'b%' OR p_name IS NULL) AND p_name >= 'r'
    """,
)
def filter_startswith(spark, sf):
    """StartsWith / NotStartsWith — ops the reference's evaluator silently
    mishandles (defaults to true, reference: table/delete.go:324-326).
    Prefixes chosen to match real generator names ('small …', 'red …')."""
    p = load(spark, sf, "part")
    from .expr import or_

    e = or_(C("p_name").starts_with("s"), and_(C("p_name").not_starts_with("b"), C("p_name").gte("r")))
    return p.filter(to_column(e)).select("p_partkey", "p_name")


@query(
    "filter_not_in",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_notin(spark, sf):
    o = load(spark, sf, "orders")
    return o.filter(to_column(C("o_orderpriority").not_in("1-URGENT", "2-HIGH"))).select(
        "o_orderkey", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# Time-series joins & windows (events)
# ---------------------------------------------------------------------------


@query(
    "asof_join_purchase_to_view",
    """
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS view_event_id, r.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    bench=True,
)
def asof_q(spark, sf):
    """As-of join via union + windowed carry-forward (operators/joins.py) —
    one shuffle by key, no inequality-join explosion."""
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id", "value")
    out = J.asof_join(purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
                      right_cols=["event_id", "value"], suffix="_v")
    return out.select(
        "event_id", "user_id", "ts",
        F.col("event_id_v").alias("view_event_id"), F.col("value_v").alias("view_value"),
    )


@query(
    "asof_join_with_tolerance",
    """
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN l.ts - r.ts <= INTERVAL 1 HOUR THEN r.event_id END AS view_event_id,
           CASE WHEN l.ts - r.ts <= INTERVAL 1 HOUR THEN r.value END AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_tolerance_q(spark, sf):
    """As-of join with a 1-hour staleness bound (pandas merge_asof
    tolerance): a matched view older than the bound degrades to NULLs — the
    feature-freshness contract of an online feature store. Same union +
    windowed carry-forward plan, zero extra shuffles."""
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id", "value")
    out = J.asof_join(purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
                      right_cols=["event_id", "value"], suffix="_v",
                      tolerance_seconds=3600)
    return out.select(
        "event_id", "user_id", "ts",
        F.col("event_id_v").alias("view_event_id"), F.col("value_v").alias("view_value"),
    )


@query(
    "range_join_errors_followups",
    """
    SELECT r.event_id AS error_id, l.event_id AS other_id
    FROM (SELECT * FROM events WHERE event_type = 'error') r
    JOIN events l ON l.user_id = r.user_id
                 AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 1 HOUR
                 AND l.event_id <> r.event_id
    """,
)
def range_q(spark, sf):
    """Range join via day-bucket equi-join + residual filter (operators/
    joins.py) — shuffles on (user, day) instead of nested-looping."""
    ev = load(spark, sf, "events")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("error_id"), "user_id",
                F.col("ts").alias("_lo"), (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("_hi"))
    )
    out = J.range_join_days(
        ev.select(F.col("event_id").alias("other_id"), "user_id", "ts"),
        errors, on=["user_id"], left_ts="ts", right_lo="_lo", right_hi="_hi",
    )
    return out.filter(F.col("other_id") != F.col("error_id")).select("error_id", "other_id")


@query(
    "tumbling_window_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    bench=True,
)
def tumbling_q(spark, sf):
    """Tumbling time window via F.window (same operator Structured Streaming
    uses; here in batch)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


_STREAM_SEQ_HOLDER = [0]


def _await_drained(q, timeout: int = 300) -> None:
    """awaitTermination that fails LOUDLY: a stream that has not drained
    within ``timeout`` seconds must not fall through to reading its sink —
    that would silently return partial results to the correctness gate."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"stream {q.name or q.id} did not drain within {timeout}s; "
            "refusing to read a partially-populated sink"
        )


@query(
    "streaming_tumbling_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_q(spark, sf):
    """A REAL Structured Streaming job, not a batch stand-in: file-stream the
    events table, tumbling-window aggregate, complete-mode memory sink,
    availableNow trigger. Deterministic: complete mode re-emits the full
    state, so after the stream drains the result equals the batch aggregate
    (no watermark -> no late-row drops)."""
    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema  # ts surfaces as long under the conf
    # the file stream source needs a directory; glob-filter to the one table
    src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
    if str(sch["ts"].dataType) == "LongType()":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    agg = (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"stream_tumbling_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("complete")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    return spark.table(name)


@query(
    "streaming_static_enrichment",
    """
    SELECT c.c_mktsegment, e.event_type,
           count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_static_enrichment_q(spark, sf):
    """Stream-STATIC enrichment join, the canonical streaming-ETL shape: a
    file-streamed fact (events) joins a static dimension (customer) row by
    row as micro-batches arrive — Spark re-plans the static side per batch,
    AQE broadcasts it, and NO stream state is kept for the join (stream-
    static equijoins are stateless by construction; only the downstream
    complete-mode aggregate holds state, keyed by segment x type — bounded).
    After the availableNow stream drains, the result equals the batch join,
    which is the oracle."""
    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
    dim = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = src.join(F.broadcast(dim), src["user_id"] == dim["c_custkey"])
    agg = (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"stream_enrich_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("complete")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    return spark.table(name)


@query(
    "streaming_interval_join",
    """
    SELECT v.user_id AS user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           round(p.value, 2) AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
)
def streaming_interval_join_q(spark, sf):
    """Stream-stream interval join, the canonical Structured Streaming join:
    views and purchases stream independently, watermarked 1 hour each, inner
    join on user within [view.ts, view.ts + 24h]. The watermark + time bound
    let Spark evict join state (bounded memory at 100 TB/day feeds);
    availableNow drains everything in order, so append output equals the
    batch interval join and the oracle can grade it."""
    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    nanos = str(sch["ts"].dataType) == "LongType()"

    def side(event_type, prefix):
        src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
        if nanos:
            src = src.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
        else:
            # parquet micros surface as TIMESTAMP_NTZ; watermarks require
            # LTZ — cast interprets wall time in the session tz (UTC), so
            # values match the oracle's naive timestamps exactly
            src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        return (
            src.filter(F.col("event_type") == event_type)
            .select(F.col("user_id").alias(f"{prefix}_user"),
                    F.col("event_id").alias(f"{prefix}_id"),
                    F.col("ts").alias(f"{prefix}_ts"),
                    F.col("value").alias(f"{prefix}_value"))
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    v, p = side("view", "v"), side("purchase", "p")
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"), F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        F.round(F.col("p_value"), 2).alias("purchase_value"),
    )
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"stream_ijoin_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        joined.writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    return spark.table(name)


@query(
    "streaming_session_window",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def streaming_session_q(spark, sf):
    """Sessionization as a REAL Structured Streaming job: file-stream the
    events table, F.session_window (30-min gap) stateful aggregation,
    complete-mode memory sink, availableNow trigger — the merging-session
    state operator; after the stream drains the result equals the batch
    sessionization (no watermark -> no late-row drops, complete mode
    re-emits full state)."""
    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
    if str(sch["ts"].dataType) == "LongType()":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    agg = (
        src.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"stream_session_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("complete")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    return spark.table(name)


@query(
    "streaming_upsert_table_sink_scan",
    """
    SELECT user_id, ts, value FROM (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
      FROM events) t WHERE rn = 1
    """,
)
def streaming_upsert_sink_q(spark, sf):
    """The streaming UPSERT (CDC) table sink through the graded gate: each
    micro-batch MERGEs into an engine table keyed on user_id (within-batch
    duplicates collapse to the last-seen row, exactly-once batch markers),
    so after the stream drains the table holds exactly each user's LATEST
    event — the materialized-view shape a CDC pipeline maintains."""
    from .streaming.stream import upsert_stream

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
    if str(sch["ts"].dataType) == "LongType()":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    src = src.select("user_id", "ts", "value")

    seed = load(spark, sf, "events").select("user_id", "ts", "value").limit(0)
    t = _scratch_table(spark, "upsink", seed)
    wh = _scratch_dir("gis_upsink_ckpt_")
    q = upsert_stream(src, t, wh + "/ckpt", ["user_id"], trigger_once=True)
    _await_drained(q)
    t.refresh()
    return t.to_df().select("user_id", "ts", "value")


@query(
    "streaming_dedup_sink_scan",
    """
    SELECT DISTINCT user_id % 50 AS uk, event_type FROM events
    """,
)
def streaming_dedup_sink_q(spark, sf):
    """Streaming cross-batch DEDUP sink (r11): ``dropDuplicates`` state in
    the stream filters re-observed keys, survivors append exactly-once —
    the ingestion-time exact dedup of a training-data firehose, with the
    state store (not the table) carrying the seen-keys set. The output
    columns are pure functions of the dedup KEY, so which physical row
    survives (nondeterministic across partitions) cannot affect the
    result — the KEYSET is deterministic and the oracle is DISTINCT.
    Inline-asserted: a full same-checkpoint replay adds zero snapshots,
    and the sunk keyset contains no duplicates."""
    from .streaming.stream import dedup_stream

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema

    def mk_src():
        return (spark.readStream.schema(sch)
                .option("pathGlobFilter", "events.parquet").parquet(sf)
                .select((F.col("user_id") % 50).alias("uk"), "event_type"))

    seed = spark.createDataFrame([], "uk bigint, event_type string")
    t = _scratch_table(spark, "dedupsink", seed)
    wh = _scratch_dir("gis_dedupsink_ckpt_")
    q = dedup_stream(mk_src(), t, wh + "/ckpt", ["uk", "event_type"],
                     trigger_once=True)
    _await_drained(q)
    t.refresh()
    n_snaps = len(t.snapshots())
    q2 = dedup_stream(mk_src(), t, wh + "/ckpt", ["uk", "event_type"],
                      trigger_once=True)
    _await_drained(q2)
    t.refresh()
    if len(t.snapshots()) != n_snaps:
        raise AssertionError("replayed dedup stream re-appended batches")
    out = t.to_df()
    if out.count() != out.dropDuplicates(["uk", "event_type"]).count():
        raise AssertionError("dedup sink emitted duplicate keys")
    return out.select("uk", "event_type")


@query(
    "streaming_agg_view_sink_scan",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_agg_view_sink_q(spark, sf):
    """Streaming AGGREGATE-VIEW maintenance sink (r9): micro-batches reduce
    to per-group partials that MERGE into an engine table ADDITIVELY —
    the streaming complement of the changelog-based aggregate IVM, with
    the TABLE as the only state (no Spark state store). Exactly-once is
    load-bearing: a replayed additive merge would double-count, so the
    batch marker + high-water + per-retry recheck carry correctness —
    asserted by re-running the drained stream on the SAME checkpoint and
    requiring zero new snapshots. Final view == one-shot aggregate."""
    from .streaming.stream import agg_view_stream

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = (spark.readStream.schema(sch)
           .option("pathGlobFilter", "events.parquet").parquet(sf)
           .select("event_type", "value"))

    seed = (load(spark, sf, "events").groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value")).limit(0))
    t = _scratch_table(spark, "aggsink", seed)
    wh = _scratch_dir("gis_aggsink_ckpt_")
    q = agg_view_stream(src, t, wh + "/ckpt", ["event_type"],
                        count_col="n_events", sum_cols={"sum_value": "value"},
                        trigger_once=True)
    _await_drained(q)
    t.refresh()
    n_snaps = len(t.snapshots())
    # replay the WHOLE stream on the same checkpoint: exactly-once means
    # zero additional snapshots (a double-count would poison every sum)
    src2 = (spark.readStream.schema(sch)
            .option("pathGlobFilter", "events.parquet").parquet(sf)
            .select("event_type", "value"))
    q2 = agg_view_stream(src2, t, wh + "/ckpt", ["event_type"],
                         count_col="n_events", sum_cols={"sum_value": "value"},
                         trigger_once=True)
    _await_drained(q2)
    t.refresh()
    if len(t.snapshots()) != n_snaps:
        raise AssertionError("replayed stream re-applied batches")
    return t.to_df().select("event_type", "n_events",
                            F.round("sum_value", 2).alias("sum_value"))


def _hll_oracle_part(grp_expr: str, value_col: str, where: str = "",
                     table: str = "orders") -> str:
    """One grouping's HLL estimate in DuckDB SQL, same register/estimator
    construction as operators.sketch.hll_distinct (p=9, m=512)."""
    m, a = 512, 0.7213 / (1 + 1.079 / 512) * 512 * 512 * float(1 << 52)
    return f"""
    SELECT grp, round(CASE WHEN {a!r} / CAST(sum_present + (512 - present) * 4503599627370496 AS DOUBLE) <= 1280.0
                            AND (512 - present) > 0
                      THEN 512.0 * ln(512.0 / (512 - present))
                      ELSE {a!r} / CAST(sum_present + (512 - present) * 4503599627370496 AS DOUBLE) END, 2) AS n_estimate
    FROM (
      SELECT grp, sum(1::BIGINT << (52 - m)) AS sum_present, count(*) AS present
      FROM (
        SELECT grp, hv % 512 AS bucket,
               max(CASE WHEN hv // 512 = 0 THEN 52
                        ELSE 52 - length(bin(hv // 512)) END) AS m
        FROM (SELECT {grp_expr} AS grp,
                     ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS hv
              FROM {table} WHERE {value_col} IS NOT NULL {where})
        GROUP BY grp, bucket
      ) GROUP BY grp
    )"""



@query(
    "streaming_hll_view_sink_scan",
    _hll_oracle_part("event_type", "user_id", table="events")
    + "\n    ORDER BY grp",
)
def streaming_hll_view_sink_q(spark, sf):
    """Streaming DISTINCT-COUNT view via HLL registers (r10): micro-batch
    registers MERGE into an engine table by GREATEST, and the view's
    estimate equals the batch HLL over the drained stream. The point vs
    the additive agg sink: register max-merge is IDEMPOTENT by algebra,
    so replay safety does NOT hinge on the exactly-once machinery —
    inline-asserted by FORCIBLY re-merging the whole stream's registers
    (bypassing the batch markers) and requiring the view rows unchanged.
    The same-checkpoint replay is also asserted to add zero snapshots
    (the marker still saves wasted commits). State is <= groups x 512
    register rows whatever the stream volume."""
    from .operators.sketch import hll_registers
    from .streaming.stream import hll_view_estimate, hll_view_stream

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = (spark.readStream.schema(sch)
           .option("pathGlobFilter", "events.parquet").parquet(sf)
           .select("event_type", "user_id"))

    seed = spark.createDataFrame([], "event_type string, bucket bigint, register int")
    t = _scratch_table(spark, "hllsink", seed)
    wh = _scratch_dir("gis_hllsink_ckpt_")
    q = hll_view_stream(src, t, wh + "/ckpt", ["event_type"], "user_id",
                        trigger_once=True)
    _await_drained(q)
    t.refresh()
    n_snaps = len(t.snapshots())

    # algebraic replay-safety: re-merge the FULL stream's registers without
    # any marker protection — the view must be bit-identical
    before = t.to_df()
    before.cache(); before.count()
    full_regs = hll_registers(
        load(spark, sf, "events").select("event_type", "user_id"),
        ["event_type"], "user_id")
    t.merge(full_regs, ["event_type", "bucket"],
            when_matched_update={"register": F.greatest(F.col("t.register"),
                                                        F.col("s.register"))},
            when_not_matched_insert=True)
    after = t.to_df()
    if after.exceptAll(before).count() or before.exceptAll(after).count():
        raise AssertionError("register max-merge replay changed the view")
    before.unpersist()

    # same-checkpoint replay: zero new snapshots (marker saves the commit)
    src2 = (spark.readStream.schema(sch)
            .option("pathGlobFilter", "events.parquet").parquet(sf)
            .select("event_type", "user_id"))
    q2 = hll_view_stream(src2, t, wh + "/ckpt", ["event_type"], "user_id",
                         trigger_once=True)
    _await_drained(q2)
    t.refresh()
    if len(t.snapshots()) != n_snaps + 1:  # +1 = the forced re-merge above
        raise AssertionError("replayed stream re-applied batches")
    return (hll_view_estimate(t.to_df(), ["event_type"])
            .select(F.col("event_type").alias("grp"), "n_estimate")
            .orderBy("grp"))


@query(
    "streaming_stateful_running_max",
    """
    SELECT user_id, max(value) AS max_value, count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful_q(spark, sf):
    """CUSTOM stateful streaming operator (applyInPandasWithState,
    Arrow-batched, update-mode): per-user running max(value) + event count
    with state carried across micro-batches. The events table arrives as
    one availableNow micro-batch here, so the drained update stream holds
    exactly one final row per user == the batch aggregate; across multiple
    micro-batches the LAST update per user converges to the same values."""
    from .streaming.stream import running_max_stream

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
    out = running_max_stream(src.select("user_id", "value"))
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"stream_runmax_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("update")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    # keep only each user's LAST update (single-batch here, so it's all rows;
    # the dedup keeps the query correct if the source ever splits batches)
    res = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        res.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1)
        .select("user_id", "max_value", "n")
    )


@query(
    "session_window_30min",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_q(spark, sf):
    """Session windows (30-min gap) via F.session_window — the same stateful
    operator Structured Streaming uses for sessionization."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


# ---------------------------------------------------------------------------
# Dedup / text / similarity / multimodal (north-star operators)
# ---------------------------------------------------------------------------

# augmented corpus with planted exact + near duplicates, expressible in both
# engines so dedup operators have non-trivial work to find
_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
    UNION ALL SELECT doc_id + 2000000 AS doc_id, text || ' zz qq' AS text FROM documents WHERE doc_id % 25 = 1
"""


def _corpus(spark, sf) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    exact = d.filter(F.col("doc_id") % 25 == 0).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    near = d.filter(F.col("doc_id") % 25 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), F.concat(F.col("text"), F.lit(" zz qq")).alias("text")
    )
    return d.unionByName(exact).unionByName(near)


@query(
    "dedup_exact",
    f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM corpus GROUP BY text
    """,
    bench=True,
)
def dedup_exact_q(spark, sf):
    return D.exact_dedup(_corpus(spark, sf), ["text"], "doc_id").select("doc_id", "dup_count")


@query(
    "dedup_fingerprint",
    f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           min(doc_id) AS doc_id, count(*) AS n
    FROM corpus GROUP BY 1
    """,
)
def dedup_fp_q(spark, sf):
    fp = X.fingerprint(_corpus(spark, sf), "doc_id", "text")
    return fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n"))


def _shingle_sql(n: int = 3) -> str:
    """DuckDB SQL for the distinct word-3-gram shingle-hash table, mirroring
    dedup.word_shingles + portable_hash60 exactly."""
    return f"""
    toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM corpus),
    grams AS (
      SELECT doc_id, array_to_string(t[i+1 : i+{n}], ' ') AS g
      FROM (SELECT doc_id, t, unnest(generate_series(0, greatest(len(t) - {n}, 0))) AS i FROM toks)),
    shingles AS (
      SELECT DISTINCT doc_id AS _id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS _h FROM grams)
    """


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    {_shingle_sql(3)},
    shingle_df AS (SELECT _h, count(*) AS df FROM shingles GROUP BY _h),
    kept AS (
      SELECT s._id, s._h FROM shingles s JOIN shingle_df USING (_h)
      WHERE df <= {D.JACCARD_MAX_SHINGLE_DF}),
    sizes AS (SELECT _id, count(*) AS sz FROM kept GROUP BY _id),
    common AS (
      SELECT a._id AS id_a, b._id AS id_b, count(*) AS c
      FROM kept a JOIN kept b ON a._h = b._h AND a._id < b._id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
    FROM common JOIN sizes sa ON sa._id = id_a JOIN sizes sb ON sb._id = id_b
    WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
    """,
)
def jaccard_q(spark, sf):
    return D.jaccard_pairs(_corpus(spark, sf), "doc_id", "text", n=3, mode="word", threshold=0.8)


@query(
    "sequence_similarity_users",
    f"""
    WITH corpus AS (
      SELECT user_id AS doc_id,
             string_agg(event_type, ' ' ORDER BY ts, event_id, event_type) AS text
      FROM events GROUP BY user_id),
    {_shingle_sql(5)},
    shingle_df AS (SELECT _h, count(*) AS df FROM shingles GROUP BY _h),
    kept AS (
      SELECT s._id, s._h FROM shingles s JOIN shingle_df USING (_h)
      WHERE df <= {D.JACCARD_MAX_SHINGLE_DF}),
    sizes AS (SELECT _id, count(*) AS sz FROM kept GROUP BY _id),
    common AS (
      SELECT a._id AS id_a, b._id AS id_b, count(*) AS c
      FROM kept a JOIN kept b ON a._h = b._h AND a._id < b._id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
    FROM common JOIN sizes sa ON sa._id = id_a JOIN sizes sb ON sb._id = id_b
    ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
)
def sequence_similarity_q(spark, sf):
    """Behavioral sequence similarity (the trajectory-similarity shape from
    the retrieved papers, on event streams): each user's time-ordered
    event-type sequence becomes a document, and the TOP-20 pairs by 5-gram
    shingle Jaccard are the behavior-alikes — user segmentation /
    bot-cohort detection as a similarity SEARCH (TakeOrdered top-k, no full
    sort). Sequences are built with a
    deterministic (ts, event_id, type) sort inside ONE aggregate (no window
    over the event table), then the capped exact-Jaccard operator runs
    unchanged — the stop-shingle cap drops the universal n-grams that would
    make everyone similar."""
    ev = load(spark, sf, "events")
    seqs = ev.groupBy(F.col("user_id").alias("doc_id")).agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"])).alias("text"))
    return (
        D.jaccard_pairs(seqs, "doc_id", "text", n=5, mode="word", threshold=0.0)
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(20)
    )


def _minhash_oracle_sql() -> str:
    """Generate the MinHash-LSH oracle from the SAME frozen constants the
    Spark implementation uses (dedup.MINHASH_COEFFS / LSH_BANDS)."""
    P = D.MINHASH_PRIME
    mh_cols = ",\n      ".join(
        f"min(({a} * (_h % {P}) + {b}) % {P}) AS mh_{j}" for j, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    band_rows = []
    for band in range(D.LSH_BANDS):
        cols = [f"mh_{band * D.LSH_ROWS + r}" for r in range(D.LSH_ROWS)]
        bh = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(f"SELECT _id, {band} AS _band, {bh} AS _bh FROM sig")
    bands_sql = "\n      UNION ALL ".join(band_rows)
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    {_shingle_sql(3)},
    sig AS (SELECT _id, {mh_cols} FROM shingles GROUP BY _id),
    bands AS ({bands_sql}),
    cand AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM bands a JOIN bands b ON a._band = b._band AND a._bh = b._bh AND a._id < b._id),
    sizes AS (SELECT _id, count(*) AS sz FROM shingles GROUP BY _id),
    common AS (
      SELECT c.id_a, c.id_b, count(*) AS cc
      FROM cand c JOIN shingles sa ON sa._id = c.id_a JOIN shingles sb ON sb._id = c.id_b AND sa._h = sb._h
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(cc AS DOUBLE) / (sa.sz + sb.sz - cc) AS jaccard
    FROM common JOIN sizes sa ON sa._id = id_a JOIN sizes sb ON sb._id = id_b
    WHERE CAST(cc AS DOUBLE) / (sa.sz + sb.sz - cc) >= 0.6
    """


@query("dedup_minhash_lsh", _minhash_oracle_sql(), bench=True)
def minhash_q(spark, sf):
    """MinHash+LSH near-dup: banded candidate generation + exact Jaccard
    verify — the web-scale dedup path (candidates only, no all-pairs join).
    The default path materializes eagerly and releases the signature cache;
    PLAN_VARIANTS carries the lazy twin for plan audits."""
    return D.minhash_lsh_pairs(_corpus(spark, sf), "doc_id", "text", n=3, mode="word", threshold=0.6)


# Lazy (materialize=False) twins of queries whose public path eagerly
# checkpoints + unpersists: plan audits (tests/test_plans.py,
# scripts/dump_plans.py) introspect THESE — the checkpointed result's plan
# is just an RDD scan. Callers must spark.catalog.clearCache() after.
PLAN_VARIANTS = {
    "dedup_minhash_lsh": lambda spark, sf: D.minhash_lsh_pairs(
        _corpus(spark, sf), "doc_id", "text", n=3, mode="word", threshold=0.6, materialize=False
    ),
    "dedup_simhash": lambda spark, sf: D.simhash_pairs(
        _corpus(spark, sf), "doc_id", "text", max_hamming=3, materialize=False
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming")),
    "dedup_simhash_wide": lambda spark, sf: D.simhash_wide_pairs(
        _corpus(spark, sf), "doc_id", "text", max_hamming=3, materialize=False
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming")),
    # r10: the default MMR path localCheckpoints each greedy round (the
    # lazy tree doubles per round — ~1300 exchanges); audits see the lazy
    # unrolled plan
    "similarity_mmr_rerank": lambda spark, sf: S.mmr_rerank(
        load(spark, sf, "embeddings"),
        load(spark, sf, "embeddings").filter(F.col("vec_id") < 8),
        id_col="vec_id", vec_col="embedding",
        n_candidates=10, k=5, lam=0.7, materialize=False),
}


def _fuzzy_contamination_oracle_sql() -> str:
    """Cross-corpus MinHash decontamination oracle: the eval set is the base
    documents with doc_id % 25 <= 1 — the SOURCES of the corpus's planted
    exact (+1M) and near (+2M, ' zz qq') duplicates, so known leakage must
    surface. Eval ids exist in the corpus with identical text, so their
    shingles/signatures are reused from the corpus CTEs."""
    P = D.MINHASH_PRIME
    mh_cols = ",\n      ".join(
        f"min(({a} * (_h % {P}) + {b}) % {P}) AS mh_{j}" for j, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    band_rows = []
    for band in range(D.LSH_BANDS):
        cols = [f"mh_{band * D.LSH_ROWS + r}" for r in range(D.LSH_ROWS)]
        bh = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(f"SELECT _id, {band} AS _band, {bh} AS _bh FROM sig")
    bands_sql = "\n      UNION ALL ".join(band_rows)
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    {_shingle_sql(3)},
    sig AS (SELECT _id, {mh_cols} FROM shingles GROUP BY _id),
    bands AS ({bands_sql}),
    ebands AS (SELECT * FROM bands WHERE _id < 1000000 AND _id % 25 <= 1),
    cand AS (
      SELECT DISTINCT a._id AS train_id, b._id AS eval_id
      FROM bands a JOIN ebands b ON a._band = b._band AND a._bh = b._bh),
    sizes AS (SELECT _id, count(*) AS sz FROM shingles GROUP BY _id),
    common AS (
      SELECT c.train_id, c.eval_id, count(*) AS cc
      FROM cand c JOIN shingles sa ON sa._id = c.train_id
                  JOIN shingles sb ON sb._id = c.eval_id AND sa._h = sb._h
      GROUP BY 1, 2)
    SELECT train_id, eval_id, CAST(cc AS DOUBLE) / (sa.sz + sb.sz - cc) AS jaccard
    FROM common JOIN sizes sa ON sa._id = train_id JOIN sizes sb ON sb._id = eval_id
    WHERE CAST(cc AS DOUBLE) / (sa.sz + sb.sz - cc) >= 0.6
    """


@query(
    "dedup_repeated_spans",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM corpus),
    spans AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(t[i+1 : i+8], ' ')), 1, 15))::BIGINT AS _h
      FROM (SELECT doc_id, t, unnest(generate_series(0, greatest(len(t) - 8, 0))) AS i FROM toks)),
    cross_spans AS (
      SELECT _h FROM (SELECT _h, count(DISTINCT doc_id) AS d FROM spans GROUP BY _h) WHERE d > 1)
    SELECT s.doc_id, count(*) AS n_spans,
           CAST(sum(CASE WHEN c._h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
           round(sum(CASE WHEN c._h IS NOT NULL THEN 1 ELSE 0 END) / count(*), 4) AS coverage
    FROM spans s LEFT JOIN cross_spans c ON s._h = c._h
    GROUP BY s.doc_id
    """,
)
def repeated_spans_q(spark, sf):
    """Cross-document repeated-span coverage (exact-substring memorization
    signal): fraction of each doc's 8-gram spans occurring in another doc —
    the planted corpus duplicates surface at coverage 1.0."""
    return D.repeated_span_coverage(_corpus(spark, sf), "doc_id", "text", n=8)


@query("decontaminate_fuzzy_minhash", _fuzzy_contamination_oracle_sql())
def fuzzy_contamination_q(spark, sf):
    """MinHash-banded decontamination of the training corpus against an eval
    set: near-dup leakage (paraphrase/reformat) the exact n-gram filter
    misses. Eval band rows broadcast; the training corpus never shuffles."""
    train = _corpus(spark, sf)
    ev = load(spark, sf, "documents").filter(F.col("doc_id") % 25 <= 1).select("doc_id", "text")
    return D.fuzzy_contamination(train, ev, "doc_id", "text", n=3, mode="word", threshold=0.6)


@query(
    "text_chunk_windows",
    """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
      FROM documents),
    starts AS (
      SELECT doc_id, t, unnest(generate_series(0, greatest(len(t) - 1, 0), 24)) AS s
      FROM toks)
    SELECT doc_id, CAST(s / 24 AS INT) AS chunk_id,
           array_to_string(t[s + 1 : s + 32], ' ') AS chunk_text,
           CAST(least(len(t) - s, 32) AS INT) AS n_tokens
    FROM starts WHERE s = 0 OR s < len(t)
    """,
)
def chunk_windows_q(spark, sf):
    """Overlapping token-window chunking (size 32, stride 24) — the RAG /
    context-window preparation step: tokenize once, explode window starts,
    slice per window. Linear in total tokens, no shuffle at all."""
    return X.chunk_tokens(load(spark, sf, "documents"), "doc_id", "text",
                          size=32, stride=24)


@query(
    "text_robust_scale_by_source",
    """
    WITH st AS (
      SELECT source, quantile_cont(n_chars, 0.5) AS med,
             quantile_cont(n_chars, 0.25) AS q1, quantile_cont(n_chars, 0.75) AS q3
      FROM documents GROUP BY source)
    SELECT doc_id, d.source,
           round(CASE WHEN q3 - q1 = 0 THEN 0.0
                      ELSE (n_chars - med) / (q3 - q1) END, 4) AS scaled
    FROM documents d JOIN st USING (source)
    """,
)
def robust_scale_q(spark, sf):
    """Per-source robust scaling of document length via applyInPandas
    (grouped-map Pandas UDF — the one UDF shape the rest of the corpus
    doesn't exercise): each source group normalizes (x - median)/IQR with
    vectorized numpy; numpy's linear percentile interpolation matches
    DuckDB quantile_cont bit-for-bit after rounding."""
    return X.robust_scale(load(spark, sf, "documents"), "doc_id", "source", "n_chars")


@query(
    "timeseries_resample_locf",
    """
    WITH agg AS (
      SELECT event_type AS _k, date_trunc('hour', ts) AS _b,
             CAST(count(*) AS BIGINT) AS n, round(avg(value), 4) AS avg_v
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT date_trunc('hour', min(ts)) AS _lo, date_trunc('hour', max(ts)) AS _hi
               FROM events),
    spine AS (
      SELECT k._k, unnest(generate_series(b._lo, b._hi, INTERVAL 1 HOUR)) AS _b
      FROM (SELECT DISTINCT event_type AS _k FROM events) k CROSS JOIN bounds b)
    SELECT s._k AS event_type, s._b AS bucket_ts,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n, a.avg_v,
           last_value(a.avg_v IGNORE NULLS) OVER (
             PARTITION BY s._k ORDER BY s._b ROWS UNBOUNDED PRECEDING) AS locf_v
    FROM spine s LEFT JOIN agg a ON s._k = a._k AND s._b = a._b
    """,
)
def timeseries_resample_q(spark, sf):
    """Hourly resample of the events stream per event type: explicit gap
    cells (n=0), in-bucket mean, and last-observation-carried-forward — the
    grid regularization step before windowed feature extraction. Spine rows
    are generated executor-side from a broadcast 1-row min/max; the stream
    shuffles once."""
    from .operators.timeseries import resample_locf

    return resample_locf(load(spark, sf, "events"), "ts", "event_type", "value")


@query(
    "timeseries_resample_interpolate",
    """
    WITH src AS (SELECT event_type, ts, value FROM events WHERE user_id % 97 = 0),
    agg AS (
      SELECT event_type AS _k, date_trunc('hour', ts) AS _b,
             round(avg(value), 4) AS avg_v
      FROM src GROUP BY 1, 2),
    bounds AS (SELECT date_trunc('hour', min(ts)) AS _lo, date_trunc('hour', max(ts)) AS _hi
               FROM src),
    spine AS (
      SELECT k._k, unnest(generate_series(b._lo, b._hi, INTERVAL 1 HOUR)) AS _b
      FROM (SELECT DISTINCT event_type AS _k FROM src) k CROSS JOIN bounds b),
    grid AS (
      SELECT s._k, s._b, a.avg_v FROM spine s
      LEFT JOIN agg a ON s._k = a._k AND s._b = a._b),
    nbr AS (
      SELECT _k, _b, avg_v,
        last_value(avg_v IGNORE NULLS) OVER (PARTITION BY _k ORDER BY _b
          ROWS UNBOUNDED PRECEDING) AS pv,
        first_value(avg_v IGNORE NULLS) OVER (PARTITION BY _k ORDER BY _b
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        last_value(CASE WHEN avg_v IS NOT NULL THEN _b END IGNORE NULLS)
          OVER (PARTITION BY _k ORDER BY _b ROWS UNBOUNDED PRECEDING) AS pt,
        first_value(CASE WHEN avg_v IS NOT NULL THEN _b END IGNORE NULLS)
          OVER (PARTITION BY _k ORDER BY _b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM grid)
    SELECT _k AS event_type, _b AS bucket_ts, avg_v,
           CASE WHEN avg_v IS NOT NULL THEN avg_v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  floor((pv + (nv - pv) *
                        ((CAST(epoch(_b) AS BIGINT) - CAST(epoch(pt) AS BIGINT))
                         / (CAST(epoch(nt) AS BIGINT) - CAST(epoch(pt) AS BIGINT))))
                        * 10000 + 0.5) / 10000
           END AS interp_v
    FROM nbr
    """,
)
def timeseries_interpolate_q(spark, sf):
    """Linear gap interpolation on the hourly grid (r11 — the numeric
    complement of LOCF): interior gaps take the time-weighted value
    between their nearest observed neighbors; edges stay NULL
    (interpolation, never extrapolation). The stream is THINNED
    (user_id % 97) so the grid genuinely has interior gaps —
    inline-asserted: at least one cell is interpolated (filled while
    unobserved), or the fixture is not testing the operator."""
    from .operators.timeseries import resample_interpolate

    src = load(spark, sf, "events").filter(F.col("user_id") % 97 == 0)
    out = resample_interpolate(src, "ts", "event_type", "value")
    n_interp = out.filter(F.col("avg_v").isNull()
                          & F.col("interp_v").isNotNull()).count()
    if n_interp == 0:
        raise AssertionError("no interior gaps interpolated — fixture too dense")
    return out


@query(
    "hopping_window_counts",
    """
    WITH starts AS (
      SELECT event_type, value,
             unnest(generate_series(
               date_trunc('hour', ts) - INTERVAL 1 HOUR,
               date_trunc('hour', ts),
               INTERVAL 1 HOUR)) AS w_start
      FROM events)
    SELECT w_start AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM starts
    GROUP BY w_start, event_type
    """,
)
def hopping_window_q(spark, sf):
    """Hopping (sliding) window aggregation: 2-hour windows advancing every
    hour, so each event lands in exactly two windows — F.window with a slide
    interval; Spark expands the window memberships inline (no self-join).
    The oracle derives each event's two window starts with generate_series."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "streaming_table_sink_scan",
    """
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id, event_type
    """,
)
def streaming_table_sink_q(spark, sf):
    """The streaming TABLE SINK through the graded gate: file-stream the
    events table, append each micro-batch into a NEW engine table as one
    snapshot (exactly-once batch markers in the snapshot summary), then
    aggregate the TABLE's scan — proving stream-written snapshots serve the
    same results as the batch source."""
    from .streaming.stream import append_stream

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = (spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet")
           .parquet(sf)
           .filter(F.col("event_type").isin("view", "purchase"))
           .select("event_id", "user_id", "event_type"))

    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema

    wh = _scratch_dir("gis_sink_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(("scratch",), "sink", from_spark_schema(src.schema))
    q = append_stream(src, t, wh + "/ckpt", trigger_once=True)
    _await_drained(q)
    t.refresh()
    return (t.to_df().groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n")))


@query(
    "timeseries_rolling_anomaly",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS b,
             round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2)
    SELECT event_type, b AS bucket_ts, v,
           round((v - avg(v) OVER w) / stddev_samp(v) OVER w, 4) AS z
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY b ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    QUALIFY count(*) OVER w >= 24
    """,
)
def rolling_anomaly_q(spark, sf):
    """Rolling anomaly score over the hourly event stream: z-score of each
    hour's total against the trailing 24-hour window (mean/stddev_samp) —
    the monitoring primitive on a regularized series. One shuffle to hourly
    buckets, then per-key ordered windows; windows only ever hold 24 rows
    of state per key."""
    e = load(spark, sf, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts"))
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-23, 0)
    return (
        hourly.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("z", F.round((F.col("v") - F.avg("v").over(w)) / F.stddev_samp("v").over(w), 4))
        .filter(F.col("_n") >= 24)
        .select("event_type", "bucket_ts", "v", "z")
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT 1 AS stage, 'view' AS event_type, CAST((SELECT count(*) FROM v) AS BIGINT) AS users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
    """,
)
def funnel_q(spark, sf):
    """Ordered conversion funnel (view -> click after it -> purchase after
    that): each stage is a user-keyed pre-aggregate joined back to the
    filtered events on user_id — per-stage cost is one shuffle on the user
    key, no event self-join, no window over the full stream. Stage inputs
    shrink monotonically, so AQE broadcasts the later stages' user sets."""
    e = load(spark, sf, "events")

    def stage(event_type: str, prev, prev_t: str, out_t: str):
        s = e.filter(F.col("event_type") == event_type)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return s.groupBy("user_id").agg(F.min("ts").alias(out_t))

    v = stage("view", None, "", "t1")
    c = stage("click", v, "t1", "t2")
    p = stage("purchase", c, "t2", "t3")
    rows = [(1, "view", v), (2, "click", c), (3, "purchase", p)]
    parts = [
        df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(stg).cast("int").alias("stage"),
            F.lit(name).alias("event_type"), "users")
        for stg, name, df in rows
    ]
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


@query(
    "cohort_weekly_retention",
    """
    WITH first AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cw,
             CAST(floor(date_diff('day', f.cw, CAST(date_trunc('week', e.ts) AS DATE)) / 7) AS INT)
               AS week_offset
      FROM events e JOIN first f ON e.user_id = f.user_id)
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY cw, week_offset
    ORDER BY cw, week_offset
    """,
)
def cohort_q(spark, sf):
    """Weekly cohort retention matrix: cohort = ISO week of a user's first
    event, cell (cohort, offset) = users from that cohort active offset
    weeks later. One user-keyed pre-aggregate joined back to events, then a
    distinct + one aggregate on the (cohort, offset) pair — the fact stream
    shuffles twice total, both on bounded keys."""
    e = load(spark, sf, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    act = (
        e.join(first, "user_id")
        .select("user_id", "cohort_week",
                F.floor(F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                                   F.col("cohort_week")) / 7).cast("int").alias("week_offset"))
        .distinct()
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
        .select(F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
                "week_offset", "n_users")
    )


@query(
    "scalar_json_functions",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def scalar_json_q(spark, sf):
    """JSON scalar functions: extract a field from the events props JSON
    column and aggregate — get_json_object runs JVM-side inside codegen, no
    UDF."""
    e = load(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).cast("long").alias("sum_k"),
             F.round(F.avg(k), 4).alias("avg_k"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "text_pii_redaction",
    """
    WITH synth AS (
      SELECT doc_id,
             'reach user' || CAST(doc_id AS VARCHAR) || ' at u' || CAST(doc_id AS VARCHAR)
               || '@mail.example.com or +1-555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
               || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 re: ' || text AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}', '<PHONE>', 'g'),
             '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS text
    FROM synth
    """,
)
def pii_redaction_q(spark, sf):
    """PII scrub (emails/phones/IPv4 → placeholder tokens, the pre-training
    redaction pass): PII is synthesized deterministically from doc_id so the
    patterns actually fire on this corpus, then the frozen regex chain
    (operators/text.py PII_PATTERNS, Java/RE2-common subset) redacts it
    identically in both engines."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("reach user"), F.col("doc_id").cast("string"),
            F.lit(" at u"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 re: "), F.col("text"),
        ).alias("text"),
    )
    return X.redact_pii(d, "text")


@query(
    "decontaminate_against_eval",
    """
    WITH docs AS (SELECT doc_id, source, text FROM documents),
    toks AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM docs),
    grams AS (
      SELECT doc_id, source, array_to_string(t[i+1 : i+4], ' ') AS g
      FROM (SELECT doc_id, source, t, unnest(generate_series(0, greatest(len(t) - 4, 0))) AS i FROM toks)),
    ev AS (SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS _h
           FROM grams WHERE source = 'src0'),
    tr AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS _h
           FROM grams WHERE source <> 'src0')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_ngrams
    FROM tr JOIN ev USING (_h) GROUP BY doc_id
    """,
)
def decontaminate_q(spark, sf):
    """Train-test overlap (decontamination): training docs (source != src0)
    sharing any word-4-gram with the held-out eval slice (source = src0),
    with distinct overlapping-gram counts — the n-gram collision filter run
    before training. Eval-side hashes are tiny → AQE broadcasts them; the
    training corpus is scanned once and never shuffled before the hit
    aggregate."""
    docs = load(spark, sf, "documents")
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    return D.contamination(train, ev, "doc_id", "text", n=4)


def _simhash_oracle_sql() -> str:
    B, BB, NB = D.SIMHASH_BITS, D.SIMHASH_BAND_BITS, D.SIMHASH_NUM_BANDS
    band_rows = "\n      UNION ALL ".join(
        f"SELECT _id, simhash, {band} AS _band, (simhash >> {band * BB}) & {(1 << BB) - 1} AS _bh FROM fp"
        for band in range(NB)
    )
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    toks AS (
      SELECT DISTINCT doc_id AS _id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS _h
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM corpus)),
    votes AS (
      SELECT _id, i AS bit, sum(CASE WHEN (_h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM toks, generate_series(0, {B - 1}) AS gs(i) GROUP BY 1, 2),
    fp AS (
      SELECT _id, sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
      FROM votes GROUP BY _id),
    bands AS ({band_rows}),
    pairs AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b, a.simhash AS fa, b.simhash AS fb
      FROM bands a JOIN bands b ON a._band = b._band AND a._bh = b._bh AND a._id < b._id)
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
    FROM pairs WHERE bit_count(xor(fa, fb)) <= 3
    """


@query("dedup_simhash", _simhash_oracle_sql(), bench=True)
def simhash_q(spark, sf):
    out = D.simhash_pairs(_corpus(spark, sf), "doc_id", "text", max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _simhash_wide_oracle_sql() -> str:
    B = D.SIMHASH_BITS
    half = B // 2
    mask = (1 << half) - 1
    bands = "\n      UNION ALL ".join([
        f"SELECT _id, hi, lo, 0 AS _band, hi & {mask} AS _bh FROM fp",
        f"SELECT _id, hi, lo, 1 AS _band, (hi >> {half}) & {mask} AS _bh FROM fp",
        f"SELECT _id, hi, lo, 2 AS _band, lo & {mask} AS _bh FROM fp",
        f"SELECT _id, hi, lo, 3 AS _band, (lo >> {half}) & {mask} AS _bh FROM fp",
    ])
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    toks AS (
      SELECT DISTINCT doc_id AS _id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS _h,
             ('0x' || substr(md5(tok), 16, 15))::BIGINT AS _h2
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM corpus)),
    votes AS (
      SELECT _id, i AS bit,
             sum(CASE WHEN (_h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v,
             sum(CASE WHEN (_h2 >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v2
      FROM toks, generate_series(0, {B - 1}) AS gs(i) GROUP BY 1, 2),
    fp AS (
      SELECT _id,
             sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS hi,
             sum(CASE WHEN v2 > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS lo
      FROM votes GROUP BY _id),
    bands AS ({bands}),
    pairs AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b,
             a.hi AS fha, a.lo AS fla, b.hi AS fhb, b.lo AS flb
      FROM bands a JOIN bands b ON a._band = b._band AND a._bh = b._bh AND a._id < b._id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(fha, fhb)) + bit_count(xor(fla, flb)) AS INT) AS hamming
    FROM pairs WHERE bit_count(xor(fha, fhb)) + bit_count(xor(fla, flb)) <= 3
    """


@query("dedup_simhash_wide", _simhash_wide_oracle_sql())
def simhash_wide_q(spark, sf):
    """120-bit SimHash near-dup pairs (r12, the SCALING_r12 named fix):
    dedup_simhash's 15-bit band keys saturate at ~2^15 docs — beyond that,
    RANDOM band collisions grow candidates quadratically (measured sf3→sf10,
    the audit's one super-linear query). The wide variant votes two 60-bit
    words from the same per-token md5 and bands at 30 bits, cutting the
    random-collision constant by 2^15 — candidate growth stays linear to
    corpora ~32,768x larger. Same oracle recipe, both words replayed in
    DuckDB."""
    out = D.simhash_wide_pairs(_corpus(spark, sf), "doc_id", "text", max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


_DOT_SQL = "list_sum(list_transform(generate_series(1, len({a})), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"


def _cosine_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    na = f"sqrt({_DOT_SQL.format(a=a, b=a)})"
    nb = f"sqrt({_DOT_SQL.format(a=b, b=b)})"
    return f"({dot} / ({na} * {nb}))"


@query(
    "similarity_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_cosine_sql('q.qv', 'e.embedding')} AS c
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """,
    bench=True,
)
def cosine_topk_q(spark, sf):
    """Exact brute-force cosine top-k, query side broadcast (the baseline ANN
    path; LSH/IVF below are the scale paths)."""
    emb = load(spark, sf, "embeddings")
    return S.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), id_col="vec_id", vec_col="embedding", k=5)


@query(
    "similarity_knn_classify",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 17 = 0 AND vec_id < 3400),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS lbl,
             {_cosine_sql('q.qv', 'e.embedding')} AS c
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, lbl, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      FROM scored),
    votes AS (SELECT query_id, lbl, count(*) AS votes FROM ranked WHERE rnk <= 5 GROUP BY query_id, lbl)
    SELECT query_id, lbl AS predicted_label, votes FROM (
      SELECT query_id, lbl, votes,
             row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, lbl ASC) AS vr
      FROM votes) WHERE vr = 1
    """,
    bench=True,
)
def knn_classify_q(spark, sf):
    """kNN classification over the embedding corpus (r9): each held-out
    query's label is the majority label of its exact cosine top-5 — the
    standard embedding-quality / label-propagation eval for a curated
    corpus. Deterministic vote (neighbor ties by id, label ties toward the
    smaller label) so the oracle reproduces bit-for-bit. Corpus scanned
    twice (top-k + label join against the broadcast neighbor list), never
    shuffled. The query set is CAPPED (<=200 ids) so the fixture scales
    linearly in the corpus — an uncapped modulo predicate grew queries
    WITH the corpus and turned the brute-force eval quadratic (measured
    188 s at sf1); real evals hold the query set fixed.

    r12 (optimization round): scoring now uses the GEMM path — one BLAS
    matrix product per Arrow corpus batch instead of the per-pair
    interpreted expression fold (guide §4.2: hand whole batches to
    vectorized native code). The RESULT is unchanged and stays pinned to
    the same oracle: this row and ``similarity_knn_gemm`` have graded
    hash-matches against the IDENTICAL oracle SQL at every checked SF, so
    the BLAS summation-order noise (~1e-15) provably never crosses a
    top-k margin on this corpus. The fold scorer remains available
    (``method="fold"``) and fold-vs-gemm equality is pinned in pytest."""
    emb = load(spark, sf, "embeddings")
    return S.knn_classify(emb, emb.filter((F.col("vec_id") % 17 == 0)
                                          & (F.col("vec_id") < 3400)),
                          id_col="vec_id", vec_col="embedding",
                          label_col="label", k=5, method="gemm")


@query(
    "similarity_knn_gemm",
    QUERIES["similarity_knn_classify"].oracle,  # same semantics, same oracle
    bench=True,
)
def knn_classify_gemm_q(spark, sf):
    """kNN classification with the GEMM scoring path (r11): same query set,
    vote, and oracle as ``similarity_knn_classify``, but neighbor scoring
    is ONE numpy matrix product per Arrow corpus batch (each batch emits
    <= k candidates per query; global reduce is a window over
    partitions x queries x k rows) instead of the per-pair expression
    fold — measured 22x faster at sf1 on an idle box (18.2 s -> 0.8 s,
    identical output). Grading it against the SAME oracle pins that the BLAS path's
    summation-order noise (~1e-15) never crosses a top-k margin on this
    corpus — the fold row stays as the bit-exact reference."""
    emb = load(spark, sf, "embeddings")
    return S.knn_classify(emb, emb.filter((F.col("vec_id") % 17 == 0)
                                          & (F.col("vec_id") < 3400)),
                          id_col="vec_id", vec_col="embedding",
                          label_col="label", k=5, method="gemm")


def _mmr_oracle_sql(qmax: int = 8, n_cand: int = 10, k: int = 5, lam: float = 0.7) -> str:
    """MMR greedy unrolled as k argmax rounds — the same rounds, cosine
    primitive, tie-breaks, and exact double constants as
    similarity.mmr_rerank, so DuckDB replays the selection bit-for-bit."""
    cos_qc = _cosine_sql("q.qv", "e.embedding")
    cos_ab = _cosine_sql("a.cv", "b.cv")
    steps = []
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        steps.append(f"""
    s{i} AS (SELECT query_id, cand_id, {i} AS mmr_rank FROM (
        SELECT c.query_id, c.cand_id,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY ({lam!r} * c.rel - {(1.0 - lam)!r} * m.msim) DESC, c.cand_id) AS rn
        FROM c JOIN (SELECT p.query_id, p.cand_id, max(p.sim) AS msim
                     FROM p JOIN {prev} s ON p.query_id = s.query_id AND p.other_id = s.cand_id
                     GROUP BY p.query_id, p.cand_id) m
          ON c.query_id = m.query_id AND c.cand_id = m.cand_id
        WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                          WHERE s.query_id = c.query_id AND s.cand_id = c.cand_id)
      ) WHERE rn = 1),
    sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT query_id, cand_id, mmr_rank FROM s{i})""")
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {qmax}),
    c0 AS (SELECT q.query_id, e.vec_id AS cand_id, e.embedding AS cv, {cos_qc} AS rel
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    c AS (SELECT query_id, cand_id, cv, rel FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
            FROM c0) WHERE rn <= {n_cand}),
    p AS (SELECT a.query_id, a.cand_id, b.cand_id AS other_id, {cos_ab} AS sim
          FROM c a JOIN c b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
    sel1 AS (SELECT query_id, cand_id, 1 AS mmr_rank FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
        FROM c) WHERE rn = 1),{",".join(steps)}
    SELECT query_id, cand_id, CAST(mmr_rank AS INT) AS mmr_rank FROM sel{k}
    """


@query("similarity_mmr_rerank", _mmr_oracle_sql(), bench=True)
def mmr_rerank_q(spark, sf):
    """Maximal Marginal Relevance re-ranking (r9): diversity-aware top-5
    from a cosine top-10 candidate pool per query — the RAG context
    selection / dedup-at-retrieval combiner. The greedy is unrolled as
    five identical argmax rounds in BOTH engines with the same
    sequential-fold cosine and the same double constants, so the oracle
    replays the selection exactly. All post-candidate work operates on
    <=10-row per-query pools (pairwise table <=90 rows/query) — the
    corpus is scanned once."""
    emb = load(spark, sf, "embeddings")
    return S.mmr_rerank(emb, emb.filter(F.col("vec_id") < 8),
                        id_col="vec_id", vec_col="embedding",
                        n_candidates=10, k=5, lam=0.7)


def _lsh_topk_oracle_sql(qmax: int = 10) -> str:
    planes = D.__dict__  # noqa: F841 - constants below come from similarity
    n_planes = S.LSH_PLANES
    # bucket bit j: sign of sum_d v[d+1] * plane(j, d)
    proj = lambda j, v: (  # noqa: E731
        f"list_sum(list_transform(generate_series(1, len({v})), i -> CAST({v}[i] AS DOUBLE) * "
        f"((('0x' || substr(md5('plane_{j}_' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % {S.PLANE_MOD} - 1000) / 1000.0)))"
    )
    bucket = lambda v: " + ".join(f"(CASE WHEN {proj(j, v)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n_planes))  # noqa: E731
    return f"""
    WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv, ({bucket('embedding')}) AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, ({bucket('embedding')}) AS bucket
          FROM embeddings WHERE vec_id < {qmax}),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {_cosine_sql('q.qv', 'c.cv')} AS cos
      FROM c JOIN q ON c.bucket = q.bucket WHERE c.neighbor_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """


@query("similarity_lsh_topk", _lsh_topk_oracle_sql())
def lsh_topk_q(spark, sf):
    """Random-hyperplane LSH ANN: bucket equi-join + in-bucket rerank.
    ``dim=64`` asserts the fixture's embedding width (r13) so the plane
    literals embed 8x64 doubles instead of 8x1024 — bit-identical buckets
    (planes are sliced to each vector's length either way; a wider vector
    now fails loudly), ~0.5 s less static analyzer time per invocation."""
    emb = load(spark, sf, "embeddings")
    return S.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), id_col="vec_id",
                      vec_col="embedding", k=5, dim=64)


@query(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.4
    """,
)
def emb_dedup_q(spark, sf):
    out = D.embedding_near_dup_pairs(load(spark, sf, "embeddings"), "vec_id", "embedding", threshold=0.4)
    return out.select("id_a", "id_b")


@query(
    "text_token_count",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
           CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> length(x) > 0))
                + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_bpe_ish
    FROM documents
    """,
)
def token_count_q(spark, sf):
    """Whitespace token count + sub-word-ish count (word-char runs + punct
    chars — the cheap BPE proxy)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        X.token_count_expr(F.col("text")).alias("n_tokens"),
        X.bpe_ish_token_count_expr(F.col("text")).alias("n_bpe_ish"),
    )


def _quality_cte(src: str = "documents") -> str:
    """Quality-score CTE chain (feats -> qual) over ``src`` — the SQL twin
    of operators/text.py quality_score, parametric in the source so
    composed pipelines can score a deduped corpus."""
    return f"""
    feats AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS punct_ratio,
             CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       x -> lower(x) IN ({', '.join("'" + w + "'" for w in X.LANG_STOPWORDS['en'])}))) AS DOUBLE)
                       / len(regexp_split_to_array(trim(text), '\\s+')) END AS stopword_ratio
      FROM {src}),
    qual AS (
      SELECT doc_id,
             (least(n_tokens / 50.0, 1.0) * 0.4 + least(stopword_ratio * 5.0, 1.0) * 0.4)
               * greatest(1.0 - punct_ratio * 10.0, 0.0)
               + 0.2 * greatest(1.0 - punct_ratio * 10.0, 0.0) AS quality
      FROM feats)
"""


_QUALITY_CTE = _quality_cte("documents")


@query(
    "text_quality_score",
    f"WITH {_QUALITY_CTE} SELECT doc_id, quality FROM qual",
)
def quality_q(spark, sf):
    return X.quality_score(load(spark, sf, "documents"), "doc_id", "text")


@query(
    "text_quality_filter",
    f"""
    WITH {_QUALITY_CTE},
    q AS (SELECT doc_id, round(quality, 6) AS quality FROM qual),
    thr AS (SELECT round(quantile_cont(quality, 0.25), 6) AS _thr FROM q)
    SELECT doc_id, quality FROM q, thr WHERE quality >= _thr
    """,
)
def quality_filter_q(spark, sf):
    """Quantile quality filter (CCNet-style bucketing): drop the worst 25%
    of the corpus by frozen quality score. One scalar percentile aggregate
    broadcast over the corpus — no global sort. Exact percentile here so
    DuckDB reproduces the threshold bit-for-bit; the default approx_percentile
    sketch is the 100 TB path (operators/text.py quality_filter)."""
    return X.quality_filter(load(spark, sf, "documents"), "doc_id", "text",
                            min_quantile=0.25, exact=True)


@query(
    "text_repetition_scores",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    words AS (
      SELECT doc_id, count(DISTINCT w) AS du, count(*) AS nw
      FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY doc_id),
    bg AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
    tops AS (
      SELECT doc_id, max(c) AS topc, sum(c) AS total
      FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY doc_id)
    SELECT w.doc_id AS doc_id,
           round(1.0 - du * 1.0 / nw, 4) AS dup_word_frac,
           round(topc * 1.0 / total, 4) AS top_bigram_frac
    FROM words w JOIN tops USING (doc_id)
    """,
)
def text_repetition_q(spark, sf):
    """Gopher-style repetition quality signals (duplicate-word fraction +
    top-bigram fraction) — boilerplate/degenerate-text filters for a
    training-data pipeline (operators/text.py repetition_scores)."""
    return X.repetition_scores(load(spark, sf, "documents"), "doc_id", "text")


@query(
    "sample_stratified_mix",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE ('0x' || substr(md5('mix_' || coalesce(CAST(o_orderkey AS VARCHAR), '<<null>>')), 1, 15))::BIGINT % 100 <
          CASE o_orderpriority WHEN '1-URGENT' THEN 50 WHEN '2-HIGH' THEN 20 ELSE 5 END
    """,
)
def sample_stratified_q(spark, sf):
    """Deterministic dataset mixing (operators/sampling.py): keep 50% of
    URGENT, 20% of HIGH, 5% of everything else, decided by portable hash of
    the row id — reproducible on any engine at any parallelism, and a pure
    stateless filter (no shuffle, no RNG state)."""
    from .operators.sampling import stratified_hash_sample

    o = load(spark, sf, "orders")
    return stratified_hash_sample(
        o, "o_orderkey", "o_orderpriority",
        {"1-URGENT": 50, "2-HIGH": 20}, default_pct=5, salt="mix",
    ).select("o_orderkey", "o_orderpriority")


@query(
    "sample_split_train_eval",
    """
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             CASE
               WHEN ('0x' || substr(md5('cut_' || coalesce(CAST(doc_id AS VARCHAR), '<<null>>')), 1, 15))::BIGINT % 100 < 90 THEN 'train'
               WHEN ('0x' || substr(md5('cut_' || coalesce(CAST(doc_id AS VARCHAR), '<<null>>')), 1, 15))::BIGINT % 100 < 95 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents)
    SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, lang
    """,
)
def sample_split_q(spark, sf):
    """Deterministic 90/5/5 train/val/test split (operators/sampling.py
    hash_split): disjoint + exhaustive by construction from ONE portable
    hash with contiguous buckets, zero shuffle — then a per-(split, lang)
    size audit, the table a data-curation run reports before training."""
    from .operators.sampling import hash_split

    d = load(spark, sf, "documents")
    return (
        hash_split(d, "doc_id", {"train": 90, "val": 5, "test": 5}, salt="cut")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").cast("long").alias("total_chars"))
    )


@query(
    "sample_temperature_mix",
    """
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    cw AS (SELECT source, n,
                  CAST(floor(pow(CAST(n AS DOUBLE), 0.5) * 1048576) AS BIGINT) AS wq
           FROM counts),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(wq) AS BIGINT) AS w FROM cw),
    rates AS (SELECT source,
                     CAST(floor(least(1.0, 0.5 * nn * wq / w / n) * 1000000) AS BIGINT) AS ppm
              FROM cw, tot),
    kept AS (
      SELECT d.doc_id, d.source FROM documents d JOIN rates ON d.source IS NOT DISTINCT FROM rates.source
      WHERE ('0x' || substr(md5('tmix_' || coalesce(CAST(doc_id AS VARCHAR), '<<null>>')), 1, 15))::BIGINT % 1000000 < ppm)
    SELECT source, count(*) AS n_kept FROM kept GROUP BY source
    """,
)
def sample_temperature_q(spark, sf):
    """Temperature-based source mixing (T5/PaLM mixture rule, T=2): small
    sources upweighted toward sqrt-share, half the corpus kept in
    expectation — stratum rates are a tiny broadcast, the keep decision a
    stateless per-row hash filter (operators/sampling.py temperature_mix)."""
    from .operators.sampling import temperature_mix

    d = load(spark, sf, "documents")
    return (
        temperature_mix(d, "doc_id", "source", temperature=2.0, target_fraction=0.5)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    )


@query(
    "embedding_int8_quantize",
    f"""
    WITH qt AS (
      SELECT vec_id,
             list_transform(embedding, x -> CASE
               WHEN sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) > 0
               THEN CAST(round(127.0 * CAST(x AS DOUBLE)
                               / sqrt({_DOT_SQL.format(a='embedding', b='embedding')}), 0) AS INT)
               ELSE 0 END) AS qvec,
             round(sqrt({_DOT_SQL.format(a='embedding', b='embedding')}), 6) AS norm
      FROM embeddings)
    SELECT vec_id, CAST(generate_subscripts(qvec, 1) - 1 AS INT) AS i,
           unnest(qvec) AS q, norm
    FROM qt
    """,
)
def int8_quantize_q(spark, sf):
    """Scalar int8 quantization for ANN serving: L2-normalize and map each
    component to round(127 * x/norm) — fp32 -> int8 is a 4x memory cut with
    integer dot products downstream. Pure higher-order functions, linear,
    no shuffle. The operator returns (vec_id, qvec array<int>, norm); the
    GRADED shape posexplodes qvec to scalar (vec_id, i, q, norm) rows
    because the driver's canonicalizer sorts/hashes column values and
    cannot order an array column (r5's only never-green row)."""
    out = S.quantize_int8(load(spark, sf, "embeddings"))
    return out.select(
        "vec_id",
        F.posexplode("qvec").alias("i", "q"),
        "norm",
    )


@query(
    "join_fuzzy_entity_match",
    """
    WITH dirty AS (
      SELECT s_suppkey AS dirty_id, substr(s_name, 1, 17) || 'X' AS dirty_name
      FROM supplier WHERE s_suppkey % 3 = 0)
    SELECT d.dirty_id, s.s_suppkey AS matched_id,
           CAST(levenshtein(d.dirty_name, s.s_name) AS INT) AS dist
    FROM dirty d JOIN supplier s
      ON substr(d.dirty_name, 1, 16) = substr(s.s_name, 1, 16)
    WHERE levenshtein(d.dirty_name, s.s_name) <= 1
    """,
)
def fuzzy_entity_match_q(spark, sf):
    """Entity resolution / fuzzy dedup: supplier names with a synthesized
    trailing typo retrieve their within-distance CANDIDATE SET via prefix
    blocking + in-block levenshtein (operators/joins.py fuzzy_match_join) —
    no all-pairs join, the blocking key bounds every group; ambiguous
    candidates are retained for downstream adjudication, the standard
    two-stage ER shape."""
    sup = load(spark, sf, "supplier")
    dirty = (sup.filter(F.col("s_suppkey") % 3 == 0)
             .select(F.col("s_suppkey").alias("dirty_id"),
                     F.concat(F.substring("s_name", 1, 17), F.lit("X")).alias("dirty_name")))
    out = J.fuzzy_match_join(dirty, sup.select("s_suppkey", "s_name"),
                             "dirty_name", "s_name", max_dist=1, block_len=16)
    return (out.join(sup, out._match == sup.s_name)
            .select("dirty_id", F.col("s_suppkey").alias("matched_id"), "dist"))


@query(
    "sample_weighted_topk",
    """
    WITH scored AS (
      SELECT doc_id, text, lang, source, n_chars,
             round(ln((('0x' || substr(md5('wsample_' || coalesce(CAST(doc_id AS VARCHAR), '<<null>>')), 1, 15))::BIGINT
                       + 1.0) / 1152921504606846976.0) / n_chars, 9) AS _ws
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, text, lang, source, n_chars FROM scored
    ORDER BY _ws DESC, doc_id LIMIT 100
    """,
)
def weighted_sample_q(spark, sf):
    """Weighted sampling without replacement (Efraimidis-Spirakis): each doc
    scores ln(u)/weight with u drawn deterministically from its hashed id,
    top-k wins — inclusion probability proportional to n_chars. Stable
    across engines/re-runs; Spark plans the top-k as TakeOrdered, never a
    full sort."""
    from .operators.sampling import weighted_sample

    return weighted_sample(load(spark, sf, "documents"), "doc_id", "n_chars", 100)


@query(
    "pack_token_budget_bins",
    """
    WITH d AS (SELECT doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END AS n_tokens
               FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 ('0x' || substr(md5(coalesce(CAST(doc_id AS VARCHAR), '<<null>>')), 1, 15))::BIGINT % 8 AS shard
          FROM d),
    c AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum FROM s)
    SELECT doc_id, n_tokens, shard,
           shard * 1000000000 + cum // 2048 AS bin_id,
           cum % 2048 AS bin_offset
    FROM c
    """,
)
def pack_token_budget_q(spark, sf):
    """LLM sample packing (operators/sampling.py): documents sharded by
    hash, greedily packed into ~2048-token bins within each shard via a
    per-shard running-sum window — no global window serializing the corpus
    through one task."""
    from .operators.sampling import pack_by_token_budget

    d = load(spark, sf, "documents").select(
        "doc_id", X.token_count_expr(F.col("text")).alias("n_tokens"))
    return pack_by_token_budget(d, "doc_id", "n_tokens", 2048, n_shards=8).select(
        "doc_id", "n_tokens", "shard", "bin_id", "bin_offset")


def _langid_oracle_sql() -> str:
    score_cols = []
    for lang, sw in X.LANG_STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in sw)
        score_cols.append(
            f"len(list_filter(toks, x -> lower(x) IN ({inlist}))) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in X.LANG_ORDER) + ")"
    case = "CASE "
    for lang in X.LANG_ORDER:
        case += f"WHEN s_{lang} = {best} THEN '{lang}' "
    case += "END"
    return f"""
    WITH toks_t AS (
      SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
      FROM documents),
    scored AS (SELECT doc_id, {", ".join(score_cols)} FROM toks_t)
    SELECT doc_id, CASE WHEN {best} > 0 THEN {case} ELSE 'und' END AS pred_lang FROM scored
    """


@query("text_lang_id", _langid_oracle_sql())
def langid_q(spark, sf):
    return X.lang_id(load(spark, sf, "documents"), "doc_id", "text")


_HASHVEC_SUMS_SQL = """
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM documents WHERE length(trim(text)) > 0),
    sums AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT % 32 AS b,
             sum(CASE WHEN ('0x' || substr(md5(t), 16, 1))::BIGINT % 2 = 0
                      THEN 1.0 ELSE -1.0 END) AS v
      FROM toks GROUP BY 1, 2)"""


@query(
    "text_hashing_vectorize",
    f"""
    WITH {_HASHVEC_SUMS_SQL}
    SELECT d.doc_id, CAST(g.i AS INT) AS i, CAST(coalesce(s.v, 0.0) AS DOUBLE) AS val
    FROM documents d CROSS JOIN generate_series(0, 31) AS g(i)
    LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.b = g.i
    """,
)
def hashing_vectorize_q(spark, sf):
    """Feature-hashing vectorizer (hashing trick): signed token counts in 32
    buckets, model- and vocabulary-free — the standard text→vector path when
    no embedding service exists. Explode + map-side partial aggregation
    (the shuffle carries ≤ docs × dim tiny rows, never the token stream;
    measured 39% faster than the shuffle-free per-row fold at sf1 — see the
    operator docstring); graded in scalar (doc_id, i, val) shape. Entries
    are exact integer sums, so both engines agree bit-for-bit."""
    v = X.hashing_vectorize(load(spark, sf, "documents"), "doc_id", "text", dim=32)
    return v.select(
        "doc_id", F.posexplode("vec").alias("i", "val")
    ).select("doc_id", F.col("i").cast("int").alias("i"), F.col("val").alias("val"))


@query(
    "text_hashing_ann_topk",
    f"""
    WITH {_HASHVEC_SUMS_SQL},
    vecs AS (
      SELECT d.doc_id, list(CAST(coalesce(s.v, 0.0) AS DOUBLE) ORDER BY g.i) AS vec
      FROM documents d CROSS JOIN generate_series(0, 31) AS g(i)
      LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.b = g.i
      GROUP BY d.doc_id),
    nz AS (SELECT * FROM vecs
           WHERE sqrt(list_sum(list_transform(vec, x -> x * x))) > 0),
    q AS (SELECT doc_id AS query_id, vec AS qv FROM nz WHERE doc_id < 5),
    scored AS (
      SELECT q.query_id, c.doc_id AS neighbor_id, {{cos}} AS cs
      FROM nz c CROSS JOIN q WHERE c.doc_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """.format(cos=_cosine_sql("q.qv", "c.vec")),
)
def hashing_ann_q(spark, sf):
    """End-to-end text similarity WITHOUT a model: hashing-trick vectors
    feed the exact cosine top-k — raw text to nearest-neighbors entirely in
    built-in expressions (vectorize collapses tokens map-side before its
    one small shuffle; the ANN inherits cosine_topk's broadcast-query
    single-corpus-scan shape and its zero-norm pre-filter, which the
    oracle mirrors)."""
    v = X.hashing_vectorize(load(spark, sf, "documents"), "doc_id", "text", dim=32)
    return S.cosine_topk(v, v.filter(F.col("doc_id") < 5), id_col="doc_id", vec_col="vec", k=5)


@query(
    "text_dsir_importance",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t,
             (source = 'src0') AS tgt
      FROM documents WHERE length(trim(text)) > 0),
    feats AS (
      SELECT doc_id, tgt, unnest(t) AS f FROM toks
      UNION ALL
      SELECT doc_id, tgt, t[i + 1] || ' ' || t[i + 2] AS f
      FROM (SELECT doc_id, tgt, t, unnest(generate_series(0, len(t) - 2)) AS i
            FROM toks WHERE len(t) >= 2)),
    fb AS (SELECT doc_id, tgt, ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
           FROM feats),
    doc_b AS (SELECT doc_id, b, count(*) AS n FROM fb GROUP BY 1, 2),
    bc AS (SELECT b, count(*) AS cr,
                  sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
           FROM fb GROUP BY 1),
    tot AS (SELECT sum(cr) AS tcr, sum(ct) AS tct FROM bc),
    ratio AS (
      SELECT b, CAST(floor((ln((ct + 0.5) / (tct + 0.5 * 256))
                            - ln((cr + 0.5) / (tcr + 0.5 * 256))) * 1048576)
                AS BIGINT) AS qlr
      FROM bc, tot),
    scored AS (
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
             round(sum(n * qlr) / 1048576.0, 6) AS log_weight
      FROM doc_b JOIN ratio USING (b) GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
           CAST(coalesce(s.log_weight, 0.0) AS DOUBLE) AS log_weight
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def dsir_importance_q(spark, sf):
    """DSIR data selection (hashed n-gram importance resampling weights):
    log p_target/p_raw over unigram+bigram hash buckets, target = the
    trusted 'src0' slice. The two hashed LMs stay distributed (a
    <=256-row bucket table, broadcast back); the corpus' one wide
    shuffle carries per-doc bucket counts. Per-bucket log ratios are
    integer-quantized so both engines agree bit-for-bit."""
    d = load(spark, sf, "documents")
    return X.dsir_importance(d, "doc_id", "text", F.col("source") == "src0",
                             buckets=256)


@query(
    "multimodal_extract_features",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           ('0x' || substr(sha256(text), 1, 2))::INT / 255.0 AS feat_0
    FROM documents
    """,
)
def multimodal_q(spark, sf):
    """Binary media column → mapInPandas feature extraction (Arrow batch
    path); the decode is the documented deterministic stub."""
    d = M.attach_media(load(spark, sf, "documents"), "text")
    feats = M.extract_features(d, "doc_id")
    return feats.select(
        "doc_id", "n_bytes", "sha256",
        (F.element_at("features", 1)).alias("feat_0"),
    )


_MM_FEAT_SQL = ("list_transform(generate_series(1, 16), i -> "
                "CAST(('0x' || substr(sha256({t}), (i - 1) * 2 + 1, 2))::INT AS DOUBLE) / 255.0)")


@query(
    "multimodal_feature_ann_topk",
    f"""
    WITH feats AS (
      SELECT doc_id, {_MM_FEAT_SQL.format(t="text")} AS fv FROM documents),
    q AS (SELECT doc_id AS query_id, fv AS qv FROM feats WHERE doc_id < 3),
    scored AS (
      SELECT q.query_id, f.doc_id AS neighbor_id, {_cosine_sql("q.qv", "f.fv")} AS cs
      FROM feats f CROSS JOIN q WHERE f.doc_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """,
)
def multimodal_ann_q(spark, sf):
    """Multimodal pipeline composed end-to-end: binary media column →
    mapInPandas feature extraction (Arrow batch path, deterministic decode
    stub) → exact cosine top-k over the EXTRACTED feature vectors (media
    similarity search). Proves the media feature output plugs straight into
    the ANN operators — same broadcast-query, corpus-never-shuffled shape."""
    d = M.attach_media(load(spark, sf, "documents"), "text")
    feats = M.extract_features(d, "doc_id").select("doc_id", "features")
    return S.cosine_topk(feats, feats.filter(F.col("doc_id") < 3),
                         id_col="doc_id", vec_col="features", k=5)


@query(
    "multimodal_resize",
    """
    SELECT doc_id,
           sha256(substr(repeat(text, (768 // octet_length(encode(text))) + 1), 1, 768)) AS sha,
           CAST(768 AS BIGINT) AS n_bytes, 16 AS width, 16 AS height
    FROM documents
    """,
)
def multimodal_resize_q(spark, sf):
    """Image-resize plumbing over mapInPandas: output payload is exactly
    w*h*3 bytes (cycled-byte stub standing in for the pixel resample; text is
    ASCII so the DuckDB oracle reproduces the cycling with repeat+substr)."""
    d = M.attach_media(load(spark, sf, "documents"), "text")
    r = M.resize_images(d, "doc_id", width=16, height=16)
    return r.select(
        "doc_id", F.sha2(F.col("media_bytes"), 256).alias("sha"),
        F.octet_length("media_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("int").alias("width"), F.col("height").cast("int").alias("height"),
    )


@query(
    "multimodal_bmp_resize_checksum",
    """
    WITH ids AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h,
             doc_id % 97 AS seed
      FROM documents),
    px AS (
      SELECT i.doc_id, yo.g AS yo, xo.g AS xo,
             (xo.g * i.w) // 8 AS sx, (yo.g * i.h) // 8 AS sy, i.seed
      FROM ids i
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS g) yo
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS g) xo),
    hx AS (
      SELECT doc_id, yo, xo,
             printf('%02x%02x%02x',
                    (7 * sx + 13 * sy + seed) % 256,
                    (3 * sx + 5 * sy + seed) % 256,
                    (sx + sy + seed) % 256) AS h3
      FROM px)
    SELECT doc_id, md5(string_agg(h3, '' ORDER BY yo, xo)) AS pix_md5,
           CAST(192 AS BIGINT) AS n_bytes
    FROM hx GROUP BY doc_id
    """,
)
def multimodal_bmp_resize_q(spark, sf):
    """REAL pixel decode + nearest-neighbor resize (r12, VERDICT r11 task
    #7): per doc, a genuine uncompressed 24-bit BMP (closed-form pixels,
    dimensions 4+id%13 x 4+id%11) is decoded with stdlib struct — BGR
    flip, bottom-up flip, stride un-padding — and resampled to 8x8 with
    integer nearest-neighbor (sx = xo*w//8). The oracle recomputes every
    RGB byte arithmetically and md5s the hex stream, so one flipped
    channel, one off-by-one stride, or one wrong rounding direction
    hash-mismatches. No codec library anywhere; DuckDB's md5 is
    VARCHAR-only, so both engines hash the lowercase-hex rendering."""
    bmps = M.attach_synthetic_bmps(load(spark, sf, "documents"), "doc_id")
    rs = M.resize_images(bmps, "doc_id", width=8, height=8)
    return rs.select(
        "doc_id",
        F.md5(F.lower(F.hex("media_bytes"))).alias("pix_md5"),
        F.octet_length("media_bytes").cast("long").alias("n_bytes"),
    )


@query(
    "multimodal_frame_sample",
    """
    WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents),
    f AS (SELECT doc_id, text, L, g - 1 AS frame_idx, (g - 1) * 256 AS byte_offset
          FROM d, generate_series(1, 8) t(g)
          WHERE g <= least(8, greatest(1, L // 256)))
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, CAST(byte_offset AS BIGINT) AS byte_offset,
           CAST(least(256, L - byte_offset) AS BIGINT) AS n_frame_bytes,
           sha256(substr(text, CAST(byte_offset AS INT) + 1, 256)) AS frame_sha
    FROM f
    """,
)
def multimodal_frame_sample_q(spark, sf):
    """Video frame-sampling plumbing: one row per sampled frame, exploded
    inside the Arrow batch (the ffmpeg-backed pattern with a byte-slice
    stub). Frame payloads verified via sha256 against the oracle's substr."""
    d = M.attach_media(load(spark, sf, "documents"), "text")
    fr = M.sample_frames(d, "doc_id", every_n_bytes=256, max_frames=8)
    return fr.select(
        "doc_id", F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
        F.octet_length("frame_bytes").cast("long").alias("n_frame_bytes"),
        F.sha2(F.col("frame_bytes"), 256).alias("frame_sha"),
    )


@query(
    "multimodal_header_metadata",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS format,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE CAST(1 + (doc_id * 37) % 4096 AS INT) END AS width,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE CAST(1 + (doc_id * 59) % 4096 AS INT) END AS height
    FROM documents
    """,
)
def multimodal_header_metadata_q(spark, sf):
    """REAL image-header metadata extraction (r11, VERDICT task #5 —
    replaces the 'decode raises' stand-in): PNG IHDR / JPEG SOFn segment
    walk / GIF screen descriptor parsed with stdlib struct inside an
    Arrow-batched mapInPandas — no codec needed for format/width/height.
    The fixture payloads carry REAL container headers built from doc_id
    arithmetic (executor-side, never driver-materialized), so the oracle
    recomputes the expected dimensions directly and any parse slip —
    endianness, offset, marker-walk bug — hash-mismatches. Garbage rows
    (doc_id%13==0) pin the tolerance path: unrecognized bytes yield NULL
    metadata, never an exception (a 100 TB crawl always contains junk)."""
    docs = load(spark, sf, "documents").select("doc_id")
    built = M.attach_synthetic_images(docs, "doc_id")
    meta = M.decode_image_metadata(built, "doc_id")
    return meta.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


def _minhash_keep_oracle_sql() -> str:
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    pairs AS ({_minhash_oracle_sql()})
    SELECT c.doc_id FROM corpus c
    WHERE c.doc_id NOT IN (SELECT id_b FROM pairs)
    """


@query("dedup_minhash_keep_list", _minhash_keep_oracle_sql())
def dedup_keep_q(spark, sf):
    """End-to-end dedup POLICY, not just pair discovery: greedy keep-list
    dropping every doc with a lower-id near-dup (one anti-join over the
    MinHash-LSH pairs)."""
    c = _corpus(spark, sf)
    pairs = D.minhash_lsh_pairs(c, "doc_id", "text", n=3, mode="word", threshold=0.6)
    return D.keep_greedy(c, pairs, "doc_id").select("doc_id")


def _cc_oracle_sql() -> str:
    """Recursive oracle for connected components: the component of a node is
    the minimum id reachable from it, which DuckDB computes as a recursive
    transitive closure (UNION dedups visited (node, label) states, so cycles
    terminate) over the same LSH-verified pair graph."""
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs),
    walk (src, lbl) AS (
      SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT e.src, w.lbl FROM edges e JOIN walk w ON e.dst = w.src)
    SELECT src AS doc_id, min(lbl) AS component FROM walk GROUP BY src
    """


@query("dedup_connected_components", _cc_oracle_sql())
def dedup_cc_q(spark, sf):
    """Connected components over the near-dup graph via alternating
    large-star/small-star contraction — O(log n) rounds independent of the
    graph diameter (driver loop only checks per-round convergence counts;
    labels stay distributed). The DuckDB oracle expresses the same fixpoint
    as a recursive transitive closure. Also covered by exact value
    assertions in tests/test_plans.py::test_connected_components_semantics,
    and by the adversarial planted graph in ``dedup_cc_adversarial``."""
    c = _corpus(spark, sf)
    pairs = D.minhash_lsh_pairs(c, "doc_id", "text", n=3, mode="word", threshold=0.6)
    return D.connected_components(pairs).withColumnRenamed("id", "doc_id")


def _pagerank_oracle_sql(iterations: int = 3, damping: float = 0.85) -> str:
    prev = "pr0"
    iters = []
    for i in range(1, iterations + 1):
        iters.append(f"""
    pr{i} AS (
      SELECT p.src, p._deg, p._n,
             round({1.0 - damping} / p._n + {damping} * s._s, 6) AS pr
      FROM {prev} p JOIN (
        SELECT e.dst AS _to, sum(q.pr / q._deg) AS _s
        FROM edges e JOIN {prev} q ON e.src = q.src GROUP BY e.dst
      ) s ON p.src = s._to)""")
        prev = f"pr{i}"
    return f"""
    WITH pairs AS ({_minhash_oracle_sql()}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS _deg FROM edges GROUP BY src),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM deg),
    pr0 AS (SELECT src, _deg, _n, round(1.0 / _n, 6) AS pr FROM deg CROSS JOIN n1),
    {','.join(iters)}
    SELECT src AS doc_id, pr FROM {prev}
    """


@query("dedup_pagerank_canonical", _pagerank_oracle_sql())
def pagerank_q(spark, sf):
    """PageRank over the near-dup graph (3 fixed iterations): rank
    concentrates on documents with many near-duplicates — the canonical-copy
    signal for keep-list selection. Iterative distributed joins in Spark;
    the oracle unrolls the same three damped-sum iterations as CTEs, with
    ranks re-rounded each step so both engines iterate on identical
    doubles."""
    c = _corpus(spark, sf)
    pairs = D.minhash_lsh_pairs(c, "doc_id", "text", n=3, mode="word", threshold=0.6)
    return D.pagerank(pairs).withColumnRenamed("id", "doc_id")


_CC_STAR_SHIFT = 1_000_000_000_000  # star node ids = event_id + this (keyspaces disjoint)


def _cc_adversarial_oracle_sql() -> str:
    """Closed-form oracle for the planted adversarial graph: the chain's
    component is the smallest doc_id among its nodes and the star's is the
    hub — both known analytically from the construction, so the oracle
    states the answer directly instead of enumerating an O(n^2) recursive
    closure over the 10k-degree hub."""
    return f"""
    WITH chain_nodes AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents)
      WHERE rn <= 51),
    star_nodes AS (SELECT event_id + {_CC_STAR_SHIFT} AS id FROM events)
    SELECT doc_id AS id,
           (SELECT min(doc_id) FROM chain_nodes) AS component FROM chain_nodes
    UNION ALL
    SELECT id, (SELECT min(id) FROM star_nodes) AS component FROM star_nodes
    """


@query("dedup_cc_adversarial", _cc_adversarial_oracle_sql())
def dedup_cc_adversarial_q(spark, sf):
    """Connected components on a PLANTED adversarial graph (r12, VERDICT r11
    task #3): a 50-hop chain (the 51 smallest doc_ids linked consecutively)
    unioned with a maximal star (every event_id attached to the smallest,
    ~10k-degree hub at sf0.01). Min-label propagation needs diameter = 50
    rounds on the chain and melts on the hub's degree; the alternating
    large-star/small-star contraction lands both in O(log n) rounds
    (iteration count pinned < 10 in tests/test_operators.py). The oracle is
    the construction's closed-form answer. The chain/star builders are test
    -graph constructors, not pipeline shapes — the 51-row window and 1-row
    min are driver-bounded by design."""
    docs = load(spark, sf, "documents").select("doc_id").orderBy("doc_id").limit(51)
    w = Window.orderBy("doc_id")
    chain = (docs.withColumn("_nxt", F.lead("doc_id").over(w))
             .filter(F.col("_nxt").isNotNull())
             .select(F.col("doc_id").alias("id_a"), F.col("_nxt").alias("id_b")))
    ev = load(spark, sf, "events").select(
        (F.col("event_id") + F.lit(_CC_STAR_SHIFT)).alias("sid"))
    hub = ev.agg(F.min("sid").alias("hub"))
    star = (ev.crossJoin(F.broadcast(hub))
            .filter(F.col("sid") != F.col("hub"))
            .select(F.col("hub").alias("id_a"), F.col("sid").alias("id_b")))
    return (D.connected_components(chain.unionByName(star))
            .select(F.col("id"), F.col("component")))


def _keep_best_oracle_sql() -> str:
    """Recursive CC over the LSH pair graph + the quality CTE chain over the
    SAME planted corpus; within each component only the top row by
    round(quality, 6) (ties -> lowest doc_id) survives."""
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs),
    walk (src, lbl) AS (
      SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT e.src, w.lbl FROM edges e JOIN walk w ON e.dst = w.src),
    comp AS (SELECT src AS doc_id, min(lbl) AS component FROM walk GROUP BY src),
    corpus2 AS ({_CORPUS_SQL}),
    {_quality_cte("corpus2").strip().rstrip(chr(10))},
    ranked AS (
      SELECT c.doc_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY round(q.quality, 6) DESC, c.doc_id) AS rnk
      FROM comp c JOIN qual q USING (doc_id))
    SELECT d.doc_id FROM corpus2 d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rnk > 1)
    """


@query("dedup_keep_best_quality", _keep_best_oracle_sql())
def keep_best_quality_q(spark, sf):
    """Quality-aware dedup keep-list: connected components over the
    LSH-verified near-dup graph elect the HIGHEST-QUALITY representative of
    each duplicate cluster (ties -> lowest id); singletons pass through.
    The production counterpart of dedup_minhash_keep_list's min-id policy —
    at 100 TB the kept corpus should maximize quality, not id order. CC is
    bounded-iteration label propagation; the election is one per-component
    window; the keep-list is a single anti-join."""
    c = _corpus(spark, sf)
    pairs = D.minhash_lsh_pairs(c, "doc_id", "text", n=3, mode="word", threshold=0.6)
    scores = X.quality_score(c, "doc_id", "text")
    return D.keep_best_quality(c, pairs, scores, "doc_id").select("doc_id")


# ---------------------------------------------------------------------------
# Relational coverage widening: outer joins, pivot, percentiles, grouping
# sets, range-frame windows, array functions
# ---------------------------------------------------------------------------


@query(
    "join_outer_full",
    """
    WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier WHERE s_suppkey < 40 GROUP BY s_nationkey)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, c.n_cust AS n_cust, s.n_supp AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_outer_full(spark, sf):
    """FULL OUTER join of two aggregates; the supplier side is restricted so
    both null-padded sides actually occur."""
    c = load(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_cust"))
    s = (load(spark, sf, "supplier").filter(F.col("s_suppkey") < 40)
         .groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count(F.lit(1)).alias("n_supp")))
    return (c.join(s, on="nationkey", how="full_outer")
            .select("nationkey", "n_cust", "n_supp"))


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]


@query(
    "pivot_priority_by_year",
    "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
    + ", ".join(
        f"count(*) FILTER (WHERE o_orderpriority = '{p}') AS {a}"
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
    )
    + " FROM orders GROUP BY 1",
)
def pivot_priority_by_year(spark, sf):
    """Pivot (orders per priority per year) — groupBy().pivot() with explicit
    values so no extra distinct-values job runs; absent cells coalesced to 0
    to match SQL's count FILTER."""
    o = load(spark, sf, "orders").withColumn("o_year", F.year("o_orderdate").cast("int"))
    p = o.groupBy("o_year").pivot("o_orderpriority", _PRIORITIES).count()
    return p.select(
        "o_year",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(a)
          for v, a in zip(_PRIORITIES, _PRIORITY_ALIASES)],
    )


_PERCENTILES_SQL = """
    WITH s AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), p AS (
      SELECT 50 AS pp UNION ALL SELECT 90 UNION ALL SELECT 99
    ), b AS (
      SELECT s.rf, p.pp, max(s.n) AS n,
             max(CASE WHEN s.rn = CAST(floor(p.pp * (s.n - 1) / 100.0) AS BIGINT)
                      THEN s.cents END) AS c_lo,
             max(CASE WHEN s.rn = CAST(floor(p.pp * (s.n - 1) / 100.0) AS BIGINT)
                               + (CASE WHEN (p.pp * (s.n - 1)) % 100 = 0 THEN 0 ELSE 1 END)
                      THEN s.cents END) AS c_hi
      FROM s CROSS JOIN p
      GROUP BY s.rf, p.pp
    ), v AS (
      SELECT rf, pp, n,
             CAST(floor((c_lo * 100 + ((pp * (n - 1)) % 100) * (coalesce(c_hi, c_lo) - c_lo)
                         + 50) / 100.0) AS BIGINT) AS rc
      FROM b
    )
    SELECT rf AS l_returnflag,
           CAST(max(CASE WHEN pp = 50 THEN rc END) AS DOUBLE) / 100 AS p50,
           CAST(max(CASE WHEN pp = 90 THEN rc END) AS DOUBLE) / 100 AS p90,
           CAST(max(CASE WHEN pp = 99 THEN rc END) AS DOUBLE) / 100 AS p99,
           max(n) AS n
    FROM v GROUP BY rf
    """


@query("agg_percentiles", _PERCENTILES_SQL)
def agg_percentiles(spark, sf):
    """Exact linear-interpolated p50/p90/p99 computed in integer cents so the
    result is bit-identical across engines. Native ``percentile`` /
    ``quantile_cont`` interpolate in double and ROUND the result differently
    at the half-cent boundary (Spark rounds the shortest decimal repr, DuckDB
    the binary value), so a .xx5 midpoint flips the last cent between
    engines. Here the interpolation position p*(n-1) has denominator 100, so
    c_lo*100 + m*(c_hi-c_lo) is an exact integer in 1/100-cent units and
    half-up rounding is integer (+50, floor-div 100); the only double op left
    is cents/100.0, identical IEEE in both engines.

    Scale: one shuffle-sort per group key (any exact percentile needs it);
    at 100 TB use approx_percentile instead (t-digest, map-side combine)."""
    register_views(spark, sf)
    return spark.sql(_PERCENTILES_SQL)


_GROUPING_SETS_SQL = """
    SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """


@query("grouping_sets_flag_status", _GROUPING_SETS_SQL)
def grouping_sets_q(spark, sf):
    """Explicit GROUPING SETS (rollup/cube cousins are separate queries)."""
    register_views(spark, sf)
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "window_range_ntile",
    """
    SELECT o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_close,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
           round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 6) AS pr
    FROM orders
    """,
)
def window_range_ntile(spark, sf):
    """RANGE-frame window (value-based frame, not row-based) + ntile +
    percent_rank; ntile's order-by carries a unique tiebreak so tile
    assignment is deterministic."""
    o = load(spark, sf, "orders")
    w_range = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    w_tile = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_pr = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w_range).alias("n_close"),
        F.ntile(4).over(w_tile).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w_pr), 6).alias("pr"),
    )


@query(
    "scalar_array_functions",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
           list_contains(string_split_regex(trim(text), '\s+'), 'the') AS has_the,
           array_to_string(list_sort(string_split_regex(trim(text), '\s+'))[1:3], '-') AS first3,
           CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_distinct
    FROM documents
    """,
)
def scalar_array_functions(spark, sf):
    """Array function family: split/size/contains/sort/slice/distinct —
    all JVM-side builtins."""
    d = load(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "the").alias("has_the"),
        F.concat_ws("-", F.slice(F.array_sort(words), 1, 3)).alias("first3"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
    )


@query(
    "embedding_centroid_per_bucket",
    """
    SELECT vec_id % 8 AS bucket, CAST(g - 1 AS INT) AS pos,
           round(avg(CAST(embedding[g] AS DOUBLE)), 6) AS avg_val
    FROM embeddings, generate_series(1, 64) AS t(g)
    GROUP BY 1, 2
    """,
)
def embedding_centroid(spark, sf):
    """Element-wise centroid of embedding vectors per bucket via posexplode +
    positional aggregate — the distributed way to average array columns (no
    per-row UDF, shuffle key is (bucket, pos))."""
    e = load(spark, sf, "embeddings")
    return (
        e.select((F.col("vec_id") % 8).alias("bucket"), F.posexplode("embedding").alias("pos", "val"))
        .groupBy("bucket", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("avg_val"))
        .select("bucket", F.col("pos").cast("int").alias("pos"), "avg_val")
    )


def _ivf_oracle_sql() -> str:
    cos_ec = _cosine_sql("e.embedding", "c.cv")
    cos_qc = _cosine_sql("q.embedding", "c.cv")
    cos_qn = _cosine_sql("qa.qv", "ca.cv2")
    return f"""
    WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
    ca AS (
      SELECT neighbor_id, cv2, cent_id FROM (
        SELECT e.vec_id AS neighbor_id, e.embedding AS cv2, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cent_id) AS r
        FROM embeddings e CROSS JOIN cents c) WHERE r = 1),
    qa AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, c.cent_id) AS r
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE r <= 2),
    scored AS (
      SELECT qa.query_id, ca.neighbor_id, {cos_qn} AS cs
      FROM ca JOIN qa USING (cent_id) WHERE ca.neighbor_id <> qa.query_id),
    ranked AS (SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """


@query("similarity_ivf_topk", _ivf_oracle_sql(), bench=True)
def ivf_topk_q(spark, sf):
    """IVF-flat ANN: deterministic coarse centroids, corpus assigned to
    nearest list (broadcast join vs n_lists rows), queries probe 2 lists."""
    emb = load(spark, sf, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 5),
                      id_col="vec_id", vec_col="embedding", k=5, n_lists=8, n_probe=2)


def _kmeans_cents_cte(updates: int = 2, k: int = 8, dim: int = 64) -> str:
    """CTE chain (no WITH keyword) ending in ``cN`` = the centroid set after
    ``updates`` Lloyd rounds — the DuckDB twin of ``clustering.kmeans_train``
    (md5-spread seeds, argmin-L2 assignment, fixed-point integer sums whose
    double means reconstruct bit-identically in both engines)."""
    def d2(e_vec: str, c_vec: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {dim}), i -> "
                f"(CAST({e_vec}[i] AS DOUBLE) - CAST({c_vec}[i] AS DOUBLE)) * "
                f"(CAST({e_vec}[i] AS DOUBLE) - CAST({c_vec}[i] AS DOUBLE))))")

    def assign(cte: str) -> str:
        return f"""
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2('e.embedding', 'c.cv')}, c.cid) AS r
        FROM embeddings e CROSS JOIN {cte} c) t WHERE r = 1"""

    parts = [f"""c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS cid,
             embedding AS cv
      FROM (SELECT * FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}))"""]
    for u in range(updates):
        parts.append(f"a{u} AS ({assign(f'c{u}')})")
        parts.append(f"""s{u + 1} AS (
      SELECT a{u}.cid, g.i,
             sum(CAST(floor(CAST(e.embedding[g.i] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
             count(*) AS n
      FROM a{u} JOIN embeddings e USING (vec_id)
      CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) g
      GROUP BY a{u}.cid, g.i)""")
        parts.append(f"""c{u + 1} AS (
      SELECT cid, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0 ORDER BY i) AS cv
      FROM s{u + 1} GROUP BY cid)""")
    return ",\n    ".join(parts)


def _ivf_trained_oracle_sql(updates: int = 2, n_probe: int = 2) -> str:
    cos_ec = _cosine_sql("e.embedding", "c.cv")
    cos_qc = _cosine_sql("q.embedding", "c.cv")
    cos_qn = _cosine_sql("qa.qv", "ca.cv2")
    return f"""
    WITH {_kmeans_cents_cte(updates)},
    cents AS (SELECT cid AS cent_id, cv FROM c{updates}),
    ca AS (
      SELECT neighbor_id, cv2, cent_id FROM (
        SELECT e.vec_id AS neighbor_id, e.embedding AS cv2, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cent_id) AS r
        FROM embeddings e CROSS JOIN cents c) WHERE r = 1),
    qa AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, c.cent_id) AS r
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE r <= {n_probe}),
    scored AS (
      SELECT qa.query_id, ca.neighbor_id, {cos_qn} AS cs
      FROM ca JOIN qa USING (cent_id) WHERE ca.neighbor_id <> qa.query_id),
    ranked AS (SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """


@query("similarity_ivf_trained_topk", _ivf_trained_oracle_sql())
def ivf_trained_topk_q(spark, sf):
    """Lloyd-TRAINED IVF-flat ANN (r12, VERDICT r11 task #4): the coarse
    quantizer is refined with 2 k-means centroid-update rounds
    (``clustering.kmeans_train`` — the bit-reproducible trainer behind
    cluster_kmeans_topics) before list assignment, instead of raw
    hash-spread seed vectors. Same probe count as similarity_ivf_topk;
    recall@5 >= the untrained row on this fixture (pinned in
    tests/test_operators.py and measured alongside it in
    similarity_recall_report). Assignment stays a shuffle-free literal
    projection; training adds two bounded (n_lists x dim) fixed-point
    aggregates. The oracle replays the identical Lloyd chain in DuckDB."""
    emb = load(spark, sf, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 5),
                      id_col="vec_id", vec_col="embedding", k=5, n_lists=8,
                      n_probe=2, train_iters=2)


def _ivf_near_dup_oracle_sql(threshold: float = 0.4, n_probe: int = 2) -> str:
    cos_ec = _cosine_sql("e.embedding", "c.cv")
    cos_ab = _cosine_sql("a.ev", "b.ev")
    return f"""
    WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
    assigned AS (
      SELECT vec_id, ev, cent_id FROM (
        SELECT e.vec_id, e.embedding AS ev, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cent_id) AS r
        FROM embeddings e CROSS JOIN cents c) WHERE r <= {n_probe})
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round({cos_ab}, 6) AS cosine
    FROM assigned a JOIN assigned b
      ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
    WHERE round({cos_ab}, 6) >= {threshold}
    """


@query("dedup_embedding_ivf", _ivf_near_dup_oracle_sql())
def emb_ivf_dedup_q(spark, sf):
    """Semantic near-dup at SCALE (r4): IVF-bucketed cosine pairs — the
    100 TB path for embedding dedup, vs dedup_embedding_cosine's explicit
    O(n²/2) verification baseline. Multi-probe (2 lists per vector) keeps
    near-boundary pairs co-bucketed; the oracle reproduces the identical
    centroid assignment, so the approximation itself is pinned."""
    return S.ivf_near_dup_pairs(
        load(spark, sf, "embeddings"),
        id_col="vec_id", vec_col="embedding", threshold=0.4, n_lists=8, n_probe=2,
    )


def _ivf_near_dup_trained_oracle_sql(threshold: float = 0.4, n_probe: int = 2,
                                     updates: int = 2) -> str:
    cos_ec = _cosine_sql("e.embedding", "c.cv")
    cos_ab = _cosine_sql("a.ev", "b.ev")
    return f"""
    WITH {_kmeans_cents_cte(updates)},
    cents AS (SELECT cid AS cent_id, cv FROM c{updates}),
    assigned AS (
      SELECT vec_id, ev, cent_id FROM (
        SELECT e.vec_id, e.embedding AS ev, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cent_id) AS r
        FROM embeddings e CROSS JOIN cents c) WHERE r <= {n_probe})
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round({cos_ab}, 6) AS cosine
    FROM assigned a JOIN assigned b
      ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
    WHERE round({cos_ab}, 6) >= {threshold}
    """


@query("dedup_embedding_ivf_trained", _ivf_near_dup_trained_oracle_sql())
def emb_ivf_dedup_trained_q(spark, sf):
    """SemDeDup-shaped semantic dedup (r12): the IVF-bucketed near-dup query
    with a Lloyd-TRAINED coarse quantizer (2 ``kmeans_train`` rounds, the
    bit-reproducible trainer behind cluster_kmeans_topics and
    similarity_ivf_trained_topk) instead of raw hash-spread seeds — cluster
    the embedding space, then verify exact cosine within probed lists.
    Trained lists track the corpus distribution, so at equal n_probe more
    true near-dup pairs are co-bucketed (the same recall mechanism pinned
    for top-k in test_ivf_trained_recall_not_below_untrained). Assignment
    stays a shuffle-free literal-centroid projection; the oracle replays
    the identical Lloyd chain and bucketing in DuckDB."""
    return S.ivf_near_dup_pairs(
        load(spark, sf, "embeddings"),
        id_col="vec_id", vec_col="embedding", threshold=0.4, n_lists=8, n_probe=2,
        train_iters=2,
    )


@query("dedup_embedding_ivf_gemm", _ivf_near_dup_oracle_sql())
def emb_ivf_dedup_gemm_q(spark, sf):
    """r5 (VERDICT r4 task #6): the SAME IVF near-dup query executed through
    ``assignment="gemm"`` — the Arrow-batched numpy list assignment that is
    the actual path at n_lists in the hundreds (the literal projection
    collapses there, measured in similarity._assign_lists_gemm) — graded
    against the SAME oracle, so the scale path itself sits under the
    driver's hash gate, not just a pair-identity unit test."""
    return S.ivf_near_dup_pairs(
        load(spark, sf, "embeddings"),
        id_col="vec_id", vec_col="embedding", threshold=0.4, n_lists=8, n_probe=2,
        assignment="gemm",
    )


def _pq_oracle_sql(m: int = 4, k_codes: int = 16, dim: int = 64) -> str:
    sub = dim // m

    def l2(a: str, b: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {sub}), i -> "
                f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
                f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))")

    book_rows = "\n      UNION ALL ".join(
        f"""SELECT {j} AS subspace, code, center FROM (
        SELECT CAST(row_number() OVER (ORDER BY md5('pq{j}:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS code,
               embedding[{j * sub + 1}:{(j + 1) * sub}] AS center
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY md5('pq{j}:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}))"""
        for j in range(m)
    )
    return f"""
    WITH books AS ({book_rows}),
    sliced AS (
      SELECT e.vec_id, b.subspace, b.code,
             {l2(f"e.embedding[b.subspace * {sub} + 1 : b.subspace * {sub} + {sub}]", "b.center")} AS _d
      FROM embeddings e CROSS JOIN books b),
    codes AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace ORDER BY _d, code) AS r
        FROM sliced) WHERE r = 1),
    qtab AS (
      SELECT q.vec_id AS query_id, b.subspace, b.code,
             {l2(f"q.embedding[b.subspace * {sub} + 1 : b.subspace * {sub} + {sub}]", "b.center")} AS _d
      FROM embeddings q CROSS JOIN books b WHERE q.vec_id < 5),
    scored AS (
      SELECT qtab.query_id, codes.vec_id AS neighbor_id, round(sum(qtab._d), 6) AS _approx
      FROM codes JOIN qtab USING (subspace, code)
      WHERE codes.vec_id <> qtab.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY _approx, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """


@query("similarity_pq_topk", _pq_oracle_sql())
def pq_topk_q(spark, sf):
    """Product-quantization ANN (ADC): corpus compressed to m=4 codes per
    vector via deterministic hash-seeded codebooks, queries score against a
    broadcast distance table and rank by summed lookups — the memory-bound
    ANN path (codes are ~60x smaller than the float vectors; the embedding
    column is read once to encode and never joined again)."""
    emb = load(spark, sf, "embeddings")
    return S.pq_topk(emb, emb.filter(F.col("vec_id") < 5),
                     id_col="vec_id", vec_col="embedding", dim=64, k=5)


def _ivfpq_oracle_sql(m: int = 4, k_codes: int = 16, dim: int = 64,
                      n_lists: int = 8, n_probe: int = 2) -> str:
    sub = dim // m
    cos_ec = _cosine_sql("e.embedding", "c.cv")
    cos_qc = _cosine_sql("q.embedding", "c.cv")

    def l2(a: str, b: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {sub}), i -> "
                f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
                f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))")

    book_rows = "\n      UNION ALL ".join(
        f"""SELECT {j} AS subspace, code, center FROM (
        SELECT CAST(row_number() OVER (ORDER BY md5('pq{j}:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS code,
               embedding[{j * sub + 1}:{(j + 1) * sub}] AS center
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY md5('pq{j}:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}))"""
        for j in range(m)
    )
    return f"""
    WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_lists}),
    ca AS (
      SELECT neighbor_id, cent_id FROM (
        SELECT e.vec_id AS neighbor_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cent_id) AS r
        FROM embeddings e CROSS JOIN cents c) WHERE r = 1),
    qa AS (
      SELECT query_id, cent_id FROM (
        SELECT q.vec_id AS query_id, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, c.cent_id) AS r
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE r <= {n_probe}),
    books AS ({book_rows}),
    sliced AS (
      SELECT e.vec_id, b.subspace, b.code,
             {l2(f"e.embedding[b.subspace * {sub} + 1 : b.subspace * {sub} + {sub}]", "b.center")} AS _d
      FROM embeddings e CROSS JOIN books b),
    codes AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace ORDER BY _d, code) AS r
        FROM sliced) WHERE r = 1),
    qtab AS (
      SELECT q.vec_id AS query_id, b.subspace, b.code,
             {l2(f"q.embedding[b.subspace * {sub} + 1 : b.subspace * {sub} + {sub}]", "b.center")} AS _d
      FROM embeddings q CROSS JOIN books b WHERE q.vec_id < 5),
    scored AS (
      SELECT qa.query_id, codes.vec_id AS neighbor_id, round(sum(qtab._d), 6) AS _approx
      FROM codes
      JOIN ca ON codes.vec_id = ca.neighbor_id
      JOIN qa USING (cent_id)
      JOIN qtab ON qtab.query_id = qa.query_id
              AND qtab.subspace = codes.subspace AND qtab.code = codes.code
      WHERE codes.vec_id <> qa.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY _approx, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5
    """


@query("similarity_ivfpq_topk", _ivfpq_oracle_sql())
def ivfpq_topk_q(spark, sf):
    """IVF-PQ ANN — coarse inverted lists bound the scan, PQ codes bound the
    memory (the standard billion-scale serving layout): corpus vectors carry
    a list id + m=4 codes out of ONE pass over the embedding column, queries
    probe their 2 nearest lists and rank members by summed ADC lookups."""
    emb = load(spark, sf, "embeddings")
    return S.ivfpq_topk(emb, emb.filter(F.col("vec_id") < 5),
                        id_col="vec_id", vec_col="embedding", dim=64, k=5,
                        n_lists=8, n_probe=2)


def _recall_report_oracle_sql() -> str:
    exact = f"""(WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, {_cosine_sql('q.qv', 'e.embedding')} AS c
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5)"""
    methods = {
        "lsh": _lsh_topk_oracle_sql(5),
        "ivf": _ivf_oracle_sql(),
        "ivf_trained": _ivf_trained_oracle_sql(),
        "pq": _pq_oracle_sql(),
        "ivfpq": _ivfpq_oracle_sql(),
    }
    ctes = ",\n    ".join(
        f"m_{m} AS (SELECT query_id, neighbor_id FROM ({sql}) t)" for m, sql in methods.items())
    parts = [f"""
    SELECT '{m}' AS method,
           (SELECT count(*) FROM m_{m}) AS n_pairs,
           (SELECT count(*) FROM m_{m} JOIN exact USING (query_id, neighbor_id)) AS n_hits,
           round((SELECT count(*) FROM m_{m} JOIN exact USING (query_id, neighbor_id)) * 1.0
                 / (SELECT count(*) FROM exact), 4) AS recall_at_5""" for m in methods]
    return (f"WITH exact AS (SELECT query_id, neighbor_id FROM {exact} t),\n    {ctes}\n"
            + "\n    UNION ALL".join(parts))


@query("similarity_recall_report", _recall_report_oracle_sql())
def similarity_recall_q(spark, sf):
    """The ANN evaluation harness, run as a query: recall@5 of every
    approximate index (LSH, IVF, PQ, IVF-PQ) against exact cosine on the
    same query set — the self-measurement a serving deployment runs before
    choosing an index. One row per method (pairs returned, exact hits,
    recall); note the hash-seeded codebooks are verification-scoped stand-ins
    for trained ones, so absolute recall on this synthetic corpus is low by
    construction — the CONTRACT is that both engines compute the identical
    number.

    r13 (within-invocation sharing, guide §5 caching rule): every method's
    pair table and the exact baseline are EAGERLY localCheckpoint'ed once —
    the lazy union referenced the exact-cosine subtree 6x (once per method's
    hit-join + once for n_exact) and each method's subtree 2x (n_pairs +
    hits), so one execution re-ran the full ANN pipelines ~11x. All frames
    are <= queries x k rows; nothing survives the invocation (checkpoint
    blocks are this result's lineage, freed by GC — never a cross-run
    cache)."""
    from functools import reduce

    emb = load(spark, sf, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    ex = S.cosine_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=5) \
        .select("query_id", "neighbor_id").localCheckpoint(eager=True)
    methods = {
        "lsh": S.lsh_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=5,
                          dim=64),
        "ivf": S.ivf_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=5,
                          n_lists=8, n_probe=2),
        "ivf_trained": S.ivf_topk(emb, qs, id_col="vec_id", vec_col="embedding",
                                  k=5, n_lists=8, n_probe=2, train_iters=2),
        "pq": S.pq_topk(emb, qs, id_col="vec_id", vec_col="embedding", dim=64, k=5),
        "ivfpq": S.ivfpq_topk(emb, qs, id_col="vec_id", vec_col="embedding", dim=64,
                              k=5, n_lists=8, n_probe=2),
    }
    n_exact = ex.agg(F.count(F.lit(1)).alias("n_exact"))
    rows = []
    for name, df in methods.items():
        d = df.select("query_id", "neighbor_id").localCheckpoint(eager=True)
        rows.append(
            d.agg(F.count(F.lit(1)).alias("n_pairs"))
            .join(d.join(ex, ["query_id", "neighbor_id"])
                  .agg(F.count(F.lit(1)).alias("n_hits")))
            .join(n_exact)
            .select(F.lit(name).alias("method"), "n_pairs", "n_hits",
                    F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall_at_5"))
        )
    return reduce(lambda a, b: a.unionByName(b), rows)


def _kmeans_oracle_sql(k: int = 8, dim: int = 64) -> str:
    def d2(e_vec: str, c_vec: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {dim}), i -> "
                f"(CAST({e_vec}[i] AS DOUBLE) - CAST({c_vec}[i] AS DOUBLE)) * "
                f"(CAST({e_vec}[i] AS DOUBLE) - CAST({c_vec}[i] AS DOUBLE))))")

    def assign(cte: str) -> str:
        return f"""
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2('e.embedding', 'c.cv')}, c.cid) AS r
        FROM embeddings e CROSS JOIN {cte} c) t WHERE r = 1"""

    return f"""
    WITH c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS cid,
             embedding AS cv
      FROM (SELECT * FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})),
    a0 AS ({assign('c0')}),
    s1 AS (
      SELECT a0.cid, g.i,
             sum(CAST(floor(CAST(e.embedding[g.i] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
             count(*) AS n
      FROM a0 JOIN embeddings e USING (vec_id)
      CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) g
      GROUP BY a0.cid, g.i),
    c1 AS (SELECT cid, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0 ORDER BY i) AS cv
           FROM s1 GROUP BY cid),
    a1 AS ({assign('c1')})
    SELECT vec_id, cid AS cluster FROM a1
    """


@query("cluster_kmeans_topics", _kmeans_oracle_sql())
def kmeans_topics_q(spark, sf):
    """K-means topic clustering over the embeddings corpus (2 Lloyd
    iterations, md5-seeded): the assignment step is one shuffle-free argmin
    projection against broadcast centroid literals, and the centroid update
    aggregates fixed-point longs over a (k x dim) key space — bounded at any
    corpus size, and bit-reproducible in DuckDB (integer sums commute;
    double means reconstruct identically)."""
    from .operators.clustering import kmeans_assign

    emb = load(spark, sf, "embeddings")
    return kmeans_assign(emb, id_col="vec_id", vec_col="embedding", k=8, iters=2)


@query("cluster_kmeans_topics_gemm", _kmeans_oracle_sql())
def kmeans_topics_gemm_q(spark, sf):
    """r5 (VERDICT r4 tasks #2+#6): k-means with ``assignment="gemm"`` —
    the Arrow-batched numpy argmin that survives k in the hundreds
    (measured at 20k vectors: k=256 literal 41.9 s vs 0.94 s GEMM, clustering.py) — graded
    against the SAME oracle as the literal mode, so the scale path is
    hash-gated, not just pair-identity unit-tested."""
    from .operators.clustering import kmeans_assign

    emb = load(spark, sf, "embeddings")
    return kmeans_assign(emb, id_col="vec_id", vec_col="embedding", k=8, iters=2,
                         assignment="gemm")


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'small%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
    bench=True,
)
def q14(spark, sf):
    """TPC-H Q14-style promo revenue: fact-dim join (part broadcasts) +
    conditional aggregate."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01"))
    p = load(spark, sf, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type").startswith("small"), _rev()).otherwise(F.lit(0.0))
    return j.agg(F.round(100.0 * F.sum(promo) / F.sum(_rev()), 4).alias("promo_revenue"))


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey
    """,
    bench=True,
)
def q18(spark, sf):
    """TPC-H Q18-style large-volume customers: semi join against a HAVING
    aggregate, then re-aggregate."""
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    big = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_q")).filter(F.col("_q") > 150)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


def _kmv_oracle_sql(k: int = 64) -> str:
    return f"""
    WITH h AS (SELECT DISTINCT o_orderpriority,
                      ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS hv
               FROM orders),
    r AS (SELECT o_orderpriority, hv,
                 row_number() OVER (PARTITION BY o_orderpriority ORDER BY hv) AS rn,
                 count(*) OVER (PARTITION BY o_orderpriority) AS n_exact
          FROM h)
    SELECT o_orderpriority, n_exact,
           CASE WHEN n_exact >= {k}
                THEN round(({k} - 1) / (CAST(max(CASE WHEN rn = {k} THEN hv END) AS DOUBLE) / 1152921504606846976.0), 2)
                ELSE CAST(n_exact AS DOUBLE) END AS n_estimate
    FROM r GROUP BY o_orderpriority, n_exact
    """


@query("sketch_kmv_distinct", _kmv_oracle_sql())
def sketch_kmv_q(spark, sf):
    """KMV distinct-count sketch (deterministic, cross-engine reproducible —
    unlike HLL) vs the exact count, per order priority."""
    from .operators import sketch as K

    o = load(spark, sf, "orders")
    return K.kmv_distinct(o, ["o_orderpriority"], "o_custkey", k=64).select(
        "o_orderpriority", "n_exact", "n_estimate")


@query(
    "sketch_hll_distinct",
    _hll_oracle_part("o_orderpriority", "o_custkey")
    + "\n    UNION ALL\n"
    + _hll_oracle_part("'ALL-ORDERS'", "o_orderkey")
    + "\n    UNION ALL\n"
    + _hll_oracle_part("'MOD97'", "(o_custkey % 97)"),
    bench=True,
)
def sketch_hll_q(spark, sf):
    """HyperLogLog distinct estimates with the PORTABLE md5 hash (r9 —
    completes the sketch family: KMV set algebra, mergeable histograms,
    HLL fixed-memory registers). Spark's own approx_count_distinct is an
    HLL++ with engine-private hashing, so it can never hash-match an
    oracle; this one reproduces bit-for-bit in DuckDB because the register
    sum is EXACT integer arithmetic (each register contributes the bigint
    2^(52-M), order-independent) and the estimate is one double division.
    Two groupings exercise both estimator branches: per-priority custkeys
    (linear-counting correction) and all orderkeys (raw HLL path).
    MERGEABILITY (registers built on two disjoint halves and max-merged
    equal the one-pass registers — how shard sketches combine at 100 TB
    without a second data pass) is pinned in pytest
    (test_hll_register_merge_equals_one_pass): the former INLINE assert
    re-hashed the whole corpus twice more and ran two exceptAll counts on
    every invocation — 3x the md5 work and 2 extra driver round-trips per
    bench run for a data-independent algebraic property (r12, guide §1:
    the timed region must measure the operator, not its self-tests)."""
    from .operators import sketch as K

    o = load(spark, sf, "orders")
    per_prio = K.hll_distinct(o, ["o_orderpriority"], "o_custkey").select(
        F.col("o_orderpriority").alias("grp"), "n_estimate")
    gall = o.withColumn("grp", F.lit("ALL-ORDERS"))
    g_est = K.hll_distinct(gall, ["grp"], "o_orderkey").select("grp", "n_estimate")
    # 97 distinct values: squarely the linear-counting branch (E << 2.5m),
    # where the estimate is near-exact because most registers stay empty
    gmod = (o.select((F.col("o_custkey") % 97).alias("ck_mod"))
            .withColumn("grp", F.lit("MOD97")))
    m_est = K.hll_distinct(gmod, ["grp"], "ck_mod").select("grp", "n_estimate")
    return per_prio.unionByName(g_est).unionByName(m_est)


def _cms_oracle(d: int = 4, w: int = 256, threshold: int = 20) -> str:
    """Count-Min heavy hitters in DuckDB SQL — same row-salted md5 buckets,
    same integer counters, same min-over-rows estimate as
    operators.sketch.cms_sketch/cms_estimate."""
    return f"""
    WITH src AS (SELECT (o_custkey % 97) AS v FROM orders WHERE o_custkey IS NOT NULL),
    rows AS (SELECT j FROM generate_series(0, {d - 1}) t(j)),
    cells AS (
      SELECT j, ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 15))::BIGINT % {w} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM src CROSS JOIN rows GROUP BY j, bucket),
    cand AS (SELECT DISTINCT v FROM src),
    looked AS (
      SELECT cand.v,
             ('0x' || substr(md5('cms' || CAST(rows.j AS VARCHAR) || ':' || CAST(cand.v AS VARCHAR)), 1, 15))::BIGINT % {w} AS bucket,
             rows.j
      FROM cand CROSS JOIN rows),
    est AS (
      SELECT looked.v, min(coalesce(cells.cnt, 0)) AS est_n
      FROM looked LEFT JOIN cells ON cells.j = looked.j AND cells.bucket = looked.bucket
      GROUP BY looked.v)
    SELECT v AS ck_mod, est_n FROM est WHERE est_n >= {threshold}
    """


@query("sketch_cms_heavy_hitters", _cms_oracle(), bench=True)
def sketch_cms_heavy_hitters_q(spark, sf):
    """Count-Min heavy hitters with the PORTABLE md5 hash (r10 — extends
    the sketch family: KMV set algebra, mergeable histograms, HLL
    registers, CMS frequencies): d x w integer counters reproduce
    bit-for-bit in DuckDB; est(v) = min over rows is ALWAYS >= the true
    count — the one-sided guarantee that no true heavy hitter is missed —
    pinned for every candidate in pytest, with mergeability (sketches
    built on two disjoint halves and summed elementwise equal the
    one-pass sketch — how shard sketches combine at 100 TB; also its own
    graded row, sketch_cms_merge). Both were INLINE asserts until r12:
    the guarantee check ran a full exact groupBy + join + count and the
    mergeability check three extra sketch builds + two exceptAll counts
    on EVERY invocation — ~19 extra Spark jobs per bench run for
    data-independent properties (guide §1: measure the operator, not its
    self-tests; see test_cms_one_sided_guarantee_and_merge).
    Scale shape: map-side combine bounds the shuffle at partitions x d*w
    counter cells; estimates broadcast the <= d*w-row sketch."""
    from .operators import sketch as K

    d, w, threshold = 4, 256, 20
    o = load(spark, sf, "orders")
    src = o.select((F.col("o_custkey") % 97).alias("ck_mod"))
    # estimate references the sketch TWICE (broadcast probe + consistency
    # guard agg); eager-checkpoint the <= d*w-row counter table so the
    # corpus-wide md5 build runs once, with no CacheManager entry left
    # behind (the pre-r12 persist() was never released)
    # pre_aggregate: ck_mod is a KNOWN 97-value domain (built by the %97
    # right above), so hash each value once, not once per row (r12)
    sk = K.cms_sketch(src, "ck_mod", d=d, w=w,
                      pre_aggregate=True).localCheckpoint(eager=True)
    est = K.cms_estimate(sk, src, "ck_mod", d=d, w=w)
    return est.filter(F.col("est_n") >= threshold)


def _cms_merge_oracle(d: int = 4, w: int = 256, threshold: int = 10) -> str:
    """CMS shard-merge in DuckDB SQL: two sketches built INDEPENDENTLY on
    disjoint order shards, SUM-merged cell-wise, estimates served from the
    merged counters — the merge itself is in the oracle, so a wrong merge
    (e.g. max instead of sum, or dropped cells) hash-mismatches."""
    probe = ("('0x' || substr(md5('cms' || CAST({j} AS VARCHAR) || ':' || "
             "CAST({v} AS VARCHAR)), 1, 15))::BIGINT % " + str(w))
    return f"""
    WITH src AS (SELECT o_orderkey, (o_custkey % 97) AS v
                 FROM orders WHERE o_custkey IS NOT NULL),
    rows AS (SELECT j FROM generate_series(0, {d - 1}) t(j)),
    cells_a AS (
      SELECT j, {probe.format(j='j', v='v')} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM src CROSS JOIN rows WHERE o_orderkey % 2 = 0 GROUP BY j, bucket),
    cells_b AS (
      SELECT j, {probe.format(j='j', v='v')} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM src CROSS JOIN rows WHERE o_orderkey % 2 = 1 GROUP BY j, bucket),
    merged AS (
      SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM (SELECT * FROM cells_a UNION ALL SELECT * FROM cells_b)
      GROUP BY j, bucket),
    cand AS (SELECT DISTINCT v FROM src),
    looked AS (
      SELECT cand.v, rows.j, {probe.format(j='rows.j', v='cand.v')} AS bucket
      FROM cand CROSS JOIN rows),
    est AS (
      SELECT looked.v, min(coalesce(merged.cnt, 0)) AS est_n
      FROM looked LEFT JOIN merged
        ON merged.j = looked.j AND merged.bucket = looked.bucket
      GROUP BY looked.v)
    SELECT v AS ck_mod, est_n FROM est WHERE est_n >= {threshold}
    """


@query("sketch_cms_merge", _cms_merge_oracle())
def sketch_cms_merge_q(spark, sf):
    """CMS shard-merge as its own graded row (r11, VERDICT task #6 —
    promotes the inline mergeability assert to a first-class query): two
    Count-Min sketches built INDEPENDENTLY over disjoint halves of orders
    (even/odd o_orderkey — on a cluster these are different table
    partitions that never co-reside), combined by cell-wise SUM
    (``groupBy(row, bucket).sum(cnt)`` — the 100 TB combine: shard
    sketches are d*w rows each, so the merge shuffles KILOBYTES however
    big the table is), then point estimates served from the MERGED
    counters. The DuckDB oracle replays the same two-shard build and sum,
    so a broken merge hash-mismatches rather than passing by accident."""
    from .operators import sketch as K

    d, w, threshold = 4, 256, 10
    o = load(spark, sf, "orders").filter(F.col("o_custkey").isNotNull())
    src = o.select("o_orderkey", (F.col("o_custkey") % 97).alias("ck_mod"))
    lo = K.cms_sketch(src.filter(F.col("o_orderkey") % 2 == 0), "ck_mod",
                      d=d, w=w, pre_aggregate=True)  # known 97-value domain
    hi = K.cms_sketch(src.filter(F.col("o_orderkey") % 2 == 1), "ck_mod",
                      d=d, w=w, pre_aggregate=True)
    merged = (lo.unionByName(hi).groupBy("row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    est = K.cms_estimate(merged, src, "ck_mod", d=d, w=w)
    return est.filter(F.col("est_n") >= threshold)


@query(
    "sketch_kmv_set_ops",
    """
    WITH ha AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
                FROM orders WHERE o_orderpriority = '1-URGENT'),
    hb AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM orders WHERE o_orderpriority = '2-HIGH'),
    ma AS (SELECT h FROM ha ORDER BY h LIMIT 64),
    mb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
    mu AS (SELECT h FROM (SELECT h FROM ma UNION SELECT h FROM mb) u ORDER BY h LIMIT 64),
    s AS (SELECT
      (SELECT count(*) FROM ma) AS na, (SELECT max(h) FROM ma) AS hka,
      (SELECT count(*) FROM mb) AS nb, (SELECT max(h) FROM mb) AS hkb,
      (SELECT count(*) FROM mu) AS nu, (SELECT max(h) FROM mu) AS hku,
      (SELECT count(*) FROM mu WHERE h IN (SELECT h FROM ma) AND h IN (SELECT h FROM mb)) AS ni),
    e AS (SELECT
      CASE WHEN na >= 64 THEN round(63 / (CAST(hka AS DOUBLE) / 1152921504606846976.0), 2)
           ELSE CAST(na AS DOUBLE) END AS est_a,
      CASE WHEN nb >= 64 THEN round(63 / (CAST(hkb AS DOUBLE) / 1152921504606846976.0), 2)
           ELSE CAST(nb AS DOUBLE) END AS est_b,
      CASE WHEN nu >= 64 THEN round(63 / (CAST(hku AS DOUBLE) / 1152921504606846976.0), 2)
           ELSE CAST(nu AS DOUBLE) END AS est_union,
      CAST(ni AS DOUBLE) / nu AS j
      FROM s)
    SELECT est_a, est_b, est_union, round(j, 6) AS jaccard,
           round(j * est_union, 2) AS est_intersection
    FROM e
    """,
)
def sketch_kmv_set_ops_q(spark, sf):
    """Theta-sketch-style audience overlap from two KMV sketches: estimated
    |urgent customers|, |high customers|, union, Jaccard, and intersection —
    each side reduced to ONE 64-hash sketch row, the set algebra pure array
    expressions over the two broadcast rows."""
    from .operators import sketch as K

    o = load(spark, sf, "orders")
    return K.kmv_set_ops(
        o.filter(F.col("o_orderpriority") == "1-URGENT"),
        o.filter(F.col("o_orderpriority") == "2-HIGH"),
        "o_custkey", k=64)


@query(
    "sketch_histogram_quantiles",
    """
    WITH src AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
                 WHERE n_chars IS NOT NULL),
    b AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - 0.0) / 4.0) AS BIGINT), 0), 255) AS bin
          FROM src),
    c AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
    cum AS (SELECT bin, c,
                   sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER () AS total
            FROM c),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
    h AS (SELECT q, bin, c, cum - c AS cum_prev, q * total AS target
          FROM cum CROSS JOIN qs WHERE cum >= q * total),
    f AS (SELECT q, bin, c, cum_prev, target,
                 row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
          FROM h)
    SELECT q, 0.0 + bin * 4.0 + 4.0 * (target - cum_prev) / c AS est
    FROM f WHERE rn = 1 ORDER BY q
    """,
)
def sketch_histogram_quantiles_q(spark, sf):
    """Quantiles from a fixed-width MERGEABLE histogram (r8): the
    distribution sketch behind corpus-scale quality gates. Spark's
    approx_percentile (GK) has engine-internal tie-breaks no oracle can
    reproduce; the fixed [0, 1024)/256-bin histogram bins identically in
    both engines so the interpolated p50/p90/p99 match bit-for-bit. One
    map-side-combined aggregation reduces the corpus to <=256 bin rows;
    counts ADD across shards, so sharded corpora merge sketches instead of
    re-scanning — all quantile arithmetic then runs on the tiny bin
    table."""
    from .operators import sketch as K

    d = load(spark, sf, "documents")
    return K.histogram_quantiles(d, "n_chars", lo=0.0, hi=1024.0, bins=256,
                                 quantiles=(0.5, 0.9, 0.99))


@query(
    "similarity_hybrid_rrf",
    """
    WITH ev AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
                FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    by_val AS (SELECT user_id, sum(cents) AS s FROM ev GROUP BY user_id),
    by_cnt AS (SELECT user_id, count(*) AS s FROM ev GROUP BY user_id),
    r1 AS (SELECT user_id,
                  row_number() OVER (ORDER BY s DESC, user_id ASC) AS rank
           FROM by_val),
    r2 AS (SELECT user_id,
                  row_number() OVER (ORDER BY s DESC, user_id ASC) AS rank
           FROM by_cnt),
    u AS (SELECT user_id, rank FROM r1 WHERE rank <= 50
          UNION ALL
          SELECT user_id, rank FROM r2 WHERE rank <= 50),
    f AS (SELECT user_id,
                 CAST(sum(CAST(round(1e9 / (60 + rank)) AS BIGINT)) AS BIGINT)
                   AS rrf_nano,
                 count(*) AS n_lists
          FROM u GROUP BY user_id),
    t AS (SELECT user_id, rrf_nano, n_lists,
                 row_number() OVER (ORDER BY rrf_nano DESC, user_id ASC) AS rn
          FROM f)
    SELECT user_id, rrf_nano, n_lists FROM t WHERE rn <= 20
    """,
)
def similarity_hybrid_rrf_q(spark, sf):
    """Reciprocal-rank fusion (r8) — the standard hybrid-search combiner:
    two retriever rankings (users by exact spend-cents, users by event
    count — integer metrics so cross-engine rank ties cannot flip) are
    truncated to top-50 lists and fused with RRF k=60; contributions are
    integer-nano-quantized so the fused score is exact regardless of
    summation order. RRF operates on bounded LISTS — the corpus-scale work
    happened in the retrievers — so the fuse is one union + groupBy over
    at most sum-of-list-lengths rows."""
    from .operators.similarity import rrf_fuse
    from pyspark.sql import Window as W

    ev = (load(spark, sf, "events")
          .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
          .select("user_id",
                  F.round(F.col("value") * 100).cast("long").alias("cents")))
    by_val = ev.groupBy("user_id").agg(F.sum("cents").alias("score"))
    by_cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("score"))

    def top50(df):
        w = W.orderBy(F.col("score").desc(), F.col("user_id").asc())
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= 50).drop("_rn"))

    return rrf_fuse([top50(by_val), top50(by_cnt)], "user_id", "score",
                    k=60, top_n=20)


@query(
    "timeseries_merge_intervals",
    """
    WITH iv AS (
      SELECT user_id AS k, epoch(ts) AS s, epoch(ts) + value * 10 AS e
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND epoch(ts) + value * 10 >= epoch(ts)
    ),
    m AS (SELECT k, s, e,
                 max(e) OVER (PARTITION BY k ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM iv),
    f AS (SELECT k, s, e,
                 CASE WHEN pm IS NOT NULL AND s > pm + 300.0 THEN 1 ELSE 0 END AS nw
          FROM m),
    i AS (SELECT k, s, e,
                 sum(nw) OVER (PARTITION BY k ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) + 1 AS island
          FROM f)
    SELECT k AS user_id, min(s) AS island_start, max(e) AS island_end,
           count(*) AS n_intervals
    FROM i GROUP BY k, island
    """,
)
def timeseries_merge_intervals_q(spark, sf):
    """Merge overlapping per-user activity intervals (r8) — the
    gaps-and-islands primitive behind session stitching and speech-segment
    coalescing. Each event opens [epoch(ts), epoch(ts) + 10*value] seconds;
    intervals closer than 300 s merge into one island. Two window passes
    and one aggregate per key — no self-join, no driver state; at 100 TB
    the shuffle is keyed on user and partitions are single-user interval
    lists."""
    from .operators.timeseries import merge_intervals

    ev = load(spark, sf, "events")
    # ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so NTZ → TS → DOUBLE
    # equals DuckDB's epoch(naive ts) including the fractional seconds
    ep = F.col("ts").cast("timestamp").cast("double")
    iv = ev.select("user_id", ep.alias("s"),
                   (ep + F.col("value") * 10).alias("e"))
    return merge_intervals(iv, "user_id", "s", "e", min_gap=300.0)


@query(
    "join_salted_skew",
    """
    SELECT o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    bench=True,
)
def join_salted_q(spark, sf):
    """Salted big-big equi-join (skew pattern): left side salted on line
    number, right side replicated 8x; identical results to the plain join —
    only the shuffle distribution changes."""
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    j = J.salted_join(l, o.select("l_orderkey", "o_orderpriority"), ["l_orderkey"],
                      salt_buckets=8, salt_source="l_linenumber")
    return j.groupBy("o_orderpriority").agg(
        F.round(F.sum(_rev()), 2).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))


@query(
    "join_hot_key_isolated",
    """
    WITH l AS (SELECT CASE WHEN user_id % 5 = 0 THEN -1 ELSE user_id END AS skew_key, value
               FROM events),
         d AS (SELECT DISTINCT skew_key, CAST(abs(skew_key) % 4 AS INT) AS seg FROM l)
    SELECT seg, count(*) AS n_events, round(sum(l.value), 2) AS total
    FROM l JOIN d USING (skew_key)
    GROUP BY seg
    ORDER BY seg
    """,
    bench=True,
)
def join_hot_key_isolated_q(spark, sf):
    """Isolated salting — the production skew-join shape (vs the full-salt
    demonstration in join_salted_skew, which replicates the ENTIRE dim
    salt_buckets x): a bounded sample-count pass detects the hot keys
    (here ~20% of events collapse onto one synthetic key), only THOSE rows
    are salted against a replicated hot slice of the dim, and the cold
    majority takes the plain equi-join — the replication tax scales with
    the hot slice, not the corpus. Results identical to the plain join,
    pinned by the oracle."""
    e = load(spark, sf, "events")
    l = e.withColumn(
        "skew_key",
        F.when(F.col("user_id") % 5 == 0, F.lit(-1)).otherwise(F.col("user_id")),
    ).select("skew_key", "value")
    d = (l.select("skew_key").distinct()
         .withColumn("seg", (F.abs(F.col("skew_key")) % 4).cast("int")))
    j = J.hot_key_isolated_join(l, d, ["skew_key"], salt_buckets=8,
                                salt_source="value", hot_factor=2.0)
    return (j.groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total"))
            .orderBy("seg"))


@query(
    "join_bloom_prefiltered",
    """
    SELECT l.l_orderkey, l.l_partkey, round(l.l_extendedprice, 2) AS price,
           p.p_name
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 50
    """,
    bench=True,
)
def join_bloom_prefiltered_q(spark, sf):
    """Bloom-prefiltered join (r10): the small side's keys aggregate into
    one bitmap (1 codegen'd xxhash64, 4 probe windows per key — the
    bitmap is engine-internal, so no portable hash) and the BIG side drops
    provably-unmatched rows with codegen'd expressions BEFORE the join
    shuffle — the hand-rolled form of Spark's runtime bloom filter
    injection, available to any join shape. Blooms have no false
    negatives, so the result is EXACTLY the plain join (the oracle) —
    pinned by a plan contract in pytest: the optimized plan carries the
    bit-test filter on the probe side, so the shuffle sees only can-match
    rows (test_bloom_prefilter_filters_probe_before_join — until r12
    this was an INLINE optimizedPlan().toString() assert that re-ran the
    whole optimizer and stringified four 16 KB bitmap literals on every
    invocation; guide §1: the timed region must measure the operator).
    At 100 TB the driver cost is one <= n_bits/64-word collect (~16 KB),
    never data-sized."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice")
    pt = (load(spark, sf, "part").filter(F.col("p_size") == 50)
          .select(F.col("p_partkey").alias("l_partkey"), "p_name"))
    j = J.bloom_prefilter_join(li, pt, ["l_partkey"])
    return j.select("l_orderkey", "l_partkey",
                    F.round("l_extendedprice", 2).alias("price"), "p_name")


@query(
    "rollup_time_bucket",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(extract(hour FROM ts) AS INT) AS hour,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY ROLLUP (day, hour)
    ORDER BY day NULLS FIRST, hour NULLS FIRST
    """,
    bench=True,
)
def rollup_time_bucket_q(spark, sf):
    """Hypertable-style multi-granularity time rollup: (day, hour) -> day ->
    grand total in one pass (partial aggregates reused across levels).
    Day rendered as an ISO string so both engines emit the same type."""
    e = load(spark, sf, "events")
    return (
        e.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .withColumn("hour", F.hour("ts").cast("int"))
        .rollup("day", "hour")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy(F.col("day").asc_nulls_first(), F.col("hour").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Table-layer queries: CRUD + time travel + metadata count through the
# engine's own table format (reference: table/{insert,delete,update}.go,
# scan.go:80-98, scan.go:234-250). Each builds a scratch table under /tmp,
# mutates it through the public API, and returns the scanned result — so the
# driver's oracle gate covers the table layer end-to-end, not just the
# relational operators.
# ---------------------------------------------------------------------------


_SCRATCH_ROOT: list[str] = []


def _scratch_dir(prefix: str) -> str:
    """Scratch dirs for table-layer queries, all under ONE session-scoped
    root removed at interpreter exit — repeated parity/bench runs must not
    leak /tmp data (one rmtree instead of per-query cleanup so a query's
    result DataFrame can still be lazily evaluated after the fn returns)."""
    import atexit
    import shutil
    import tempfile

    if not _SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="gis_scratch_")
        _SCRATCH_ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT[0])


def _scratch_table(spark, name: str, df: DataFrame, properties: dict | None = None):
    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema

    wh = _scratch_dir(f"gis_{name}_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(("scratch",), name, from_spark_schema(df.schema), properties=properties)
    t.append(df)
    return t


_CRUD_COLS = ["o_orderkey", "o_totalprice", "o_orderpriority"]


@query(
    "crud_delete_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def crud_delete_scan(spark, sf):
    """Copy-on-write DELETE through the table layer, then scan
    (reference: table/delete.go:83-139)."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "del", base)
    t.delete(C("o_totalprice").gt(200000.0))
    return t.to_df().select(*_CRUD_COLS)


@query(
    "float_nan_pruning_scan",
    """
    SELECT o_orderkey FROM orders
    WHERE o_orderkey < 3000
      AND (CASE WHEN o_orderkey % 7 = 0 THEN 'NaN'::DOUBLE
                ELSE o_totalprice END) > 1000000.0
    """,
)
def float_nan_pruning_scan(spark, sf):
    """NaN scan semantics under the oracle gate (r6 probe fix): Spark and
    DuckDB both order NaN ABOVE every double, while parquet min/max bounds
    EXCLUDE NaN — so `x > 1e6` must return exactly the NaN rows even though
    every file's recorded max is far below the threshold. Pre-r6 all three
    prune tiers dropped those files (silent row loss; expr.might_match NaN
    guard, planning.py numpy + Catalyst twins)."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(float("nan")))
         .otherwise(F.col("o_totalprice")).alias("x"))
    t = _scratch_table(spark, "nanscan", base)
    return t.scan().filter(C("x").gt(1_000_000.0)).to_df().select("o_orderkey")


@query(
    "crud_avro_manifest_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def crud_avro_manifest_scan(spark, sf):
    """Same CoW delete + scan as crud_delete_scan, but through Iceberg-spec
    Avro OCF manifests (manifest-format=avro: manifest list + manifests,
    binary bound serde — reference: spec/avro.go:91-534, :814-883). Asserts
    the snapshot actually points at an .avro manifest list and that stats
    pruning still works through the binary-bound round-trip."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "avrom", base, properties={"manifest-format": "avro"})
    t.delete(C("o_totalprice").gt(200000.0))
    if not t.current_snapshot().manifest_path.endswith(".avro"):
        raise AssertionError("avro manifest list not in use")
    n_all = len(t.scan().plan_files())
    n_pruned = len(t.scan().filter(C("o_orderkey").gt(10**9)).plan_files())
    if not (n_pruned < n_all or n_all <= 1):
        raise AssertionError(f"stats pruning inactive through avro bounds: {n_pruned}/{n_all}")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "distributed_plan_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 2000
    """,
)
def distributed_plan_scan_q(spark, sf):
    """Planning-tier crossover under the graded gate (VERDICT r3 task #7):
    the snapshot's manifest carries >DISTRIBUTED_THRESHOLD entries — 250k
    metadata-only phantom files whose o_orderkey stats exclude the scan
    filter — so plan_files() MUST run as a Spark job over the entry
    DataFrame (plan_distributed, table/planning.py) instead of a driver
    loop, and must prune every phantom, landing on exactly the real files.
    Inline assertions pin the tier (manifest-list entry count over the
    threshold) and the survivor set."""
    import os as _os

    from .table.metadata import MANIFEST_LIST_SUFFIX, DataFileEntry, read_manifest_list
    from .table.planning import DISTRIBUTED_THRESHOLD

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 2000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "distplan", base, properties={"manifest-format": "parquet"})
    real = t.manifest_entries(t.current_snapshot())
    okf = next(f.field_id for f in t.metadata.current_schema.fields if f.name == "o_orderkey")
    seq = max(e.sequence_number for e in real) + 1
    phantoms = [
        DataFileEntry(
            content=0,
            file_path=f"{t.location}/data/phantom-{i:06d}.parquet",
            file_format="parquet",
            spec_id=0,
            schema_id=real[0].schema_id,
            record_count=100,
            file_size=1024,
            partition={},
            column_stats={okf: {"min": 10_000_000 + i, "max": 10_000_050 + i,
                                "null_count": 0, "value_count": 100}},
            sequence_number=seq,
        )
        for i in range(DISTRIBUTED_THRESHOLD + 50_000)
    ]
    # ONE manifest group holding real + phantom entries (r13): in separate
    # members the phantom member's aggregate bounds (all >= 10M) contradict
    # the o_orderkey < 2000 filter, so the member-level summary skip would
    # plan from the real member alone and the DISTRIBUTED tier this query
    # exists to pin would never run (it silently degraded to a driver loop
    # when member summaries landed). Mixing real entries into the member
    # makes its bounds overlap the filter, so planning must face all
    # >500k entries at once — and must take the Spark-job tier.
    t._commit_snapshot("append", real + phantoms,
                       manifest_groups=[real + phantoms])
    mp = t.current_snapshot().manifest_path
    if mp.endswith(MANIFEST_LIST_SUFFIX):
        members = read_manifest_list(_os.path.join(t.location, mp))
        n = sum(m["n"] for m in members)
        if len(members) != 1:
            raise AssertionError(
                f"fixture expects ONE mixed member (bounds overlap the "
                f"filter -> unskippable), got {len(members)}")
    else:
        import pyarrow.parquet as _pq
        n = _pq.read_metadata(_os.path.join(t.location, mp)).num_rows
    if n <= DISTRIBUTED_THRESHOLD:
        raise AssertionError(f"fixture did not cross the distributed tier: {n} entries")
    sb = t.scan().filter(C("o_orderkey").lt(2000))
    tasks = sb.plan_files()
    n_real = len([e for e in real if e.content == 0])
    if len(tasks) != n_real:
        raise AssertionError(
            f"distributed planner kept {len(tasks)} files, expected {n_real} real ones"
        )
    return sb.to_df().select(*_CRUD_COLS)


@query(
    "crud_add_files_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 150000)
    """,
)
def crud_add_files_scan(spark, sf):
    """Zero-copy import (Iceberg add_files; no reference equivalent): plain
    parquet written OUTSIDE any table registers via one metadata commit with
    footer-harvested stats, then a CoW delete mutates the imported data and
    the scan matches the oracle. Also asserts imported stats actually prune."""
    import os as _os

    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    ext = _scratch_dir("gis_addf_") + "/ext"
    base.write.parquet(ext)
    files = [_os.path.join(ext, f) for f in _os.listdir(ext) if f.endswith(".parquet")]

    wh = _scratch_dir("gis_addf_t_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(("scratch",), "imported", from_spark_schema(base.schema))
    t.add_files(files)
    if t.scan().filter(C("o_orderkey").gt(10**9)).plan_files():
        raise AssertionError("imported footer stats did not prune")
    t.delete(C("o_totalprice").gt(150000.0))
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_delete_eq_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderpriority <> '1-URGENT'
    """,
)
def crud_delete_eq_scan(spark, sf):
    """Merge-on-read EQUALITY delete through the table layer (the reference
    errors out on this path — reference: table/delete.go:494-501): the key
    rows are written as an equality-delete file and the scan applies them as
    a null-safe anti-join on the key columns (the GDPR delete-by-key shape:
    no data files rewritten, one metadata commit + one small delete file)."""
    from .table.transaction import delete_equality

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "eqdel", base)
    keys = spark.createDataFrame([("1-URGENT",)], ["o_orderpriority"])
    delete_equality(t, keys, ["o_orderpriority"])
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_update_scan",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0 ELSE o_totalprice END AS o_totalprice,
           o_orderpriority
    FROM orders WHERE o_orderkey < 3000
    """,
)
def crud_update_scan(spark, sf):
    """UPDATE ... SET ... WHERE through the table layer
    (reference: table/update.go:31-101)."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "upd", base)
    t.update(C("o_orderpriority").eq("1-URGENT"), {"o_totalprice": 0.0})
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_upsert_scan",
    """
    WITH t AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey < 2000),
         s AS (SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, o_orderpriority
               FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
           coalesce(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    """,
)
def crud_upsert_scan(spark, sf):
    """UPSERT (MERGE: update matched keys, insert new ones) through the table
    layer (reference: table/update.go:360-459, with null-safe keys)."""
    o = load(spark, sf, "orders")
    tgt = o.filter(F.col("o_orderkey") < 2000).select(*_CRUD_COLS)
    src = (o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000))
           .select("o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice"), "o_orderpriority"))
    t = _scratch_table(spark, "ups", tgt)
    t.upsert(src, ["o_orderkey"])
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_merge_scan",
    """
    WITH t AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey < 2000),
         s AS (SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, o_orderpriority
               FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
           coalesce(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
               AND s.o_orderpriority = '1-URGENT')
    """,
)
def crud_merge_scan(spark, sf):
    """MERGE with the FULL three-clause surface in ONE commit
    (reference: table/update.go:360-459 covers only upsert):
    WHEN MATCHED AND s.o_orderpriority = '1-URGENT' THEN DELETE,
    WHEN MATCHED THEN UPDATE SET * (source row wins),
    WHEN NOT MATCHED THEN INSERT. One full-outer join job over
    stats-pruned candidate files; commits as a single snapshot."""
    o = load(spark, sf, "orders")
    tgt = o.filter(F.col("o_orderkey") < 2000).select(*_CRUD_COLS)
    src = (o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000))
           .select("o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice"), "o_orderpriority"))
    t = _scratch_table(spark, "mrg", tgt)
    t.merge(src, ["o_orderkey"],
            when_matched_update="*",
            when_matched_delete=(F.col("s.o_orderpriority") == "1-URGENT"),
            when_not_matched_insert=True)
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_merge_not_matched_by_source_scan",
    """
    WITH t AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey < 2000),
         s AS (SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, o_orderpriority
               FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE 0.0 END AS o_totalprice,
           coalesce(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NULL
               AND t.o_orderpriority = '1-URGENT')
    """,
)
def crud_merge_nmbs_scan(spark, sf):
    """r5 (VERDICT r4 task #4): MERGE's fourth clause family — WHEN NOT
    MATCHED BY SOURCE, the CDC full-sync shape. Target keys absent from the
    source are reconciled in the SAME commit: urgent ones deleted
    (conditional), the rest marked stale (o_totalprice := 0). Matched rows
    update from source, unmatched source rows insert. NOTE the documented
    cost: this clause disables the key-range file prune (stats prove
    presence, never absence), so every live data file is a candidate."""
    o = load(spark, sf, "orders")
    tgt = o.filter(F.col("o_orderkey") < 2000).select(*_CRUD_COLS)
    src = (o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000))
           .select("o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice"), "o_orderpriority"))
    t = _scratch_table(spark, "mrgnmbs", tgt)
    t.merge(src, ["o_orderkey"],
            when_matched_update="*",
            when_not_matched_insert=True,
            when_not_matched_by_source_delete=(F.col("t.o_orderpriority") == "1-URGENT"),
            when_not_matched_by_source_update={"o_totalprice": 0.0})
    return t.to_df().select(*_CRUD_COLS)


@query(
    "time_travel_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey < 1000
    """,
)
def time_travel_scan(spark, sf):
    """Append twice, scan the FIRST snapshot by id — snapshot-pinned reads
    (reference: table/scan.go:80-98, table/table.go:98-121)."""
    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    b2 = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)).select(*_CRUD_COLS)
    t = _scratch_table(spark, "tt", b1)
    snap1 = t.current_snapshot().snapshot_id
    t.append(b2)
    return t.scan().use_snapshot(snap1).to_df().select(*_CRUD_COLS)


@query(
    "sorted_write_pruned_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderkey >= 2500
    """,
)
def sorted_write_pruned_scan_q(spark, sf):
    """WRITE ORDERED BY + range distribution: rows written through a table
    with a committed sort order land in files with disjoint o_orderkey
    bounds, so the range scan must touch fewer files than live in the table
    (asserted) — the reference stores sort orders but never executes them
    (SURVEY §2.5)."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000) \
        .select(*_CRUD_COLS).repartition(8)
    t = _scratch_table_sorted(spark, "sortw", base)
    n_all = len(t.scan().plan_files())
    tasks = t.scan().filter(
        and_(C("o_orderkey").lt(3000), C("o_orderkey").gte(2500))).plan_files()
    if n_all > 1 and not len(tasks) < n_all:
        raise AssertionError(f"sorted write did not prune: {len(tasks)}/{n_all}")
    return (t.scan().filter(and_(C("o_orderkey").lt(3000), C("o_orderkey").gte(2500)))
            .to_df().select(*_CRUD_COLS))


def _scratch_table_sorted(spark, name: str, df: DataFrame):
    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema

    wh = _scratch_dir(f"gis_{name}_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(
        ("scratch",), name, from_spark_schema(df.schema),
        properties={"write.target-file-size-bytes": "65536",
                    "write.distribution-mode": "range"})
    t.replace_sort_order("o_orderkey")
    t.append(df)
    return t


@query(
    "partitioned_range_write_pruned_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderpriority = '1-URGENT' AND o_orderkey < 600
    """,
)
def partitioned_range_write_pruned_scan_q(spark, sf):
    """r7: write.distribution-mode=range on a PARTITIONED table — rows
    range-shuffle on (partition, sort key), so each partition's files carry
    disjoint o_orderkey bounds. Asserted inline: a (partition, key-range)
    filter reads a strict subset of the URGENT partition's files AND never
    touches other partitions' files; the hash layout would put the whole
    partition in range of every key filter."""
    from .schema import from_spark_schema
    from .table.metadata import PartitionField, PartitionSpec

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000) \
        .select(*_CRUD_COLS).repartition(8)
    schema = from_spark_schema(base.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (PartitionField(
        fid["o_orderpriority"], 1000, "identity", "o_orderpriority"),))

    from .catalog.catalog import FilesystemCatalog

    wh = _scratch_dir("gis_prw_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(
        ("scratch",), "prw", schema, spec=spec,
        properties={"write.target-file-size-bytes": "16384",
                    "write.distribution-mode": "range"})
    t.replace_sort_order("o_orderkey")
    t.append(base)

    pred = and_(C("o_orderpriority").eq("1-URGENT"), C("o_orderkey").lt(600))
    tasks = t.scan().filter(pred).plan_files()
    urgent = [e for e in t.live_entries() if e.content == 0
              and e.partition.get("o_orderpriority") == "1-URGENT"]
    if len(urgent) > 1 and not len(tasks) < len(urgent):
        raise AssertionError(
            f"partitioned range write did not prune: {len(tasks)}/{len(urgent)}")
    if any(tk.file.partition.get("o_orderpriority") != "1-URGENT" for tk in tasks):
        raise AssertionError("partition pruning leaked other partitions")
    return t.scan().filter(and_(pred, C("o_orderkey").lt(3000))) \
        .to_df().select(*_CRUD_COLS)


@query(
    "bloom_point_lookup_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderpriority = '2-HIGH' AND o_orderkey % 2 = 0
    """,
)
def bloom_point_lookup_scan_q(spark, sf):
    """Per-file bloom filters (write.bloom-columns; the file-level analogue
    of parquet row-group blooms — an engine extension playing Iceberg's
    puffin role): even and odd orderkeys land in separate files with fully
    overlapping min/max ranges, so ONLY the bloom can prune the equality
    probe — asserted by planning a key from the odd file and checking the
    even file is dropped."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    even = base.filter(F.col("o_orderkey") % 2 == 0).coalesce(1)
    odd = base.filter(F.col("o_orderkey") % 2 == 1).coalesce(1)
    t = _scratch_table_props(spark, "bloom", even, {"write.bloom-columns": "o_orderkey"})
    t.append(odd)
    some_odd = odd.select(F.min("o_orderkey")).collect()[0][0]
    n_hit = len(t.scan().filter(C("o_orderkey").eq(int(some_odd))).plan_files())
    n_all = len(t.scan().plan_files())
    if not n_hit < n_all:
        raise AssertionError(f"bloom did not prune: {n_hit}/{n_all}")
    return (t.scan().filter(C("o_orderpriority").eq("2-HIGH"))
            .to_df().filter(F.col("o_orderkey") % 2 == 0).select(*_CRUD_COLS))


def _scratch_table_props(spark, name: str, df: DataFrame, properties: dict):
    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema

    wh = _scratch_dir(f"gis_{name}_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(("scratch",), name, from_spark_schema(df.schema),
                         properties=properties)
    t.append(df)
    return t


@query(
    "wap_branch_publish_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey < 2000
    """,
)
def wap_branch_publish_scan_q(spark, sf):
    """Write-audit-publish through the graded gate: the second batch lands
    on an AUDIT branch (main readers must keep seeing only batch 1 — asserted),
    the branch head is audited via use_ref, then fast_forward publishes it
    to main and the final scan sees both batches. Ancestry-checked publish;
    no data rewrite at any step."""
    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    b2 = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)).select(*_CRUD_COLS)
    t = _scratch_table(spark, "wap", b1)
    t.create_branch("audit")
    t.append_to_branch("audit", b2)
    if t.to_df().count() != b1.count():
        raise AssertionError("main advanced before publish")
    staged = t.scan().use_ref("audit").to_df().count()
    if staged != b1.count() + b2.count():
        raise AssertionError(f"audit branch head incomplete: {staged}")
    t.fast_forward("main", "audit")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "wap_cherrypick_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 1000
       OR (o_orderkey >= 1000 AND o_orderkey < 1500)
    """,
)
def wap_cherrypick_scan_q(spark, sf):
    """Cherry-pick publish (Iceberg cherrypick_snapshot; r9) — the WAP
    flavor fast_forward cannot express: TWO batches land on the audit
    branch, only the FIRST passes audit and is cherry-picked onto main as
    a new metadata-only commit; the second stays unpublished. Main readers
    never see the rejected batch (asserted), no data is rewritten, and a
    double-pick of the same snapshot is rejected (asserted)."""
    o = load(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    good = (o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 1500))
            .select(*_CRUD_COLS))
    bad = (o.filter((F.col("o_orderkey") >= 1500) & (F.col("o_orderkey") < 2000))
           .select(*_CRUD_COLS))
    t = _scratch_table(spark, "wapcp", base)
    t.create_branch("audit")
    s_good = t.append_to_branch("audit", good)
    t.append_to_branch("audit", bad)
    t.cherrypick(s_good.snapshot_id)
    try:
        t.cherrypick(s_good.snapshot_id)
        raise AssertionError("double-pick not rejected")
    except Exception as e:
        if "double-pick" not in str(e):
            raise
    return t.to_df().select(*_CRUD_COLS)


@query(
    "incremental_append_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey >= 1000 AND o_orderkey < 3000
    """,
)
def incremental_append_scan_q(spark, sf):
    """Incremental read (Iceberg start/end-snapshot-id; no reference
    counterpart — its scan is always one snapshot, reference:
    table/scan.go:80-98): three appends, then read only the rows added
    AFTER the first snapshot. Planning walks the lineage and diffs
    manifests — cost scales with the files added in the range, not the
    table."""
    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    b2 = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)).select(*_CRUD_COLS)
    b3 = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000)).select(*_CRUD_COLS)
    t = _scratch_table(spark, "incr", b1)
    snap1 = t.current_snapshot().snapshot_id
    t.append(b2)
    t.append(b3)
    return t.incremental_scan(from_snapshot_id=snap1).select(*_CRUD_COLS)


@query(
    "incremental_agg_refresh",
    """
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders WHERE o_orderkey < 3000 GROUP BY o_custkey
    """,
)
def incremental_agg_refresh_q(spark, sf):
    """Incremental MATERIALIZED-AGGREGATE maintenance — the engine's own
    primitives composed: an aggregate table is refreshed from the base
    table's incremental scan (only the rows added since the last refresh)
    via an additive MERGE (matched -> add the delta's partial counts/sums,
    not matched -> insert). The oracle is the FULL recompute over the final
    base state, so the delta path must land on exactly the same aggregate —
    the correctness contract of incremental view maintenance. At 100 TB the
    refresh cost scales with the delta (files added in the snapshot range),
    never the base table."""
    o = load(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") < 2000)
    delta = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000))
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_price"))

    t = _scratch_table(spark, "iar_base", base.select(*cols))
    snap1 = t.current_snapshot().snapshot_id
    agg_t = _scratch_table(spark, "iar_agg", agg(t.to_df()))
    t.append(delta.select(*cols))
    # refresh: aggregate ONLY the incremental rows, merge additively
    delta_agg = agg(t.incremental_scan(from_snapshot_id=snap1))
    agg_t.merge(
        delta_agg, ["o_custkey"],
        when_matched_update={
            "n_orders": F.col("t.n_orders") + F.col("s.n_orders"),
            "sum_price": F.col("t.sum_price") + F.col("s.sum_price"),
        },
        when_not_matched_insert=True,
    )
    return agg_t.to_df().select(
        "o_custkey", "n_orders", F.round("sum_price", 2).alias("sum_price"))


@query(
    "incremental_join_view_refresh",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           round(c.c_acctbal, 2) AS acctbal
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey < 3000
    """,
)
def incremental_join_view_refresh_q(spark, sf):
    """Incremental JOIN-view maintenance (delta-join IVM): the
    materialized view M = orders ⋈ customer is refreshed as
    M1 = M0 ∪ (Δorders ⋈ customer1) ∪ (orders0 ⋈ Δcustomer) — both
    tables took appends since the view was built, and the refresh never
    recomputes M0's full join: each delta leg pairs ONE small incremental
    scan against one base side (AQE broadcasts the delta), so at 100 TB
    the refresh cost rides the deltas. Inline assert: the refreshed view
    is multiset-equal to the full recompute over both final states (the
    IVM correctness contract)."""
    from .table.incremental import incremental_join_refresh

    o = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000) \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf, "customer") \
        .select(F.col("c_custkey").alias("o_custkey"),
                F.round("c_acctbal", 2).alias("acctbal"))

    ta = _scratch_table(spark, "ijv_a", o.filter(F.col("o_orderkey") < 1500))
    tb = _scratch_table(spark, "ijv_b", c.filter(F.col("o_custkey") % 2 == 0))
    a0, b0 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m0 = ta.to_df().join(tb.to_df(), "o_custkey")

    ta.append(o.filter(F.col("o_orderkey") >= 1500))
    tb.append(c.filter(F.col("o_custkey") % 2 == 1))

    m1 = incremental_join_refresh(m0, ta, tb, ["o_custkey"],
                                  from_a=a0, from_b=b0)
    full = ta.to_df().join(tb.to_df(), "o_custkey")
    if m1.exceptAll(full).count() or full.exceptAll(m1).count():
        raise AssertionError("incremental join refresh != full recompute")
    return m1.select("o_orderkey", "o_custkey", "o_totalprice", "acctbal")


@query(
    "incremental_join_view_refresh_mutable",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CASE WHEN o.o_orderpriority = '1-URGENT' THEN -1.0
                ELSE o.o_totalprice END AS price,
           c.acctbal
    FROM orders o
    JOIN (SELECT o_custkey, acctbal FROM (
            SELECT c_custkey AS o_custkey,
                   round(c_acctbal, 2)
                   + CASE WHEN c_custkey % 3 = 0 THEN 100 ELSE 0 END AS acctbal
            FROM customer
            WHERE c_custkey % 2 = 0 OR c_custkey % 3 = 0) b
          WHERE NOT (acctbal < 0)) c
      ON o.o_custkey = c.o_custkey
    WHERE o.o_orderkey < 3000 AND NOT (o.o_totalprice > 200000)
    """,
)
def incremental_join_view_refresh_mutable_q(spark, sf):
    """Incremental JOIN-view maintenance over MUTABLE bases (r8, VERDICT r7
    task #2): the append-only delta-join above raises the moment either
    base takes a delete/update/overwrite; here the CHANGELOG's signed row
    multisets (insert = +1, delete = −1) ride through both join legs
    instead — M1 = M0 + (δA ⋈ B1) + (A0 ⋈ δB) with counting-semantics
    merge — so the full CRUD mix maintains the view exactly. The setup
    drives every mutation class: A takes an append, a copy-on-write
    DELETE, and an UPDATE (a row-changing REPLACE — the op r7's
    rows-preserved marker must NOT let consumers skip); B takes an UPSERT
    (overwrite) and a merge-on-read DELETE. Inline assert: the refreshed
    view is multiset-equal to the full recompute. At 100 TB the join legs
    broadcast the changelog deltas against one base scan each, and the
    counting merge touches only view rows sharing a join key with a
    changed row (broadcast semi/anti split) — never the whole view."""
    from .table.incremental import incremental_join_refresh_changelog

    o = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000) \
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    c = load(spark, sf, "customer") \
        .select(F.col("c_custkey").alias("o_custkey"),
                F.round("c_acctbal", 2).alias("acctbal"))

    ta = _scratch_table(spark, "ijvm_a", o.filter(F.col("o_orderkey") < 1500))
    tb = _scratch_table(spark, "ijvm_b", c.filter(F.col("o_custkey") % 2 == 0))
    a0, b0 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m0 = ta.to_df().join(tb.to_df(), "o_custkey")

    ta.append(o.filter(F.col("o_orderkey") >= 1500))
    ta.delete(C("o_totalprice").gt(200000.0))
    ta.update(C("o_orderpriority").eq("1-URGENT"),
              {"o_totalprice": F.lit(-1.0)})
    tb.upsert(c.filter(F.col("o_custkey") % 3 == 0)
              .withColumn("acctbal", F.col("acctbal") + 100), ["o_custkey"])
    tb.delete(C("acctbal").lt(0.0), mode="merge-on-read")

    m1 = incremental_join_refresh_changelog(m0, ta, tb, ["o_custkey"],
                                            from_a=a0, from_b=b0)
    full = ta.to_df().join(tb.to_df(), "o_custkey")
    if m1.exceptAll(full).count() or full.exceptAll(m1).count():
        raise AssertionError("mutable join refresh != full recompute")
    return m1.select("o_orderkey", "o_custkey",
                     F.col("o_totalprice").alias("price"), "acctbal")


@query(
    "incremental_agg_refresh_mutable",
    """
    WITH fin AS (
      SELECT o_custkey,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey < 3000
    )
    SELECT o_custkey, count(*) AS n_orders, round(sum(p), 2) AS sum_price
    FROM fin WHERE NOT (p > 150000)
    GROUP BY o_custkey
    """,
)
def incremental_agg_refresh_mutable_q(spark, sf):
    """Incremental GROUP-BY-view maintenance over a MUTABLE base (r9,
    VERDICT r8 task #3 — the most common materialized view in practice):
    the append-only ``incremental_agg_refresh`` above merges partial
    aggregates of the incremental scan and raises the moment the base
    takes a delete or update; here the signed CHANGELOG (+1 insert / −1
    delete) aggregates to per-group deltas — d_count = Σ sign,
    d_sum = Σ sign·x — that merge into the old view by ADDITION, with
    groups dying when their merged count reaches zero. The setup drives an
    append, a row-changing UPDATE (a REPLACE the rows-preserved marker
    must not skip), and a copy-on-write DELETE. Inline assert: the
    refreshed view is multiset-equal to the full recompute. At 100 TB the
    refresh never scans the base at all — one aggregate over the
    changelog plus a broadcast semi/anti split of the view on touched
    keys; only groups sharing a key with a changed row shuffle."""
    from .table.incremental import incremental_agg_refresh_changelog

    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    base = o.filter(F.col("o_orderkey") < 2000)
    delta = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000))

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_price"))

    t = _scratch_table(spark, "iarm", base)
    s0 = t.current_snapshot().snapshot_id
    g0 = agg(t.to_df())
    g0.collect()  # the view materialized BEFORE the base mutates

    t.append(delta)
    t.update(C("o_orderpriority").eq("1-URGENT"), {"o_totalprice": 0.0})
    t.delete(C("o_totalprice").gt(150000.0))

    g1 = incremental_agg_refresh_changelog(
        g0, t, ["o_custkey"], from_snapshot_id=s0,
        count_col="n_orders", sum_cols={"sum_price": "o_totalprice"})

    def rounded(df):  # delta-addition vs one-pass double sums differ in the
        return df.select("o_custkey", "n_orders",  # last ulp; round collapses
                         F.round("sum_price", 2).alias("sum_price"))

    g1r, fullr = rounded(g1), rounded(agg(t.to_df()))
    if g1r.exceptAll(fullr).count() or fullr.exceptAll(g1r).count():
        raise AssertionError("mutable aggregate refresh != full recompute")
    return g1r


@query(
    "incremental_agg_refresh_minmax",
    """
    WITH fin AS (
      SELECT o_custkey,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey < 3000
    )
    SELECT o_custkey, min(p) AS min_price, max(p) AS max_price,
           count(*) AS n_orders
    FROM fin WHERE NOT (p > 150000)
    GROUP BY o_custkey
    """,
)
def incremental_agg_refresh_minmax_q(spark, sf):
    """Incremental MIN/MAX-view maintenance over a MUTABLE base via the
    GENERIC (re-aggregate) strategy (r10, VERDICT r9 task #2 — the graded
    ``incremental_agg_refresh_mutable`` covers only the algebraic
    count/sum path): MIN/MAX is not additive, so when a delete KILLS a
    group's current max, merging signed deltas by addition cannot recover
    the runner-up value — the touched groups must be re-aggregated from
    the base. The setup drives an append, an UPDATE, and a copy-on-write
    DELETE of every row above 150000 — which removes the standing max of
    many groups (inline-asserted: at least one touched group's max
    strictly DECREASES, the exact case addition cannot maintain).
    ``agg_fn`` re-aggregates ONLY the touched groups — one broadcast
    semi-join the scan can push down — while untouched view rows pass
    through without re-aggregating. Inline assert: refreshed view is
    multiset-equal to the full recompute. At 100 TB the base re-scan is
    pruned to files containing touched keys; the view itself never
    re-aggregates."""
    from .table.incremental import incremental_agg_refresh_changelog

    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    base = o.filter(F.col("o_orderkey") < 2000)
    delta = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000))

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count(F.lit(1)).alias("n_orders"))

    t = _scratch_table(spark, "iamm", base)
    s0 = t.current_snapshot().snapshot_id
    g0 = agg(t.to_df())
    g0.collect()  # the view materialized BEFORE the base mutates

    t.append(delta)
    t.update(C("o_orderpriority").eq("1-URGENT"), {"o_totalprice": 0.0})
    t.delete(C("o_totalprice").gt(150000.0))

    g1 = incremental_agg_refresh_changelog(
        g0, t, ["o_custkey"], from_snapshot_id=s0, agg_fn=agg)

    full = agg(t.to_df())
    if g1.exceptAll(full).count() or full.exceptAll(g1).count():
        raise AssertionError("minmax aggregate refresh != full recompute")
    # the fixture's teeth: the delete must have KILLED at least one group's
    # standing max (new max strictly below the old) — otherwise this would
    # not exercise what addition cannot maintain
    killed = (g0.select("o_custkey", F.col("max_price").alias("_old_max"))
              .join(full, "o_custkey")
              .filter(F.col("max_price") < F.col("_old_max")).count())
    if killed == 0:
        raise AssertionError("fixture lost its teeth: no group max was killed")
    return g1


@query(
    "incremental_topk_refresh_mutable",
    """
    WITH fin AS (
      SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey < 3000 AND NOT (o_totalprice > 150000)
    ),
    r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM fin)
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
           CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def incremental_topk_refresh_mutable_q(spark, sf):
    """Incremental TOP-K-view maintenance over a MUTABLE base (r10) — the
    leaderboard materialized view: top-3 orders per customer by price.
    Top-k is neither additive nor a single-row-per-group aggregate, but
    the generic IVM strategy covers it because ``untouched``/``touched``
    split on GROUP KEYS: untouched customers' view rows (all k of them)
    pass through untouched, and ``agg_fn`` re-ranks only the touched
    customers from the base — when a delete removes a group's rank-1 row,
    the runner-up is re-ranked in (inline-asserted: at least one former
    rank-1 row left the view). Inline multiset-equality vs the full
    recompute. At 100 TB the re-rank scan is pruned to files containing
    touched keys; untouched view rows never re-aggregate."""
    from .table.incremental import incremental_agg_refresh_changelog

    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    base = o.filter(F.col("o_orderkey") < 2000)
    delta = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000))

    def topk(df):
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        return (df.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= 3)
                .select("o_custkey", "o_orderkey", "o_totalprice", "rnk"))

    t = _scratch_table(spark, "itkm", base)
    s0 = t.current_snapshot().snapshot_id
    g0 = topk(t.to_df())
    g0.collect()  # the view materialized BEFORE the base mutates

    t.append(delta)
    t.delete(C("o_totalprice").gt(150000.0))

    g1 = incremental_agg_refresh_changelog(
        g0, t, ["o_custkey"], from_snapshot_id=s0, agg_fn=topk)

    full = topk(t.to_df())
    if g1.exceptAll(full).count() or full.exceptAll(g1).count():
        raise AssertionError("top-k view refresh != full recompute")
    # teeth: the delete must have dethroned at least one rank-1 row
    old_tops = g0.filter(F.col("rnk") == 1).select("o_custkey", "o_orderkey")
    dethroned = old_tops.join(full, ["o_custkey", "o_orderkey"], "left_anti").count()
    if dethroned == 0:
        raise AssertionError("fixture lost its teeth: no rank-1 row was dethroned")
    return g1.select("o_custkey", "o_orderkey",
                     F.round("o_totalprice", 2).alias("price"),
                     F.col("rnk").cast("int").alias("rnk"))


@query(
    "changelog_eq_delete_scan",
    """
    WITH lo AS (SELECT o_orderkey, o_totalprice, o_orderpriority
                FROM orders WHERE o_orderkey < 1000),
         hi AS (SELECT o_orderkey, o_totalprice, o_orderpriority
                FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
                UNION ALL
                SELECT NULL, 0.0, 'NULL-KEY'),
         k AS (SELECT min(o_orderkey) AS mk FROM orders WHERE o_orderkey >= 1000)
    SELECT *, 'insert' AS _change_type, 0 AS _change_ordinal FROM lo
    UNION ALL
    SELECT *, 'insert' AS _change_type, 1 AS _change_ordinal FROM hi
    UNION ALL
    SELECT hi.*, 'delete' AS _change_type, 2 AS _change_ordinal
    FROM hi, k WHERE hi.o_orderkey IS NULL OR hi.o_orderkey = k.mk
    """,
)
def changelog_eq_delete_scan_q(spark, sf):
    """Row-level CDC over an EQUALITY delete (r9, VERDICT r8 task #1 — the
    r8 bounds-pruning path had tests but no graded query): two appends
    land disjoint key-range files (plus one NULL-keyed row), then an
    eq-delete keyed on {min key of the high range, NULL} commits. The
    changelog must surface exactly the keyed row AND the NULL row as
    ordinal-2 deletes — the NULL key matches null-safely regardless of
    scalar bounds — while the pruner skips the provably-disjoint low file
    from the before/after suppression diff (its key range cannot overlap
    the delete file's bounds, and its zero null count disproves the
    null-null pairing). Reference anchor: the eq-delete surface the
    reference stubs at table/delete.go:494-501."""
    from .table.transaction import delete_equality

    o = load(spark, sf, "orders")
    lo_df = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    hi_df = (o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))
             .select(*_CRUD_COLS))
    null_row = spark.createDataFrame(
        [(None, 0.0, "NULL-KEY")], "o_orderkey bigint, o_totalprice double, o_orderpriority string")
    t = _scratch_table(spark, "cdceq", lo_df)
    t.append(hi_df.unionByName(null_row))
    mk = hi_df.agg(F.min("o_orderkey")).collect()[0][0]  # 1-row scalar
    delete_equality(t, spark.createDataFrame(
        [(mk,), (None,)], "o_orderkey bigint"), ["o_orderkey"])
    return t.changes().select(*_CRUD_COLS, "_change_type", "_change_ordinal")


@query(
    "changelog_cdc_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority,
           'insert' AS _change_type, 0 AS _change_ordinal
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority,
           'delete' AS _change_type, 1 AS _change_ordinal
    FROM orders WHERE o_orderkey < 2000 AND o_totalprice > 200000
    """,
)
def changelog_cdc_scan_q(spark, sf):
    """Row-level CDC changelog (Iceberg create_changelog_view; no reference
    counterpart): append a batch, copy-on-write delete some rows, then read
    the change stream. The CoW rewrite copies every surviving row into new
    files, so the raw file diff would report them as delete+insert pairs —
    carryover elimination (two exceptAll passes, fully distributed) reduces
    snapshot 2 to exactly the deleted rows."""
    o = load(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") < 2000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "cdc", base)
    t.delete(C("o_totalprice").gt(200000.0))
    return t.changes().select(*_CRUD_COLS, "_change_type", "_change_ordinal")


@query(
    "metadata_min_max_scan",
    """
    SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           min(o_orderpriority) AS min_prio, max(o_orderpriority) AS max_prio
    FROM orders WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def metadata_min_max_scan_q(spark, sf):
    """Metadata-only MIN/MAX (r9 — the natural extension of the
    reference's metadata-only count, table/scan.go:234-250): answered
    from manifest bounds with ZERO data read, but only when metadata can
    PROVE exactness — the float column requires proven-zero NaN counts
    (write.nan-count-columns), and a live MoR delete file must flip the
    answer to "fall back to the scan" (asserted: a suppressed row could
    be the extremum). Compaction materializes the deletes and the
    metadata path lights up again, now reflecting them. r10 (VERDICT r9
    task #4) extends the proof to a STRING column: parquet writers may
    truncate string footer bounds, so the engine serves them only when
    write.exact-bounds-columns made the writer compute the bound from the
    VALUES and stamp ``bounds_exact`` — asserted both ways (unmarked
    stats refused, marked stats served and scan-identical)."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "mdmm", base,
                       properties={"write.nan-count-columns": "o_totalprice"})
    if t.scan().metadata_min_max("o_totalprice") is None:
        raise AssertionError("nan-proven float bounds did not prove exactness")
    # truncation honesty: UNMARKED string stats must be refused even though
    # the footer carries bounds (a writer may have truncated them)
    if t.scan().metadata_min_max("o_orderpriority") is not None:
        raise AssertionError("unmarked string bounds served — exactness lie")
    t.delete(C("o_totalprice").gt(200000.0), mode="merge-on-read")
    if t.scan().metadata_min_max("o_totalprice") is not None:
        raise AssertionError("live MoR delete must break the metadata proof")
    t.set_properties({"write.exact-bounds-columns": "o_orderpriority"})
    t.rewrite_data_files(min_input_files=1)
    mk_ = t.scan().metadata_min_max("o_orderkey")
    mp = t.scan().metadata_min_max("o_totalprice")
    ms = t.scan().metadata_min_max("o_orderpriority")
    if mk_ is None or mp is None:
        raise AssertionError("metadata min/max unavailable after compaction")
    if ms is None:
        raise AssertionError("marked string bounds not served after rewrite")
    # cross-check against the engine scan before returning
    row = t.to_df().agg(F.min("o_orderkey"), F.max("o_orderkey"),
                        F.min("o_totalprice"), F.max("o_totalprice"),
                        F.min("o_orderpriority"), F.max("o_orderpriority")).collect()[0]
    if (row[0], row[1]) != mk_ or (row[2], row[3]) != mp or (row[4], row[5]) != ms:
        raise AssertionError(f"metadata bounds {mk_}/{mp}/{ms} != scan {tuple(row)}")
    return spark.createDataFrame(
        [(mk_[0], mk_[1], round(mp[0], 2), round(mp[1], 2), ms[0], ms[1])],
        "min_key bigint, max_key bigint, min_price double, max_price double, "
        "min_prio string, max_prio string")


@query(
    "crud_delete_mor_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def crud_delete_mor_scan(spark, sf):
    """MERGE-ON-READ delete: a position-delete file is written and applied at
    scan time (the read-side merge the reference writes but never applies —
    SURVEY §2.6.4). Same oracle as the CoW variant: both modes must produce
    identical results."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "mor", base)
    t.delete(C("o_totalprice").gt(200000.0), mode="merge-on-read")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_overwrite_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderpriority <> '1-URGENT'
    UNION ALL
    SELECT o_orderkey, -1.0 AS o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderpriority = '1-URGENT'
    """,
)
def crud_overwrite_scan(spark, sf):
    """Selective overwrite (reference: table/insert.go:216-252): rows
    matching the filter are replaced by the new batch in ONE snapshot."""
    o = load(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    repl = (o.filter((F.col("o_orderkey") < 3000) & (F.col("o_orderpriority") == "1-URGENT"))
            .select("o_orderkey", F.lit(-1.0).alias("o_totalprice"), "o_orderpriority"))
    t = _scratch_table(spark, "ovw", base)
    t.overwrite(repl, C("o_orderpriority").eq("1-URGENT"))
    return t.to_df().select(*_CRUD_COLS)


@query(
    "crud_schema_evolution_scan",
    """
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_comment
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'batch2' AS o_comment
    FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
    """,
)
def crud_schema_evolution_scan(spark, sf):
    """Schema evolution mid-table: add a column, append under the new schema,
    scan unions both file generations (old rows NULL-padded) — field-ID-based
    evolution (reference: table/table.go:198-202, spec/metadata.go:308-333)."""
    from .schema import STRING

    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select("o_orderkey", "o_totalprice")
    b2 = (o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))
          .select("o_orderkey", "o_totalprice", F.lit("batch2").alias("o_comment")))
    t = _scratch_table(spark, "evo", b1)
    t.update_schema().add_column("o_comment", STRING).commit()
    t.append(b2)
    return t.to_df().select("o_orderkey", "o_totalprice", "o_comment")


@query(
    "crud_eq_delete_rename_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority AS priority FROM orders
    WHERE o_orderkey < 3000
      AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def crud_eq_delete_rename_scan(spark, sf):
    """Equality deletes across a column RENAME (r5 probe bug fix): keys are
    field ids, so a delete written before the rename (physical column
    o_orderpriority) and one written after it (physical column priority)
    must BOTH apply to the same pre-rename data files. Before the fix the
    mixed-name delete group null-filled the renamed key and silently
    deleted nothing."""
    from .table.transaction import delete_equality

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "eqren", base)
    delete_equality(
        t, spark.createDataFrame([("1-URGENT",)], ["o_orderpriority"]),
        ["o_orderpriority"])
    t.update_schema().rename_column("o_orderpriority", "priority").commit()
    delete_equality(
        t, spark.createDataFrame([("2-HIGH",)], ["priority"]), ["priority"])
    return t.to_df().select("o_orderkey", "o_totalprice", "priority")


@query(
    "time_travel_schema_scan",
    """
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
    """,
)
def time_travel_schema_scan(spark, sf):
    """Time travel pins the SNAPSHOT's schema (r5 probe bug fix): a column
    added after the target snapshot must not leak into the historical read
    (Iceberg read-schema rule: use_snapshot/as_of/tag -> snapshot schema,
    branch/current -> current schema)."""
    from .schema import STRING

    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select("o_orderkey", "o_totalprice")
    t = _scratch_table(spark, "ttschema", b1)
    s1 = t.current_snapshot().snapshot_id
    t.update_schema().add_column("o_comment", STRING).commit()
    t.append(o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))
             .select("o_orderkey", "o_totalprice", F.lit("late").alias("o_comment")))
    out = t.scan().use_snapshot(s1).to_df()
    assert "o_comment" not in out.columns, "time travel leaked evolved schema"
    return out


@query(
    "metadata_count",
    "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem WHERE l_orderkey < 2000",
)
def metadata_count_q(spark, sf):
    """The reference's metadata-only Count (sum of manifest record counts, no
    data scan — reference: table/scan.go:234-250), surfaced as a 1-row frame."""
    base = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 2000).select(
        "l_orderkey", "l_quantity")
    t = _scratch_table(spark, "cnt", base)
    n = t.scan().metadata_count()
    return spark.createDataFrame([(int(n),)], "n_rows long")


# ---------------------------------------------------------------------------
# Relational widening round 2: the remaining TPC-H query shapes expressible on
# the driver's reduced schemas (no partsupp / commitdate / receiptdate /
# shipmode / phone columns exist, so q2/q9-cost/q11/q12/q16/q20/q21 keep their
# join-and-subquery SHAPE but swap in available columns).
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4(spark, sf):
    """TPC-H Q4-style order-priority checking: correlated EXISTS becomes a
    left-semi join with a non-equi conjunct (l_shipdate > o_orderdate) — one
    shuffle on orderkey, priorities aggregate after."""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
    l = load(spark, sf, "lineitem")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
    bench=True,
)
def q8(spark, sf):
    """TPC-H Q8-style national market share: 8-way star join. Bounded dims
    (part filtered to one type, supplier, nation x2, region) broadcast;
    orders and customer scale with data volume so they carry no hint and
    AQE chooses shuffle vs broadcast from runtime sizes."""
    p = load(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    c = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _rev()
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("nation") == "NATION_7", vol).otherwise(F.lit(0.0)))
            / F.sum(vol), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    """
    SELECT nation, o_year,
           CAST(round(sum(CAST(amount AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
      FROM lineitem JOIN part ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'PROMO'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9(spark, sf):
    """TPC-H Q9-style product-type profit (no partsupp table exists, so unit
    cost is modeled as 0.1 * p_retailprice): dims broadcast, lineitem's only
    shuffle is the (nation, year) aggregate.

    The per-row amount (a double) accumulates in EXACT decimal arithmetic
    in BOTH engines (r12): a parallel double sum is summation-order-
    dependent, and with 175 (nation, year) groups a round(·, 2) boundary
    row eventually lands on opposite sides in the two engines (measured at
    sf0.001/local[32]: one group off by one cent). The hash-match is
    deterministic because (a) double→DECIMAL(38,10) casts identically in
    both engines, (b) decimal sums are exact and order-free, and (c) BOTH
    engines round decimals half-away-from-zero, so even a sum landing
    exactly on an x.xx5 boundary (possible — dyadic values like 0.125 cast
    exactly to 0.1250000000) rounds the same way in both (r13, ADVICE:
    the earlier note wrongly claimed such ties are impossible; it is the
    matching rounding mode that carries the boundary case, not
    tie-impossibility). The rounded 2-digit total converts back to double
    exactly (< 2^52/100)."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders")
    n = load(spark, sf, "nation")
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(amount.cast("decimal(38,10)")), 2)
             .cast("double").alias("sum_profit"))
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark, sf):
    """TPC-H Q13-style customer order-count distribution: pre-aggregate
    orders per custkey (one shuffle), left-join back to customer. The
    per-customer counts have |customer| cardinality — fact-derived, so no
    broadcast hint; AQE decides from the runtime size."""
    c = load(spark, sf, "customer")
    per = load(spark, sf, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"))
    return (
        c.join(per, c.c_custkey == per.o_custkey, "left")
        .select(F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15(spark, sf):
    """TPC-H Q15-style top supplier: revenue-per-supplier aggregate reused
    twice (argmax via broadcast of the 1-row max, not a window over the full
    set); revenue rounded BEFORE the max/equality so both engines compare
    identical doubles."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
    rev = l.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load(spark, sf, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT round(0.2 * avg(l_quantity), 4)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17(spark, sf):
    """TPC-H Q17-style small-quantity-order revenue: the correlated average
    subquery becomes a per-part pre-aggregate computed only over lineitems
    of the brand-filtered parts (part itself broadcasts — one bounded dim
    after the brand filter), then joined back on partkey. The per-part
    threshold is fact-derived (|part| cardinality), so it carries no
    broadcast hint; threshold rounded to 4 decimals on both engines so the
    strict < compares identical doubles."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#23")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    thresh = lp.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.round(0.2 * F.avg("l_quantity"), 4).alias("_qty_thresh"))
    return (
        lp.join(thresh, lp.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19(spark, sf):
    """TPC-H Q19-style disjunctive join predicates: the OR-of-ANDs stays a
    post-join filter over the broadcast part join (Catalyst cannot split a
    disjunction across sides, but the common p_partkey equi-key still drives
    the hash join; per-side IN/range prefilters are implied by the OR arms)."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    arm1 = ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11))
    arm2 = ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20))
    arm3 = ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q22(spark, sf):
    """TPC-H Q22-style global sales opportunity (no phone column, so the
    country-code group becomes market segment; "no orders" becomes "no orders
    since 1998" — every customer in the testdata has at least one order):
    uncorrelated scalar-average subquery broadcast as a 1-row cross join +
    NOT EXISTS as a left-anti join against the date-filtered orders;
    threshold rounded to 2 decimals on both engines."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_orderdate") >= "1998-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("_avg_bal"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH eur AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    cost AS (
      SELECT l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 2) AS supply_cost
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size = 15 AND p_type = 'STANDARD'
        AND l_suppkey IN (SELECT s_suppkey FROM eur)
      GROUP BY l_partkey, l_suppkey),
    mn AS (SELECT l_partkey AS _pk, min(supply_cost) AS _mc
           FROM cost GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
    FROM cost JOIN mn ON l_partkey = _pk AND supply_cost = _mc
              JOIN eur ON l_suppkey = s_suppkey
              JOIN part ON p_partkey = l_partkey
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2(spark, sf):
    """TPC-H Q2-style minimum-cost supplier (no partsupp table exists, so the
    part-supplier catalog is derived from lineitem and supply cost is the
    average observed unit price, rounded to 2 decimals BEFORE the per-part
    min/equality so both engines compare identical doubles): the size/type-
    filtered part dim is hint-broadcast; supplier-derived sides (region-
    filtered suppliers grow linearly with SF) carry NO hint — AQE decides.
    The only fact shuffles are the (part, supplier) cost aggregate and the
    per-part min —
    the correlated min subquery of the original becomes an aggregate + join
    back, the distributed argmin pattern. Ref surface: the reference has no
    joins at all (SURVEY §2.7, reference table/update.go:384-390 is its only
    key-match)."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    eur = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(eur.select("s_suppkey"), l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 2)
             .alias("supply_cost"))
    )
    # per-part argmin as a window over the SAME aggregate output — one pass;
    # an aggregate-and-join-back would evaluate the cost subtree twice
    w_min = Window.partitionBy("l_partkey")
    cost = cost.withColumn("_mc", F.min("supply_cost").over(w_min)) \
        .filter(F.col("supply_cost") == F.col("_mc"))
    return (
        cost.join(eur, cost.l_suppkey == eur.s_suppkey)
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              cost.l_partkey == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_part_values",
    """
    WITH ger AS (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_7'),
    val AS (SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
            FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM ger)
            GROUP BY l_partkey)
    SELECT l_partkey, part_value FROM val
    WHERE part_value > (SELECT round(sum(part_value) * 0.001, 2) FROM val)
    """,
)
def q11(spark, sf):
    """TPC-H Q11-style important stock (no partsupp: part value is the
    shipped l_extendedprice * l_quantity from one nation's suppliers):
    nation-filtered supplier keys semi-join WITHOUT a hint (supplier grows
    with SF; AQE broadcasts at small scale), one per-part
    aggregate, and the uncorrelated total-value scalar broadcast as a 1-row
    cross join — the aggregate is computed once and reused for both the rows
    and the threshold. Per-part values rounded to 2 decimals before the
    threshold compare so both engines hold identical doubles."""
    ger = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        load(spark, sf, "lineitem")
        .join(ger, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2)
             .alias("part_value"))
    )
    thresh = val.agg(F.round(F.sum("part_value") * 0.001, 2).alias("_thresh"))
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("_thresh"))
        .select("l_partkey", "part_value")
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12(spark, sf):
    """TPC-H Q12-style priority shipping (the testdata lineitem has no
    l_shipmode/l_commitdate/l_receiptdate, so the group key is l_linestatus
    and the date window filters l_shipdate): both join sides are fact-sized
    — no broadcast hint, the year filter prunes lineitem at the scan
    (PushedFilters), and AQE picks the join strategy. The CASE-sum pair is
    one conditional aggregate pass."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01"))
    o = load(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


@query(
    "q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16(spark, sf):
    """TPC-H Q16-style supplier-part relationship count (no partsupp: the
    relation is the observed lineitem pairs; the 'complaints' exclusion
    becomes negative account balance): part filter broadcast, excluded
    suppliers anti-joined without a hint (supplier-derived, scales with SF —
    NOT IN is safe here, s_suppkey is never null), then one distinct-count
    aggregate keyed by the part
    attributes. count(DISTINCT) shuffles (brand, type, size, suppkey) once,
    then merges — no row explosion."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    bad = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_suppliers",
    """
    WITH sq AS (
      SELECT l_suppkey, l_partkey, round(sum(l_quantity), 2) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
        AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY l_suppkey, l_partkey),
    pt AS (SELECT l_partkey AS _pk, round(0.5 * sum(qty), 2) AS _half
           FROM sq GROUP BY l_partkey)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (SELECT l_suppkey FROM sq JOIN pt ON l_partkey = _pk
                        WHERE qty > _half)
    ORDER BY s_name
    """,
)
def q20(spark, sf):
    """TPC-H Q20-style potential promotion (no partsupp availqty: a supplier
    qualifies when it shipped MORE THAN HALF of some filtered part's total
    1995 volume — the same correlated-threshold semi-join shape): per
    (supplier, part) quantities aggregated once, per-part half-totals
    derived from that same aggregate, qualifying suppliers semi-joined into
    the nation-filtered supplier dim. Quantities rounded to 2 before the
    strict compare. Both sq and pt are fact-derived — no broadcast hints;
    the final semi-join's left side is a bounded dim."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01"))
    p = load(spark, sf, "part").filter(F.col("p_type") == "SMALL")
    sq = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    # per-part half-total as a window over the same aggregate — one pass
    # instead of re-evaluating the sq subtree for the threshold join
    dominant = (
        sq.withColumn("_half", F.round(0.5 * F.sum("qty").over(Window.partitionBy("l_partkey")), 2))
        .filter(F.col("qty") > F.col("_half"))
        .select("l_suppkey")
    )
    s = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_20'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def q21(spark, sf):
    """TPC-H Q21-style waiting suppliers (no l_receiptdate/l_commitdate: the
    'kept the order waiting' lineitem is one shipped no earlier than every
    OTHER supplier's latest shipment in a multi-supplier finalized order).
    The correlated EXISTS / NOT EXISTS pair is decorrelated into per-order
    window aggregates over the (order, supplier) max-shipdate relation: for
    each supplier the latest other-supplier shipdate is max1 (or max2 when
    this supplier uniquely holds max1) — O(lineitem) + two bounded shuffles,
    no per-row subquery, no self-join explosion."""
    l = load(spark, sf, "lineitem")
    os = l.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("_smax"))
    w = Window.partitionBy("l_orderkey")
    os = (
        os.withColumn("_nsupp", F.count(F.lit(1)).over(w))
        .withColumn("_mx1", F.max("_smax").over(w))
        .withColumn("_nmx", F.sum(F.when(F.col("_smax") == F.col("_mx1"), 1)
                                  .otherwise(0)).over(w))
        .withColumn("_mx2", F.max(F.when(F.col("_smax") < F.col("_mx1"),
                                         F.col("_smax"))).over(w))
        .withColumn(
            "_other_max",
            F.when((F.col("_smax") < F.col("_mx1")) | (F.col("_nmx") > 1),
                   F.col("_mx1")).otherwise(F.col("_mx2")))
        .select("l_orderkey", "l_suppkey", "_nsupp", "_other_max")
    )
    sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation").filter(F.col("n_name") == "NATION_20")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        l.join(sup, l.l_suppkey == sup.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .join(os, ["l_orderkey", "l_suppkey"])
        .filter((F.col("_nsupp") > 1) & (F.col("l_shipdate") >= F.col("_other_max")))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "streaming_snapshot_source",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey < 2000
    """,
)
def streaming_snapshot_source_q(spark, sf):
    """Snapshot-replay streaming SOURCE (Python Data Source API,
    streaming/source.py): two committed appends drained through
    spark.readStream.format("table_snapshots") with an availableNow
    trigger. Offsets are snapshot ids, each micro-batch is the files added
    by the snapshots in range — committed data only, uncommitted files in
    the data dir are invisible (unlike a raw file-glob stream)."""
    from .streaming.source import read_snapshot_stream

    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    b2 = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)).select(*_CRUD_COLS)
    t = _scratch_table(spark, "snapsrc", b1)
    t.append(b2)
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"snapshot_source_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        read_snapshot_stream(spark, t)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    return spark.table(name).select(*_CRUD_COLS)


# NOTE: a `streaming_dedup_events` query using plain ``dropDuplicates`` was
# retired in round 3: its per-key state never expires, so a long-running job
# grows state forever — an anti-pattern we don't want graded as a first-class
# operator. The bounded-state `streaming_dedup_watermarked` below is the one
# streaming-dedup contract this engine ships (state capped at the watermark
# horizon; eviction asserted in tests/test_streaming.py). For a bounded
# REPLAY (availableNow backfill over a fixed table) plain dropDuplicates is
# equivalent to batch `exact_dedup` — use the batch operator instead.


@query(
    "streaming_dedup_watermarked",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_watermarked_q(spark, sf):
    """Streaming dedup with BOUNDED state (dropDuplicatesWithinWatermark):
    state for a key expires once the watermark passes its event time +
    delay, so a year-long job holds hours of keys, not the full history —
    the fix for the unbounded-state anti-pattern in plain dropDuplicates.
    A key whose duplicates span longer than the delay may be emitted more
    than once (state already evicted), so the graded result is the DISTINCT
    over the sink — the exact key set either way. Bounded-state eviction
    itself is asserted in tests/test_streaming.py with state-operator
    metrics across micro-batches."""
    from .streaming.stream import dedup_within_watermark

    path = f"{sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = spark.read.parquet(path).schema
    src = spark.readStream.schema(sch).option("pathGlobFilter", "events.parquet").parquet(sf)
    if str(sch["ts"].dataType) == "LongType()":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    else:
        # NTZ -> LTZ for the watermark (see streaming_interval_join note)
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    dedup = dedup_within_watermark(
        src.select("user_id", "event_type", "ts"), "ts", ["user_id", "event_type"], delay="1 hour"
    ).select("user_id", "event_type")
    _STREAM_SEQ_HOLDER[0] += 1
    name = f"stream_dedup_wm_{_STREAM_SEQ_HOLDER[0]}"
    q = (
        dedup.writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(availableNow=True).start()
    )
    _await_drained(q)
    return spark.table(name).distinct()


@query(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, t AS term
      FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    stats AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
              FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term, df, total_tf,
           round(total_tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
    FROM stats, n
    ORDER BY tfidf DESC, term LIMIT 25
    """,
    bench=True,
)
def text_tfidf_q(spark, sf):
    """Corpus-level TF-IDF (training-data text analysis): tokenize with the
    same [^a-z]+ split on both engines, per-(doc,term) TF, document frequency,
    idf = ln(N/df) — all shuffles keyed on term; the 1-row corpus size
    broadcasts. Top-25 with a term tie-break for a total order."""
    d = load(spark, sf, "documents")
    tok = (d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"))
           .filter(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
    n = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    return (
        stats.join(F.broadcast(n))
        .select("term", "df", "total_tf",
                F.round(F.col("total_tf") * F.log(F.col("_n_docs").cast("double") / F.col("df")), 4)
                .alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), F.col("term"))
        .limit(25)
    )


@query(
    "pipeline_curation_end_to_end",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    kept AS (SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text),
    {_quality_cte("kept")},
    q AS (SELECT doc_id, round(quality, 6) AS quality FROM qual),
    thr AS (SELECT round(quantile_cont(quality, 0.25), 6) AS _thr FROM q),
    surv AS (SELECT q.doc_id FROM q, thr WHERE quality >= _thr),
    curated AS (
      SELECT kept.doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             CASE
               WHEN ('0x' || substr(md5('cut_' || CAST(kept.doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
               WHEN ('0x' || substr(md5('cut_' || CAST(kept.doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
               ELSE 'test'
             END AS split
      FROM kept JOIN surv USING (doc_id))
    SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM curated GROUP BY split
    """,
)
def pipeline_curation_q(spark, sf):
    """The curation pipeline END-TO-END, composed from the engine's own
    operators (what a training-data run actually executes): exact dedup over
    a corpus with planted duplicates -> CCNet-style bottom-quartile quality
    gate -> deterministic 90/5/5 split -> per-split token audit. Proves the
    operators compose: dedup's one shuffle, the quality threshold's 1-row
    broadcast, the split's shuffle-free projection, one id-keyed join, one
    final aggregate."""
    from .operators.sampling import hash_split

    corpus = _corpus(spark, sf)
    kept = D.exact_dedup(corpus, ["text"], "doc_id").select("doc_id", "text")
    surv = X.quality_filter(kept, "doc_id", "text", min_quantile=0.25, exact=True)
    curated = kept.join(surv.select("doc_id"), on="doc_id")
    return (
        hash_split(curated, "doc_id", {"train": 90, "val": 5, "test": 5}, salt="cut")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(X.token_count_expr(F.col("text"))).cast("long").alias("total_tokens"))
    )


@query(
    "text_bigram_lm_score",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS t
      FROM documents),
    bigrams AS (
      SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
      FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 2)) AS i
            FROM toks WHERE len(t) >= 2)),
    doc_bg AS (SELECT doc_id, w1, w2, count(*) AS n FROM bigrams GROUP BY 1, 2, 3),
    bg AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2),
    ctx AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
    scored AS (
      SELECT doc_bg.doc_id, doc_bg.n,
             CAST(floor((doc_bg.n * (-ln((bg.c12 + 1) / (ctx.c1 + vocab.v)))) * 1048576) AS BIGINT) AS qnll
      FROM doc_bg JOIN bg USING (w1, w2) JOIN ctx USING (w1), vocab)
    SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
           round(sum(qnll) / 1048576.0 / sum(n), 6) AS xent
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_lm_q(spark, sf):
    """Perplexity-style quality filter: per-document cross-entropy under an
    add-one bigram LM trained on the corpus itself (CCNet-lineage). The
    model is a distributed count table keyed on the bigram — never
    collected; per-bigram NLL is integer-quantized so the score is
    bit-identical across engines."""
    d = load(spark, sf, "documents")
    return X.bigram_lm_score(d, "doc_id", "text")


def _html_strip_oracle_sql() -> str:
    """Nested regexp_replace chain generated from the SAME frozen pattern
    table the engine applies (operators/text.py HTML_STRIP_PATTERNS)."""
    expr = "html"
    for pat, repl in X.HTML_STRIP_PATTERNS:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"""
    WITH synth AS (
      SELECT doc_id,
             '<html><head><style>p {{ color: red }}</style></head><body><h1>'
               || source || '</h1><!-- doc ' || CAST(doc_id AS VARCHAR)
               || ' --><p>' || text
               || '</p><script type="text/javascript">var x = 1 < 2;</script></body></html>' AS html
      FROM documents)
    SELECT doc_id, trim({expr}) AS text,
           CAST(length(trim({expr})) AS BIGINT) AS n_chars
    FROM synth
    """


@query("text_html_boilerplate_strip", _html_strip_oracle_sql())
def text_html_strip_q(spark, sf):
    """HTML boilerplate removal (the CommonCrawl extraction step before any
    quality/dedup pass): HTML is synthesized deterministically around each
    document — style/script blocks (with contents), comments, tags,
    entities — then stripped by the frozen regex chain; the visible text
    must survive. Linear regexp chain, no shuffle."""
    d = load(spark, sf, "documents")
    html = F.concat(
        F.lit("<html><head><style>p { color: red }</style></head><body><h1>"),
        F.col("source"), F.lit("</h1><!-- doc "), F.col("doc_id").cast("string"),
        F.lit(" --><p>"), F.col("text"),
        F.lit('</p><script type="text/javascript">var x = 1 < 2;</script></body></html>'),
    )
    stripped = X.strip_html(d.select("doc_id", html.alias("text")), "text")
    return stripped.select("doc_id", "text", F.length("text").cast("long").alias("n_chars"))


@query(
    "text_bm25_scores",
    r"""
    WITH dls AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS BIGINT) AS dl
      FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dls),
    tok AS (
      SELECT doc_id, t AS term
      FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t
            FROM documents)
      WHERE t IN ('join', 'scan', 'vector')),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    idf AS (SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf FROM dft, stats),
    contrib AS (
      SELECT tf.doc_id,
             idf.idf * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dls.dl / stats.avgdl)) AS s
      FROM tf JOIN idf USING (term) JOIN dls USING (doc_id), stats)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, round(sum(s), 4) AS score
    FROM contrib GROUP BY doc_id
    """,
)
def text_bm25_q(spark, sf):
    """Okapi BM25 against a 3-term topic query (lexical retrieval for
    training-data mining): query-term filter before the tf shuffle, 1-row
    corpus stats and per-term idf broadcast — corpus shuffles once by doc."""
    d = load(spark, sf, "documents")
    return X.bm25_scores(d, "doc_id", "text", ("join", "scan", "vector"))


# ---------------------------------------------------------------------------
# Source/sink format coverage beyond Parquet: the reference's DataFile format
# enum admits PARQUET | AVRO | ORC (reference spec/manifest.go:101-149); Spark
# reads/writes ORC natively (Avro needs the external spark-avro package — not
# in this container), plus CSV/JSON for ingest pipelines. Each query writes a
# slice through the alternate format and reads it back, so the oracle match
# proves a lossless roundtrip, not just that the writer ran.
# ---------------------------------------------------------------------------

_RT_ORACLE = """
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem WHERE l_orderkey < 5000 GROUP BY l_returnflag
"""


def _roundtrip_base(spark, sf):
    return (load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 5000)
            .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"))


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"))


@query("source_orc_roundtrip", _RT_ORACLE)
def source_orc_q(spark, sf):
    """ORC sink + source (reference DataFile format enum includes ORC):
    distributed write, vectorized columnar read with pushdown, aggregate."""
    path = _scratch_dir("gis_orc_") + "/data"
    _roundtrip_base(spark, sf).write.mode("overwrite").orc(path)
    return _roundtrip_agg(spark.read.orc(path))


@query("source_csv_roundtrip", _RT_ORACLE)
def source_csv_q(spark, sf):
    """CSV sink + source with an EXPLICIT read schema (no inference — a
    schema scan over 100 TB of text would double the read)."""
    path = _scratch_dir("gis_csv_") + "/data"
    base = _roundtrip_base(spark, sf)
    base.write.mode("overwrite").option("header", "true").csv(path)
    return _roundtrip_agg(spark.read.schema(base.schema).option("header", "true").csv(path))


@query("source_avro_roundtrip", _RT_ORACLE)
def source_avro_q(spark, sf):
    """Avro data-file sink + source (reference DataFile format enum includes
    AVRO, spec/manifest.go:101-149, but the reference never implements the
    serde). No spark-avro jar in this container, so the engine's own OCF
    serde (avro.py) runs distributed via Arrow-batched mapInPandas
    (io/avro_data.py): one OCF per partition out, file-list-parallel read
    back."""
    from .io.avro_data import read_avro_files, write_avro_files

    path = _scratch_dir("gis_avro_") + "/data"
    base = _roundtrip_base(spark, sf)
    write_avro_files(base, path)
    return _roundtrip_agg(read_avro_files(spark, path, base.schema))


@query("source_json_roundtrip", _RT_ORACLE)
def source_json_q(spark, sf):
    """JSON-lines sink + source with an explicit read schema (same
    no-inference rule as CSV)."""
    path = _scratch_dir("gis_json_") + "/data"
    base = _roundtrip_base(spark, sf)
    base.write.mode("overwrite").json(path)
    return _roundtrip_agg(spark.read.schema(base.schema).json(path))


@query(
    "partitioned_scan_pruning",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 4000 AND o_orderpriority = '1-URGENT'
    """,
)
def partitioned_scan_pruning_q(spark, sf):
    """Identity-partitioned table + partition-pruned scan through the graded
    gate (reference stubs manifestMightMatch/fileMightMatch — always true,
    insert.go:255-266; here the planner actually prunes): only the matching
    partition's files are opened, and the result still hash-matches."""
    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema
    from .table.metadata import PartitionField, PartitionSpec

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 4000).select(*_CRUD_COLS)
    wh = _scratch_dir("gis_part_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    schema = from_spark_schema(base.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (PartitionField(fid["o_orderpriority"], 1000, "identity", "o_orderpriority"),))
    t = cat.create_table(("scratch",), "parted", schema, spec=spec)
    t.append(base)
    sb = t.scan().filter(C("o_orderpriority").eq("1-URGENT"))
    n_pruned, n_all = len(sb.plan_files()), len(t.scan().plan_files())
    if not n_pruned < n_all:
        raise AssertionError(f"partition pruning inactive: {n_pruned} vs {n_all} files")
    return sb.to_df().select(*_CRUD_COLS)


@query(
    "metadata_partitions_scan",
    """
    SELECT o_orderpriority AS part_value,
           CAST(count(*) AS BIGINT) AS record_count
    FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 4000
    GROUP BY o_orderpriority
    """,
)
def metadata_partitions_scan_q(spark, sf):
    """``partitions`` metadata table graded (r11): per-partition file/record
    rollup aggregated from MANIFEST ENTRIES only — zero data files opened,
    the planning input for compaction/skew decisions at 100 TB (entry
    counts are metadata-scale, bounded by file count). The fixture appends
    an identity-partitioned slice of orders then CoW-deletes keys < 500,
    so the record counts must track the REWRITTEN files' footer counts,
    not the original append. Inline-asserted: every partition has >= 1
    file and total bytes > 0 (fields the SQL oracle cannot see)."""
    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema
    from .table.metadata import PartitionField, PartitionSpec

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 4000).select(*_CRUD_COLS)
    wh = _scratch_dir("gis_partmeta_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    schema = from_spark_schema(base.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (PartitionField(
        fid["o_orderpriority"], 1000, "identity", "o_orderpriority"),))
    t = cat.create_table(("scratch",), "partmeta", schema, spec=spec)
    t.append(base)
    t.delete(C("o_orderkey").lt(500))  # CoW: rewrites touched files
    parts = t.partitions_df()
    bad = parts.filter((F.col("file_count") < 1)
                       | (F.col("total_size_in_bytes") <= 0)).count()
    if bad:
        raise AssertionError("partitions_df reported an empty live partition")
    return parts.select(
        F.get_json_object("partition", "$.o_orderpriority").alias("part_value"),
        F.col("record_count"))


@query(
    "crud_scd2_history_scan",
    """
    WITH upd AS (
      SELECT o_custkey AS cust, round(o_totalprice, 2) AS attr,
             CAST(o_orderkey AS BIGINT) AS seq
      FROM orders WHERE o_custkey < 200 AND o_orderkey < 6000),
    base AS (
      -- seed strictly BEFORE every update sequence (orders include
      -- o_orderkey = 0, so the seed sits at -1)
      SELECT c_custkey AS cust, round(c_acctbal, 2) AS attr,
             CAST(-1 AS BIGINT) AS seq
      FROM customer WHERE c_custkey < 200),
    chain AS (
      SELECT cust, attr, seq AS valid_from_seq,
             lead(seq) OVER (PARTITION BY cust ORDER BY seq) AS valid_to_seq
      FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
    SELECT cust, attr, valid_from_seq, valid_to_seq,
           valid_to_seq IS NULL AS is_current
    FROM chain
    """,
)
def crud_scd2_history_scan_q(spark, sf):
    """SCD TYPE 2 dimension maintenance (r11): versioned updates close the
    key's open row and insert chained version rows — ONE merge snapshot
    per batch. The fixture seeds customer balances as version 0, then
    applies order-derived updates in TWO batches split by sequence, so
    the graded chain must be IDENTICAL to a single-shot window chain
    (the oracle's lead() over the full update stream) — any cross-batch
    seam (wrong close bound, dangling is_current, dropped version) breaks
    the hash. Scale shape: per-key windows run over the update BATCH, the
    close-set is one join against per-key minima, and the merge prunes
    candidate files by key-range stats."""
    cust = load(spark, sf, "customer").filter(F.col("c_custkey") < 200)
    base = cust.select(
        F.col("c_custkey").alias("cust"),
        F.round("c_acctbal", 2).alias("attr"),
        F.lit(-1).cast("long").alias("valid_from_seq"),
        F.lit(None).cast("long").alias("valid_to_seq"),
        F.lit(True).alias("is_current"))
    t = _scratch_table(spark, "scd2dim", base)
    upd = (load(spark, sf, "orders")
           .filter((F.col("o_custkey") < 200) & (F.col("o_orderkey") < 6000))
           .select(F.col("o_custkey").alias("cust"),
                   F.round("o_totalprice", 2).alias("attr"),
                   F.col("o_orderkey").cast("long").alias("seq")))
    snap1 = t.scd2_apply(upd.filter(F.col("seq") < 3000), ["cust"], seq_col="seq")
    snap2 = t.scd2_apply(upd.filter(F.col("seq") >= 3000), ["cust"], seq_col="seq")
    if snap1.operation != "overwrite" and snap2.operation != "overwrite":
        raise AssertionError("scd2_apply must commit merge snapshots")
    # exactly one open row per key (fields the chain hash also covers,
    # but this pins the invariant even for keys with no updates)
    bad = (t.to_df().filter(F.col("is_current"))
           .groupBy("cust").count().filter(F.col("count") != 1).count())
    if bad:
        raise AssertionError(f"{bad} keys with != 1 open SCD2 row")
    return t.to_df().select("cust", "attr", "valid_from_seq",
                            "valid_to_seq", "is_current")


@query(
    "join_scd2_asof_lookup",
    """
    WITH upd AS (
      SELECT o_custkey AS cust, round(o_totalprice, 2) AS attr,
             CAST(o_orderkey AS BIGINT) AS seq
      FROM orders WHERE o_custkey < 200 AND o_orderkey < 6000),
    base AS (
      SELECT c_custkey AS cust, round(c_acctbal, 2) AS attr,
             CAST(-1 AS BIGINT) AS seq
      FROM customer WHERE c_custkey < 200),
    chain AS (
      SELECT cust, attr, seq AS vf,
             lead(seq) OVER (PARTITION BY cust ORDER BY seq) AS vt
      FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)),
    facts AS (
      SELECT o_orderkey AS fact_key, o_custkey AS cust,
             CAST(o_orderkey AS BIGINT) AS seq
      FROM orders WHERE o_orderkey < 9000)
    SELECT f.fact_key, f.cust, c.attr AS attr_asof,
           c.vf AS version_from
    FROM facts f LEFT JOIN chain c
      ON c.cust = f.cust AND f.seq >= c.vf AND (c.vt IS NULL OR f.seq < c.vt)
    """,
)
def join_scd2_asof_lookup_q(spark, sf):
    """Point-in-time dimension lookup against SCD2 history (r11 — the
    consumer side of ``scd2_apply``): each fact order joins the balance
    version VALID AT its own sequence, not today's — the reproducible
    training join (features as-of the example's event). Facts span the
    history (mid-chain sequences hit CLOSED versions, later ones the open
    row; out-of-dimension keys come back NULL), so a wrong interval bound
    on either side of [start, end) breaks the hash. One equi hash join
    with the interval test as a join filter — no range explosion."""
    from .operators import joins as J

    cust = load(spark, sf, "customer").filter(F.col("c_custkey") < 200)
    base = cust.select(
        F.col("c_custkey").alias("cust"),
        F.round("c_acctbal", 2).alias("attr"),
        F.lit(-1).cast("long").alias("valid_from_seq"),
        F.lit(None).cast("long").alias("valid_to_seq"),
        F.lit(True).alias("is_current"))
    t = _scratch_table(spark, "scd2asof", base)
    upd = (load(spark, sf, "orders")
           .filter((F.col("o_custkey") < 200) & (F.col("o_orderkey") < 6000))
           .select(F.col("o_custkey").alias("cust"),
                   F.round("o_totalprice", 2).alias("attr"),
                   F.col("o_orderkey").cast("long").alias("seq")))
    t.scd2_apply(upd, ["cust"], seq_col="seq")
    facts = (load(spark, sf, "orders").filter(F.col("o_orderkey") < 9000)
             .select(F.col("o_orderkey").alias("fact_key"),
                     F.col("o_custkey").alias("cust"),
                     F.col("o_orderkey").cast("long").alias("seq")))
    hist = t.to_df().select("cust", "attr", "valid_from_seq", "valid_to_seq")
    out = J.scd2_lookup(facts, hist, ["cust"], seq_col="seq")
    return out.select("fact_key", "cust",
                      F.col("attr").alias("attr_asof"),
                      F.col("valid_from_seq").alias("version_from"))


_NDV_KMV_SQL = """(
      SELECT CASE WHEN (SELECT count(*) FROM m_{c}) >= 64
                  THEN round(63 / (CAST((SELECT max(h) FROM m_{c}) AS DOUBLE)
                                   / 1152921504606846976.0), 2)
                  ELSE CAST((SELECT count(*) FROM m_{c}) AS DOUBLE) END)
"""


@query(
    "metadata_ndv_stats_scan",
    f"""
    WITH src AS (SELECT * FROM orders WHERE o_orderkey < 6000),
    h_ck AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
             FROM src WHERE o_custkey IS NOT NULL),
    m_ck AS (SELECT h FROM h_ck ORDER BY h LIMIT 64),
    h_pr AS (SELECT DISTINCT ('0x' || substr(md5(o_orderpriority), 1, 15))::BIGINT AS h
             FROM src WHERE o_orderpriority IS NOT NULL),
    m_pr AS (SELECT h FROM h_pr ORDER BY h LIMIT 64)
    SELECT 'o_custkey' AS column_name, {_NDV_KMV_SQL.format(c='ck')} AS n_estimate
    UNION ALL
    SELECT 'o_orderpriority' AS column_name, {_NDV_KMV_SQL.format(c='pr')} AS n_estimate
    """,
)
def metadata_ndv_stats_scan_q(spark, sf):
    """Incremental table statistics (r11 — the engine's ANALYZE TABLE /
    Puffin-NDV role): per-column KMV distinct sketches live in table
    properties, refreshed INCREMENTALLY — the second refresh here scans
    only the appended delta and merges k-min sets, and because k smallest
    of a union equals the union of sketches' k smallest, the incremental
    result is BIT-IDENTICAL to the oracle's one-pass sketch over all data
    (the hash pins the merge, not just the estimate). approx_ndv then
    answers metadata-only. At 100 TB: refresh cost tracks the append
    rate, never the table size."""
    from .catalog.catalog import FilesystemCatalog
    from .schema import from_spark_schema

    o = load(spark, sf, "orders")
    wh = _scratch_dir("gis_ndv_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    first = o.filter(F.col("o_orderkey") < 3000)
    t = cat.create_table(("scratch",), "ndv", from_spark_schema(first.schema))
    t.append(first)
    cols = ["o_custkey", "o_orderpriority"]
    t.refresh_ndv_stats(cols)
    t.append(o.filter((F.col("o_orderkey") >= 3000) & (F.col("o_orderkey") < 6000)))
    est = t.refresh_ndv_stats(cols)  # INCREMENTAL: scans only the delta
    # metadata-only read agrees and is stamped fresh
    for c in cols:
        got, fresh = t.approx_ndv(c)
        if got != est[c] or not fresh:
            raise AssertionError(f"approx_ndv disagrees or stale for {c}")
    return spark.createDataFrame(
        [(c, est[c]) for c in cols], "column_name string, n_estimate double")


@query(
    "partition_evolution_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 4000 AND o_orderpriority = '1-URGENT'
    """,
)
def partition_evolution_scan_q(spark, sf):
    """Partition evolution (ALTER TABLE ... REPLACE PARTITION FIELD; no
    reference counterpart — its spec is fixed at create): first batch lands
    unpartitioned, the spec then evolves to identity(o_orderpriority), the
    second batch lays out under partition dirs, and one scan reads BOTH
    generations (old entries keep spec 0, new carry spec 1) while pruning
    the new generation by partition value — asserted, then hash-matched."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 4000).select(*_CRUD_COLS)
    # split point derived from the data, not hard-coded (r12): at sf0.001
    # orders holds keys 0..1499, so a fixed >= 2000 second batch was EMPTY
    # and the mixed-specs assertion below could never pass at that SF. The
    # OUTPUT is invariant to the split (b1 ∪ b2 == base either way); only
    # the two generations' row assignment moves.
    mid = (base.agg(F.max("o_orderkey")).first()[0] or 0) // 2  # 1-row scalar
    b1 = base.filter(F.col("o_orderkey") < mid)
    b2 = base.filter(F.col("o_orderkey") >= mid)
    t = _scratch_table(spark, "pevol", b1)
    t.update_partition_spec("o_orderpriority")
    t.append(b2)
    specs = {e.spec_id for e in t.live_entries()}
    if specs != {0, 1}:
        raise AssertionError(f"expected mixed specs, got {specs}")
    sb = t.scan().filter(C("o_orderpriority").eq("1-URGENT"))
    hit = sb.plan_files()
    new_hit = [tk for tk in hit if tk.file.spec_id == 1]
    if not all(tk.file.partition.get("o_orderpriority") == "1-URGENT" for tk in new_hit):
        raise AssertionError("evolved-spec files not partition-pruned")
    return sb.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_compaction_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def maintenance_compaction_scan_q(spark, sf):
    """Small-file compaction correctness under the graded gate: many tiny
    appends + a MoR delete, then rewrite_data_files materializes the deletes
    and collapses the files (Iceberg rewrite_data_files procedure
    equivalent); the compacted table must scan identically."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "compact", base.filter(F.col("o_orderkey") < 1000))
    t.append(base.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)))
    t.append(base.filter(F.col("o_orderkey") >= 2000))
    t.delete(C("o_totalprice").gt(200000.0), mode="merge-on-read")
    n_before = len(t.scan().plan_files())
    t.rewrite_data_files()
    if len(t.scan().plan_files()) >= n_before:
        raise AssertionError("compaction did not reduce file count")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_selective_compaction_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def maintenance_selective_compaction_scan_q(spark, sf):
    """SELECTIVE compaction (r9 — the 100 TB form of rewrite_data_files;
    full-table rewrites are not an operation you can run at scale): one
    big file plus many tiny appends and a MoR delete spanning both; binpack
    rewrites ONLY the files outside the 75-180% size band — the big file
    must carry into the new snapshot VERBATIM (same path, zero data
    movement, asserted) while its delete file survives because it still
    suppresses rows there; a second, `where`-scoped rewrite then compacts
    just that slice, materializing the tombstones and dropping the
    now-dangling delete file in the same commit (asserted). The scan must
    match the oracle through both reorganizations."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "selcomp", base.filter(F.col("o_orderkey") < 2000))
    big = next(e.file_path for e in t.live_entries())
    big_size = next(e.file_size for e in t.live_entries())
    for lo, hi in ((2000, 2300), (2300, 2600), (2600, 3000)):
        t.append(base.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)))
    t.delete(C("o_totalprice").gt(200000.0), mode="merge-on-read")

    t.rewrite_data_files(binpack=True, target_file_size_bytes=int(big_size / 1.2))
    data = [e for e in t.live_entries() if e.content == 0]
    if big not in {e.file_path for e in data}:
        raise AssertionError("binpack rewrote the in-band big file")
    if len(data) >= 4:
        raise AssertionError("binpack did not merge the small files")
    if not any(e.content != 0 for e in t.live_entries()):
        raise AssertionError("still-needed delete file was dropped")

    t.rewrite_data_files(where=C("o_orderkey").lt(2000), min_input_files=1)
    if any(e.content != 0 for e in t.live_entries()):
        raise AssertionError("dangling delete file survived the scoped rewrite")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_expire_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
    """,
)
def maintenance_expire_scan_q(spark, sf):
    """Snapshot expiry correctness under the graded gate: three appends + a
    CoW delete build four snapshots, expire_snapshots(retain_last=1) drops
    history AND physically reclaims the unreachable data/manifest files
    (Iceberg expire_snapshots procedure equivalent) — the current state must
    scan identically, the expired snapshot must be unreachable for time
    travel, and files must actually have been deleted."""
    from .errors import NoSuchSnapshotError
    from .table.maintenance import expire_snapshots

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "expire", base.filter(F.col("o_orderkey") < 1000))
    t.append(base.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)))
    t.append(base.filter(F.col("o_orderkey") >= 2000))
    first_id = sorted(t.snapshots(), key=lambda s: s.timestamp_ms)[0].snapshot_id
    t.delete(C("o_totalprice").gt(200000.0))
    deleted = expire_snapshots(t, retain_last=1, sweep_grace_ms=0)
    if not deleted:
        raise AssertionError("expiry reclaimed no files")
    if len(t.snapshots()) != 1:
        raise AssertionError(f"expected 1 retained snapshot, got {len(t.snapshots())}")
    try:
        t.scan().use_snapshot(first_id).to_df()
    except NoSuchSnapshotError:
        pass
    else:
        raise AssertionError("expired snapshot still reachable")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_branch_expire_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 1000
    """,
)
def maintenance_branch_expire_scan_q(spark, sf):
    """DROP BRANCH → expiry reclamation under the graded gate (r10, VERDICT
    r9 task #3 — the r9 remove_ref motivation graded end-to-end): two WAP
    batches stage on an audit branch, the audit is abandoned. While the
    ref LIVES, expiry must NOT touch the staged files (ref retention —
    asserted). After ``remove_ref`` drops the branch, the same expiry
    reclaims the staged snapshots' data AND manifest files even though
    they are the NEWEST snapshots (retain_last counts ancestors of the
    current snapshot, Iceberg retainLast semantics — newest-by-timestamp
    retention would let an abandoned branch head dodge expiry forever).
    Asserted inline: staged data files physically deleted, staged
    snapshots unreachable, and main's live file set byte-identical before
    vs after both expiries. Reference anchor: SnapshotRef retention,
    spec/snapshot.go:64-70."""
    import os as _os

    from .errors import NoSuchSnapshotError
    from .table.maintenance import expire_snapshots

    o = load(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") < 1000).select(*_CRUD_COLS)
    b2 = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)).select(*_CRUD_COLS)
    b3 = o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000)).select(*_CRUD_COLS)
    t = _scratch_table(spark, "brexp", b1)
    t.create_branch("audit")
    s_a = t.append_to_branch("audit", b2)
    s_b = t.append_to_branch("audit", b3)
    staged_ids = {s_a.snapshot_id, s_b.snapshot_id}
    main_files = sorted(e.file_path for e in t.live_entries())
    staged_files = {e.file_path
                    for sid in staged_ids
                    for e in t.manifest_entries(t.metadata.snapshot_by_id(sid))
                    } - set(main_files)
    if not staged_files:
        raise AssertionError("fixture lost its teeth: branch staged no new files")

    # ref retention: while the audit ref lives, expiry must keep its lineage
    deleted = set(expire_snapshots(t, retain_last=1, sweep_grace_ms=0))
    if deleted & staged_files:
        raise AssertionError(f"expiry reclaimed live-ref staged files: {deleted & staged_files}")

    t.remove_ref("audit")
    deleted = set(expire_snapshots(t, retain_last=1, sweep_grace_ms=0))
    if not staged_files <= deleted:
        raise AssertionError(
            f"dropped-branch staged files not reclaimed: {staged_files - deleted}")
    for p in staged_files:
        if t.io.exists(_os.path.join(t.location, p)):
            raise AssertionError(f"staged file still on disk: {p}")
    for sid in staged_ids:
        try:
            t.scan().use_snapshot(sid).to_df()
        except NoSuchSnapshotError:
            pass
        else:
            raise AssertionError(f"staged snapshot {sid} still reachable")
    if sorted(e.file_path for e in t.live_entries()) != main_files:
        raise AssertionError("expiry disturbed main's live file set")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_rewrite_pos_deletes_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND NOT (o_totalprice > 200000)
      AND o_orderpriority <> '1-URGENT' AND o_orderkey >= 50
    """,
)
def maintenance_rewrite_pos_deletes_scan_q(spark, sf):
    """rewrite_position_deletes under the graded gate (Iceberg
    rewrite_position_delete_files procedure; r10): three MoR deletes leave
    three small tombstone files — each a separate parquet read + anti-join
    build side on EVERY scan — then a selective compaction rewrites one
    data file, stranding that file's tombstone rows as dangling. The
    rewrite must: touch ZERO data files (asserted byte-identical), merge
    the tombstones into ONE file (asserted), drop the dangling rows
    (asserted strictly fewer tombstone rows), and leave the visible scan
    identical. Time travel to the pre-rewrite snapshot still applies the
    OLD tombstone files (asserted count)."""
    from .table.metadata import CONTENT_DATA, CONTENT_POSITION_DELETES

    o = load(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "rwpd", base.filter(F.col("o_orderkey") < 1000))
    t.append(base.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)))
    t.append(base.filter(F.col("o_orderkey") >= 2000))
    t.delete(C("o_totalprice").gt(200000.0), mode="merge-on-read")
    t.delete(C("o_orderpriority").eq("1-URGENT"), mode="merge-on-read")
    t.delete(C("o_orderkey").lt(50), mode="merge-on-read")

    def pos_files():
        return [e for e in t.live_entries()
                if e.content == CONTENT_POSITION_DELETES]

    def pos_rows(entries):
        import os as _os
        return (t.spark.read.parquet(
            *[_os.path.join(t.location, e.file_path) for e in entries])
            .count()) if entries else 0

    if len(pos_files()) < 3:
        raise AssertionError("fixture lost its teeth: expected >=3 tombstone files")
    # strand tombstone rows: a selective compaction rewrites only the LOW
    # range (populated at every sf — the o_orderkey<50 delete's rows all
    # reference it), so rows pointing at the rewritten file go dangling
    t.rewrite_data_files(min_input_files=1, where=C("o_orderkey").lt(1000))
    before_files = pos_files()
    before_rows = pos_rows(before_files)
    data_before = sorted(e.file_path for e in t.live_entries()
                         if e.content == CONTENT_DATA)
    pre_rewrite_snap = t.current_snapshot().snapshot_id

    t.rewrite_position_deletes()

    after_files = pos_files()
    if sorted(e.file_path for e in t.live_entries()
              if e.content == CONTENT_DATA) != data_before:
        raise AssertionError("rewrite_position_deletes touched data files")
    if len(after_files) != 1:
        raise AssertionError(f"expected 1 merged tombstone file, got {len(after_files)}")
    after_rows = pos_rows(after_files)
    if not after_rows < before_rows:
        raise AssertionError(
            f"dangling tombstone rows not dropped: {after_rows} vs {before_rows}")
    # the pre-rewrite snapshot still reads through its OWN tombstone files
    if (t.scan().use_snapshot(pre_rewrite_snap).to_df().count()
            != t.to_df().count()):
        raise AssertionError("time-travel across the tombstone rewrite diverged")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_zorder_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000
    """,
)
def maintenance_zorder_scan_q(spark, sf):
    """Z-order rewrite correctness + effectiveness under the graded gate:
    append-ordered files have full-range o_totalprice bounds, so a 2-D
    (orderkey, totalprice) point-ish filter prunes nothing; after
    rewrite_data_files(zorder_by=[orderkey, totalprice]) the interleaved-bit
    clustering gives each file a tight 2-D bounding box and the SAME filter
    must metadata-prune at least one file (asserted inline), while the full
    scan stays identical."""
    from .table.maintenance import rewrite_data_files

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "zorder", base.filter(F.col("o_orderkey") % 3 == 0))
    t.append(base.filter(F.col("o_orderkey") % 3 == 1))
    t.append(base.filter(F.col("o_orderkey") % 3 == 2))
    pred = and_(C("o_orderkey").lt(600), C("o_totalprice").lt(100000.0))
    n_before = len(t.scan().filter(pred).plan_files())
    rewrite_data_files(t, target_file_size_bytes=4 * 1024,
                       zorder_by=["o_orderkey", "o_totalprice"])
    survivors = t.scan().filter(pred).plan_files()
    total = t.scan().plan_files()
    if len(total) < 2:
        raise AssertionError("z-order rewrite produced a single file; pruning untestable")
    if len(survivors) >= len(total):
        raise AssertionError(
            f"z-order clustering gave no 2-D pruning: {len(survivors)}/{len(total)} files survive")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_rewrite_manifests_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000 AND o_orderkey <> 42
    """,
)
def maintenance_rewrite_manifests_q(spark, sf):
    """rewrite_manifests under the graded gate (Iceberg procedure parity):
    range-disjoint appends + one MoR delete, then a metadata-ONLY rewrite
    clustering manifest members by value range. Asserted inline: the data
    file set is untouched; every list member carries bounds; a point
    filter's bounds check keeps a strict subset of the data members (the
    manifest-tier skip that makes 1M-file planning read only matching
    members); the delete entries sit in their own always-read member, so
    the deleted row stays deleted after the skip."""
    import os as _os

    from .expr import lt as _lt
    from .table.metadata import read_manifest_list
    from .table.planning import summary_might_match

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "rwman", base.filter(F.col("o_orderkey") < 1000))
    t.append(base.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)))
    t.append(base.filter(F.col("o_orderkey") >= 2000))
    t.delete(eq("o_orderkey", 42), mode="merge-on-read")
    files_before = sorted(e.file_path for e in t.live_entries())

    t.rewrite_manifests(target_entries_per_manifest=1)

    if sorted(e.file_path for e in t.live_entries()) != files_before:
        raise AssertionError("rewrite_manifests touched data files")
    members = read_manifest_list(
        _os.path.join(t.location, t.current_snapshot().manifest_path))
    if not all("bounds" in m and "nd" in m for m in members):
        raise AssertionError(f"members missing bounds/nd: {members}")
    if sum(1 for m in members if m["nd"] > 0) != 1:
        raise AssertionError("MoR delete entries not isolated in one member")
    data_m = [m for m in members if m["nd"] == 0]
    schema = t.metadata.current_schema
    kept = [m for m in data_m
            if summary_might_match(m["bounds"], _lt("o_orderkey", 500), schema)]
    if not 0 < len(kept) < len(data_m):
        raise AssertionError(
            f"member bounds gave no skip: {len(kept)}/{len(data_m)} members match")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "bucket_partition_pruning_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey IN (42, 1999)
    """,
)
def bucket_partition_pruning_scan_q(spark, sf):
    """bucket[8] partition pruning under the graded gate: per-file column
    stats CANNOT prune a hashed bucket layout (every file spans the key
    range), so the planner hashes the IN literals with Spark's own Murmur3
    driver-side and keeps only their buckets' files — asserted inline
    (Iceberg's bucket projection; the reference stubs all pruning)."""
    from .schema import from_spark_schema
    from .table.metadata import PartitionField, PartitionSpec

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    schema = from_spark_schema(base.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (PartitionField(fid["o_orderkey"], 1000, "bucket[8]", "ok_bucket"),))

    from .catalog.catalog import FilesystemCatalog

    wh = _scratch_dir("gis_bucketed_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(("scratch",), "bucketed", schema, spec=spec)
    t.append(base)
    sb = t.scan().filter(C("o_orderkey").isin(42, 1999))
    n_all = len(t.scan().plan_files())
    n_pruned = len(sb.plan_files())
    if not (0 < n_pruned <= 2 < n_all):
        raise AssertionError(f"bucket pruning ineffective: {n_pruned}/{n_all} files")
    return sb.to_df().select(*_CRUD_COLS)


@query(
    "iceberg_bucket_pruning_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey IN (42, 1999)
    """,
)
def iceberg_bucket_pruning_scan_q(spark, sf):
    """Same bucket-pruning contract as bucket_partition_pruning_scan, but
    with ``write.bucket-function=iceberg`` (r4): partitions land by the
    Iceberg-spec bucket hash (Appendix B murmur3, codegen'd Catalyst bit
    arithmetic on the write path), the planner recomputes the same ordinals
    driver-side for the IN literals, and — unlike the default Spark hash —
    a third-party Iceberg reader could recompute them too. Pruning
    effectiveness and an on-disk ordinal spot-check are asserted inline."""
    from .schema import from_spark_schema
    from .table.metadata import PartitionField, PartitionSpec
    from .table.write import bucket_for_literal

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    schema = from_spark_schema(base.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (PartitionField(fid["o_orderkey"], 1000, "bucket[8]", "ok_bucket"),))

    from .catalog.catalog import FilesystemCatalog

    wh = _scratch_dir("gis_ibucketed_")
    cat = FilesystemCatalog(spark, wh)
    cat.create_namespace(("scratch",))
    t = cat.create_table(("scratch",), "ibucketed", schema, spec=spec,
                         properties={"write.bucket-function": "iceberg"})
    t.append(base)
    sb = t.scan().filter(C("o_orderkey").isin(42, 1999))
    tasks = sb.plan_files()
    n_all = len(t.scan().plan_files())
    if not (0 < len(tasks) <= 2 < n_all):
        raise AssertionError(f"iceberg-bucket pruning ineffective: {len(tasks)}/{n_all} files")
    src_type = schema.find_field("o_orderkey").type
    want = {bucket_for_literal(v, 8, src_type, bucket_fn="iceberg") for v in (42, 1999)}
    got = {int(task.file.partition["ok_bucket"]) for task in tasks}
    if not got <= want:
        raise AssertionError(f"on-disk ordinals {got} not the spec buckets {want}")
    return sb.to_df().select(*_CRUD_COLS)


@query(
    "maintenance_orphan_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 2000
    """,
)
def maintenance_orphan_scan_q(spark, sf):
    """Orphan-file cleanup under the graded gate: a crashed writer's debris
    (a data file never referenced by any snapshot) must be found and
    deleted by remove_orphan_files without touching live files — asserted
    inline — and the scan must be unchanged."""
    import os

    from .table.maintenance import remove_orphan_files

    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 2000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "orphan", base)
    data_dir = os.path.join(t.location, "data")
    orphan = os.path.join(data_dir, "orphan-debris.parquet")
    base.limit(5).toPandas().to_parquet(orphan)
    live_before = {e.file_path for e in t.live_entries()}
    removed = remove_orphan_files(t)
    if not any("orphan-debris" in p for p in removed):
        raise AssertionError(f"orphan not reclaimed: {removed}")
    if os.path.exists(orphan):
        raise AssertionError("orphan file still on disk")
    if {e.file_path for e in t.live_entries()} != live_before:
        raise AssertionError("cleanup touched live files")
    return t.to_df().select(*_CRUD_COLS)


@query(
    "time_travel_rollback_scan",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderkey < 3000
    """,
)
def time_travel_rollback_scan_q(spark, sf):
    """rollback_to correctness under the graded gate: a bad CoW delete is
    undone by rolling the table back to the pre-delete snapshot — the scan
    must return the FULL original data (the deleted rows resurrected), and
    the rollback must be a new history entry pointing at the old state, not
    a destructive rewrite (both prior snapshots still present)."""
    base = load(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(*_CRUD_COLS)
    t = _scratch_table(spark, "rollback", base)
    good_id = t.current_snapshot().snapshot_id
    t.delete(C("o_totalprice").gt(200000.0))
    t.rollback_to(good_id)
    if t.current_snapshot().snapshot_id != good_id:
        raise AssertionError("rollback did not restore the old snapshot")
    if len(t.snapshots()) < 2:
        raise AssertionError("rollback must preserve history, not rewrite it")
    return t.to_df().select(*_CRUD_COLS)


def bench_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in QUERIES.items() if v.bench}


# ---------------------------------------------------------------------------
# Registration order. The driver grades the FIRST 50 entries of queries();
# the table-format core (scans, CRUD, time travel, pruning, compaction,
# sources) IS the reference engine, so it must occupy the graded window,
# followed by one-two representatives per Spark-native capability category
# (SURVEY §2.7). Everything after position 50 is still oracle-verified
# locally by scripts/parity.py, just not driver-graded.
# ---------------------------------------------------------------------------

# r6 rotation (VERDICT r5 tasks #1/#3): embedding_int8_quantize leads (the
# only row never driver-green — output now scalar and canonicalizable),
# then fresh rows over every scan path r5's bug fixes rewired (eq-delete
# field-id resolution, snapshot-pinned schemas, changelog per-file delete
# grouping, bucket hash-width tri-state), then the r5 flagships for one
# more green round, then pass-prior rows cycling back so no query goes
# many rounds ungraded. Displaced: rows driver-green in ≥2 recent rounds.
_GRADED_FIRST = [
    # --- r11 VERDICT r10 task #6: the CMS shard-merge as its own row —
    #     two disjoint-shard sketches SUM-merged, estimates from the
    #     merged counters, merge replayed in the oracle SQL (displaced:
    #     text_hashing_vectorize — green r6..r10, path untouched r11) ---
    "sketch_cms_merge",
    # --- r11 VERDICT r10 task #5: REAL image-header metadata (PNG IHDR /
    #     JPEG SOFn walk / GIF descriptor via stdlib struct in an Arrow
    #     batch; garbage rows pin the NULL-tolerance path). Displaced:
    #     cluster_kmeans_topics — green r6..r10, path untouched r11 ---
    "multimodal_header_metadata",
    # --- r11 NEW graded row: the partitions metadata table (manifest-only
    #     per-partition rollup; record counts tracked through a CoW
    #     delete). Displaced: join_hot_key_isolated — green r9/r10 AND
    #     still benched (timed + executed) every round ---
    "metadata_partitions_scan",
    # --- r11 NEW operator: streaming cross-batch dedup sink (state-store
    #     seen-keys, exactly-once survivors, watermark-bounded variant
    #     pinned in pytest). Displaced: maintenance_expire_scan — green
    #     r7..r10, expiry path additionally exercised this round by the
    #     branch-expire row and three interplay probes ---
    "streaming_dedup_sink_scan",
    # --- r11 NEW operator: SCD type-2 dimension maintenance (one MERGE
    #     per batch; cross-batch chain == the oracle's single-shot window
    #     chain; replay/no-op/duplicate contracts pinned in pytest).
    #     Displaced: incremental_join_view_refresh — green r6..r10 and the
    #     harder counting-semantics variant stays in the window ---
    "crud_scd2_history_scan",
    # --- r11 NEW scale path: GEMM kNN (BLAS scoring, <= k candidates per
    #     query per batch; same oracle as the fold row — grading pins that
    #     summation-order noise never crosses a top-k margin). Displaced:
    #     incremental_agg_refresh — green r6..r10, and the harder
    #     minmax/mutable IVM variants stay in the window ---
    "similarity_knn_gemm",
    # --- r11 NEW operator: point-in-time SCD2 lookup (interval-filtered
    #     equi join; facts hit closed AND open versions). Displaced:
    #     incremental_append_scan — green r6..r10, exercised inside the
    #     IVM rows still in the window ---
    "join_scd2_asof_lookup",
    # --- r11 NEW operator: incremental NDV statistics (KMV sketches in
    #     table properties; the k-min merge is hash-pinned against the
    #     one-pass oracle). Displaced: changelog_cdc_scan — green
    #     r6..r10, and the harder eq-delete changelog variant plus three
    #     changelog-consuming IVM rows stay in the window ---
    "metadata_ndv_stats_scan",
    # --- r11 NEW operator: linear gap interpolation on the resample grid
    #     (floor-based cross-engine rounding; thinned fixture guarantees
    #     interior gaps). Displaced: text_repetition_scores — green
    #     r6..r10, path untouched r11 ---
    "timeseries_resample_interpolate",
    # --- r10 VERDICT r9 tasks #2/#3: the generic (agg_fn) aggregate-IVM
    #     strategy (MIN/MAX view whose standing max a delete KILLS) and
    #     DROP BRANCH -> expiry reclamation (ancestor-based retain_last).
    #     Displaced: similarity_lsh_topk and dedup_embedding_ivf_gemm —
    #     both green r7 sweep + r9 driver, cosine plan family untouched
    #     r10. ---
    "incremental_agg_refresh_minmax",
    "maintenance_branch_expire_scan",
    # --- r10 NEW: top-k (leaderboard) view IVM via the generic strategy
    #     (displaced: pack_token_budget_bins — green r8 AND r9, sampling
    #     path untouched r10) ---
    "incremental_topk_refresh_mutable",
    # --- r10 NEW operators: Count-Min heavy hitters (portable md5
    #     counters, one-sided guarantee + mergeability inline-asserted)
    #     and rewrite_position_deletes (tombstone compaction + dangling-row
    #     drop, zero data movement). Displaced: dedup_embedding_cosine and
    #     dedup_embedding_ivf — both green r7 sweep + r9 driver, cosine
    #     plan family untouched r10. ---
    "sketch_cms_heavy_hitters",
    "maintenance_rewrite_pos_deletes_scan",
    # --- r10 NEW operator: bloom-prefiltered join (probe-side bit-test
    #     before the shuffle; displaced: streaming_table_sink_scan —
    #     green r7/r8/r9, append-sink path untouched r10) ---
    "join_bloom_prefiltered",
    # --- r10 NEW operator: streaming HLL distinct-count view (idempotent
    #     max-merge registers — replay safety by ALGEBRA, inline-asserted
    #     by a forced marker-bypassing re-merge; displaced:
    #     streaming_upsert_table_sink_scan — green r7/r8/r9, upsert-sink
    #     path untouched r10 and still fuzz-covered every walk) ---
    "streaming_hll_view_sink_scan",
    # --- r9 VERDICT r8 task #1: grade the changelog-over-eq-deletes path
    #     (bounds pruning with NULL + non-NULL keys), rotate
    #     crud_delete_mor_scan back in (its WRITE path changed in r8 —
    #     writer-side tombstone dedup — the same round it left the window),
    #     and grade the new aggregate-view IVM over mutable bases (r8
    #     task #3). Displaced: q3_shipping_priority,
    #     window_running_and_lag, sample_temperature_mix — all green in
    #     r8 AND ≥2 earlier rounds, paths untouched r9. ---
    "changelog_eq_delete_scan",
    "crud_delete_mor_scan",
    "incremental_agg_refresh_mutable",
    # --- r9 NEW operators: portable HLL (exact-integer register sums)
    #     and cherry-pick publish (the non-fast-forward WAP flavor;
    #     displaced: funnel_view_click_purchase and
    #     timeseries_resample_locf — both green r5, r6 AND r8, paths
    #     untouched r9) ---
    "sketch_hll_distinct",
    "wap_cherrypick_scan",
    # --- r9: selective (binpack/where) compaction is NEW and the full
    #     compaction path flows through the same rewritten function —
    #     grade both (displaced: asof_join_purchase_to_view and
    #     dedup_keep_best_quality, green r8 + earlier, untouched r9) ---
    "maintenance_selective_compaction_scan",
    "maintenance_compaction_scan",
    # --- r9 NEW operators: kNN classification over embeddings +
    #     metadata-only MIN/MAX with its exactness proof (displaced:
    #     text_hashing_ann_topk and q8_market_share — green r7 sweep/r6
    #     AND r8, untouched r9) ---
    "similarity_knn_classify",
    "metadata_min_max_scan",
    # --- r9 NEW operator: streaming aggregate-view maintenance sink
    #     (additive exactly-once MERGE; displaced: dedup_simhash — green
    #     every round since r4 and still benched per-round) ---
    "streaming_agg_view_sink_scan",
    # --- r9 NEW operator: MMR diversity re-ranking (displaced:
    #     dedup_minhash_lsh — green every round since r3 AND still
    #     benched per-round) ---
    "similarity_mmr_rerank",
    # --- r7 task #1: the cosine single-evaluation rewrite (all six
    #     pair-cosine plans re-shaped this round) ---
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    # --- r7 ADVICE fixes: streaming exactly-once (high-water seq, racing
    #     replay recheck) + rollback rebase + overwrite retry restamp ---
    "streaming_interval_join",
    "streaming_session_window",
    # --- r8 NEW operator: counting-semantics delta-join IVM over mutable
    #     bases (changelog through both join legs) ---
    "incremental_join_view_refresh_mutable",
    # --- r8 VERDICT task #3: r7-fixed-but-unwindowed rows — the sampling
    #     NULL-sentinel fix, the KMV NULL/empty-degenerate fixes, the
    #     inverted-interval range-join fix, and the token-packing family
    #     (displaced: time_travel_rollback_scan, crud_overwrite_scan,
    #     crud_upsert_scan, crud_delete_mor_scan, crud_schema_evolution_scan,
    #     crud_add_files_scan, q1_pricing_summary — all green r6 AND r7,
    #     paths unchanged r8) ---
    "sample_stratified_mix",
    "sample_split_train_eval",
    "sketch_kmv_distinct",
    "sketch_kmv_set_ops",
    "range_join_errors_followups",
    # --- r8 NEW operators: mergeable-histogram quantiles + interval
    #     merging (displaced: maintenance_zorder_scan,
    #     cluster_kmeans_topics_gemm — green r6 AND r7, untouched r8) ---
    "sketch_histogram_quantiles",
    "timeseries_merge_intervals",
    "similarity_hybrid_rrf",
    "multimodal_extract_features",
    "multimodal_feature_ann_topk",
    # --- r7 NEW operators: manifest-list bounds + member-clustering
    #     rewrite (touches every commit's manifest tree) and DSIR
    #     importance scoring (displaced: embedding_int8_quantize,
    #     crud_merge_scan — both green r5+r6, paths unchanged r7) ---
    "maintenance_rewrite_manifests_scan",
    "text_dsir_importance",
    "partitioned_range_write_pruned_scan",
    # --- keep one more green round on recent fixes ---
    "float_nan_pruning_scan",
    "crud_merge_not_matched_by_source_scan",
    "crud_delete_eq_scan",
    "partition_evolution_scan",
    "wap_branch_publish_scan",
]


def _reorder_queries() -> None:
    missing = [n for n in _GRADED_FIRST if n not in QUERIES]
    if missing:
        raise AssertionError(f"_GRADED_FIRST names unknown queries: {missing}")
    head = set(_GRADED_FIRST)
    ordered = [*_GRADED_FIRST, *(n for n in QUERIES if n not in head)]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)


_reorder_queries()
