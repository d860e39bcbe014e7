"""A/B: plain shuffle join vs bloom-prefiltered join (r10).

Measures the bloom prefilter's value in the shape it targets: a BIG probe
side shuffle-joined against a small-but-not-tiny build side (broadcast
disabled, as on a cluster where the dim exceeds the broadcast threshold).
The prefilter drops non-matching probe rows BEFORE the exchange, so the
shuffle writes only can-match rows.

Usage: python scripts/bloom_join_ab.py [sf_dir] — prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_iceberg_spark.operators.joins import bloom_prefilter, bloom_prefilter_join
from go_iceberg_spark.session import get_spark
from go_iceberg_spark.workload import load


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # disable Spark's own runtime bloom injection so the A side is the
    # honest plain shuffle join
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_extendedprice")
    pt = (load(spark, sf, "part").filter(F.col("p_size") == 50)
          .select(F.col("p_partkey").alias("l_partkey"), "p_name"))

    def run(fn):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    # warm
    li.count(); pt.count()
    plain = run(lambda: li.join(pt, ["l_partkey"]))
    bloom = run(lambda: bloom_prefilter_join(li, pt, ["l_partkey"]))
    n_big = li.count()
    n_match = li.join(pt, ["l_partkey"], "left_semi").count()
    # the number that survives the 100x scale-up: rows ENTERING the join
    # shuffle with vs without the prefilter (local wall time cannot show
    # the win — local shuffles pay no network, and the extra hash pass is
    # visible; on a cluster shuffle bytes dominate)
    n_filtered = bloom_prefilter(li, pt, ["l_partkey"]).count()
    print(json.dumps({
        "metric": "bloom_join_ab", "sf": sf,
        "plain_shuffle_join_sec": plain,
        "bloom_prefiltered_sec": bloom,
        "local_wall_ratio": round(plain / bloom, 2) if bloom else None,
        "probe_rows": n_big, "matching_rows": n_match,
        "selectivity": round(n_match / n_big, 4),
        "rows_entering_shuffle_plain": n_big,
        "rows_entering_shuffle_bloom": n_filtered,
        "shuffle_row_reduction": round(1 - n_filtered / n_big, 4),
        "bloom_false_positive_rows": n_filtered - n_match,
    }))


if __name__ == "__main__":
    main()
