"""A/B: scan cost with N small position-delete files vs 1 rewritten file
(r10, rewrite_position_deletes value measurement).

Builds a table with one data batch and N separate MoR deletes (each leaves
its own tombstone file => N parquet reads + one big anti-join build side
per scan), times the scan, runs rewrite_position_deletes, times the scan
again. Usage: python scripts/tombstone_rewrite_ab.py [n_deletes] [rows].
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import go_iceberg_spark as gi
from go_iceberg_spark.catalog.catalog import FilesystemCatalog
from go_iceberg_spark.schema import from_spark_schema
from go_iceberg_spark.session import get_spark
from go_iceberg_spark.table.metadata import CONTENT_POSITION_DELETES


def main() -> None:
    n_del = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    cat = FilesystemCatalog(spark, tempfile.mkdtemp(prefix="tsab_"))
    cat.create_namespace(("db",))
    df = spark.range(0, rows).select(F.col("id"), (F.col("id") % 1000).alias("g"))
    t = cat.create_table("db", "ab", from_spark_schema(df.schema))
    t.append(df)
    for i in range(n_del):
        t.delete(gi.isin("id", *(i * 1000 + j for j in range(5))), mode="merge-on-read")
    n_pos = len([e for e in t.live_entries() if e.content == CONTENT_POSITION_DELETES])

    def scan_time():
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            t.to_df().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    before_cnt = t.scan().count()
    before = scan_time()
    t.rewrite_position_deletes()
    n_pos_after = len([e for e in t.live_entries() if e.content == CONTENT_POSITION_DELETES])
    after = scan_time()
    assert t.scan().count() == before_cnt
    print(json.dumps({
        "metric": "tombstone_rewrite_ab", "rows": rows,
        "pos_files_before": n_pos, "pos_files_after": n_pos_after,
        "scan_sec_before": before, "scan_sec_after": after,
        "speedup": round(before / after, 2) if after else None,
    }))


if __name__ == "__main__":
    main()
