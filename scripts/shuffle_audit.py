"""Shuffle-volume audit: measure BYTES SHUFFLED per headline query (r11).

Wall time on local[N] hides the number that dominates a 1000-executor run —
shuffle volume (network + spill). This script runs each benched query to a
no-op sink under its own job group, then reads per-stage metrics from the
Spark UI REST API and attributes shuffle write/read and scan input bytes to
the query. The artifact (SHUFFLE_r{N}.json) is the round-over-round contract
that plan changes (broadcasts, prefilters, map-side combines) actually cut
shuffled bytes, not just local seconds.

Usage: python scripts/shuffle_audit.py [sf_dir] [--out SHUFFLE.json]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    out_name = "SHUFFLE.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_name = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # the UI must exist BEFORE get_spark's getOrCreate freezes the config —
    # and so must every pre-JVM setting getOrCreate would otherwise apply:
    # creating the session here with the default 1g driver heap OOMs the
    # sf1 sort/agg stages (local mode: driver == executors)
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    (SparkSession.builder.master(f"local[{cpus}]")
     .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
     .config("spark.sql.shuffle.partitions", cpus)
     .config("spark.ui.enabled", "true")
     .config("spark.ui.port", "4049").getOrCreate())

    from go_iceberg_spark.session import get_spark
    from go_iceberg_spark.workload import bench_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://localhost:4049/api/v1"
    app_id = _rest(base, "/applications")[0]["id"]

    results: dict[str, dict] = {}

    def _stages():
        return _rest(base, f"/applications/{app_id}/stages?status=complete")

    for name, spec in bench_queries().items():
        # attribute by stage-id watermark, not job group (r12 fix): AQE
        # materializes exchange stages from its own thread pool, which does
        # not inherit the thread-local job group — group attribution
        # silently dropped the largest shuffles. Queries run sequentially,
        # so stages above the pre-run watermark belong to this query.
        lo = max((s["stageId"] for s in _stages()), default=-1)
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        agg = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
               "input_bytes": 0, "output_rows": 0, "n_stages": 0}
        for s in _stages():
            if s["stageId"] > lo:
                agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
                agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
                agg["input_bytes"] += s.get("inputBytes", 0)
                agg["output_rows"] += s.get("outputRecords", 0) or 0
                agg["n_stages"] += 1
        agg["wall_sec"] = round(wall, 3)
        results[name] = agg

    artifact = {
        "metric": "shuffle_audit", "sf_dir": sf_dir,
        "total_shuffle_write_bytes": sum(r["shuffle_write_bytes"] for r in results.values()),
        "total_input_bytes": sum(r["input_bytes"] for r in results.values()),
        "queries": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), out_name)
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": "shuffle_audit", "sf_dir": sf_dir,
                      "total_shuffle_write_mb": round(artifact["total_shuffle_write_bytes"] / 1e6, 2),
                      "out": out_name}))


if __name__ == "__main__":
    main()
