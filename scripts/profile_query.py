"""Per-query profiling: stage-level wall attribution + job counts (r12).

For each named query (default: the bench set), runs the query to a no-op
sink and reports, from the UI REST API:
  - wall seconds
  - number of JOBS the query submits (each job is a driver round-trip —
    collect()s, counts, localCheckpoints, eager materializations; the
    fixed per-job overhead dominates sub-second queries and, at scale,
    every extra job is an extra pass over something)
  - per-stage: name, executorRunTime, shuffle read/write bytes, input bytes
so the expensive piece of a multi-job query is identifiable without
guessing.

Usage: python scripts/profile_query.py [sf_dir] [query ...] [--out F.json]
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
    out_name = None
    if "--out" in argv:
        i = argv.index("--out")
        out_name = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = argv[1:] or None

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

    qset = bench_queries()
    if names:
        from go_iceberg_spark.workload import QUERIES
        qset = {n: QUERIES[n] for n in names}

    # warm-up once at the smallest sf so codegen/JIT is out of the numbers
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = sf_dir
    for name, spec in qset.items():
        try:
            spec.fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    results: dict[str, dict] = {}
    for name, spec in qset.items():
        jobs_lo = max((j["jobId"] for j in _rest(
            base, f"/applications/{app_id}/jobs")), default=-1)
        stages_lo = max((s["stageId"] for s in _rest(
            base, f"/applications/{app_id}/stages?status=complete")), default=-1)
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [j for j in _rest(base, f"/applications/{app_id}/jobs")
                if j["jobId"] > jobs_lo]
        stages = []
        for s in _rest(base, f"/applications/{app_id}/stages?status=complete"):
            if s["stageId"] > stages_lo:
                stages.append({
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:80],
                    "run_ms": s.get("executorRunTime", 0),
                    "in_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                    "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "tasks": s.get("numCompleteTasks", 0),
                })
        stages.sort(key=lambda s: -s["run_ms"])
        results[name] = {
            "wall_sec": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "executor_run_ms_total": sum(s["run_ms"] for s in stages),
            "stages": stages[:12],
        }
        print(f"{name}: {wall:.3f}s  jobs={len(jobs)} stages={len(stages)} "
              f"exec_ms={sum(s['run_ms'] for s in stages)}")

    if out_name:
        path = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), out_name)
        with open(path, "w") as f:
            json.dump({"metric": "profile", "sf_dir": sf_dir,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {out_name}")


if __name__ == "__main__":
    main()
