"""Interleaved A/B timing + plan dump helper for the r13 optimization round.

The bench box shows bursty CPU steal (single timings swing up to 5x), so
every before/after claim comes from INTERLEAVED runs in ONE process:
A,B,A,B,... best-of-N per side, plus the same calibration probe bench.py
uses so artifacts can be compared across sessions.

Usage:
  python scripts/ab_r13.py plan <query> <out.txt> [sf_dir]
      dump .explain("formatted") (lazy twin when one exists) to a file
  python scripts/ab_r13.py time <query> [sf_dir] [runs]
      interleave nothing - just best-of-N noop-sink timings for one query
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from go_iceberg_spark.session import get_spark

    s = get_spark()
    s.sparkContext.setLogLevel("ERROR")
    return s


def _calibrate(spark, n=3):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        spark.range(0, 10_000_000, 1, 32).selectExpr("sum(id * 2 + 1)").collect()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def dump_plan(query: str, out_path: str, sf_dir: str) -> None:
    from go_iceberg_spark.workload import PLAN_VARIANTS, QUERIES

    spark = _spark()
    fn = PLAN_VARIANTS.get(query, QUERIES[query].fn)
    df = fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    lines = plan.rstrip().split("\n")
    if len(lines) > 600:
        lines = lines[:600] + [f"... [truncated: {len(lines) - 600} more lines]"]
    lines = [ln if len(ln) <= 800 else ln[:800] + f"... [line truncated: {len(ln)} chars]"
             for ln in lines]
    hdr = [f"# {query} @ {sf_dir}",
           f"# Exchanges: {plan.count('Exchange')} · BroadcastHashJoins: "
           f"{plan.count('BroadcastHashJoin')} · SortMergeJoins: {plan.count('SortMergeJoin')}",
           ""]
    with open(out_path, "w") as f:
        f.write("\n".join(hdr + lines) + "\n")
    print(f"wrote {out_path} (Exchanges={plan.count('Exchange')})")
    if query in PLAN_VARIANTS:
        spark.catalog.clearCache()


def time_query(query: str, sf_dir: str, runs: int) -> None:
    from go_iceberg_spark.workload import QUERIES

    spark = _spark()
    fn = QUERIES[query].fn
    # warm: compile/codegen at the smallest sf
    warm = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    fn(spark, warm).write.format("noop").mode("overwrite").save()
    cal = _calibrate(spark)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print({"query": query, "sf_dir": sf_dir, "best": min(times),
           "times": times, "calibration": min(cal), "cal_runs": cal})


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "plan":
        dump_plan(sys.argv[2], sys.argv[3],
                  sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001")
    elif cmd == "time":
        time_query(sys.argv[2],
                   sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1",
                   int(sys.argv[4]) if len(sys.argv) > 4 else 5)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
