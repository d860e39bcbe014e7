"""End-to-end tour of go_iceberg_spark (counterpart of the reference's
examples/basic/main.go — but runnable offline: the filesystem catalog needs
no services; swap in RESTCatalog + rest_server for the service deployment).

Run:  PYTHONPATH=<repo root> python examples/basic.py
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

import go_iceberg_spark as gi
from go_iceberg_spark.catalog.catalog import FilesystemCatalog
from go_iceberg_spark.schema import from_spark_schema
from go_iceberg_spark.session import EngineConfig, get_spark


def main() -> None:
    spark = get_spark(EngineConfig(app_name="basic-example"))
    spark.sparkContext.setLogLevel("ERROR")
    cat = FilesystemCatalog(spark, tempfile.mkdtemp(prefix="gis_example_"))

    # -- DDL ---------------------------------------------------------------
    cat.create_namespace(("demo",))
    df = spark.createDataFrame(
        [Row(id=i, name=f"user-{i}", score=float(i % 7)) for i in range(1000)]
    )
    users = cat.create_table(("demo",), "users", from_spark_schema(df.schema))

    # -- CRUD --------------------------------------------------------------
    users.append(df)                                        # snapshot 1: append
    users.delete(gi.lt("id", 100))                          # snapshot 2: CoW delete
    users.update(gi.eq("id", 500), {"name": "the-five-hundredth"})  # snapshot 3
    upserts = spark.createDataFrame(
        [Row(id=i, name=f"upserted-{i}", score=9.0) for i in range(950, 1050)]
    )
    users.upsert(upserts, ["id"])                           # snapshot 4: MERGE

    # -- scan with the expression DSL -------------------------------------
    hot = (
        users.scan()
        .filter(gi.and_(gi.gte("score", 5.0), gi.col("name").not_starts_with("user-1")))
        .select("id", "name", "score")
        .to_df()
    )
    print(f"high-score rows: {hot.count()}")

    # -- time travel -------------------------------------------------------
    first = users.snapshots()[0]
    print(f"rows now: {users.to_df().count()}, rows at snapshot 1: "
          f"{users.scan().use_snapshot(first.snapshot_id).to_df().count()}")
    print("history:", [(s.operation, s.summary.get('total-records')) for s in users.snapshots()])

    # -- metadata-only count (reference Count semantics) -------------------
    print("metadata_count:", users.scan().metadata_count(), "exact:", users.scan().count())

    # -- LLM-pipeline operators on a toy corpus ----------------------------
    from go_iceberg_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the quick brown fox jumps over the lazy dog " + ("again " * (i % 3)))
         for i in range(200)]
    )
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    kept = D.keep_greedy(docs, pairs, "doc_id")
    print(f"near-dup pairs: {pairs.count()}, corpus {docs.count()} -> kept {kept.count()}")

    # -- incremental + CDC reads ------------------------------------------
    snaps = users.snapshots()
    print("rows appended after snapshot 2:",
          users.incremental_scan(from_snapshot_id=snaps[1].snapshot_id,
                                 ignore_non_append=True).count())
    ch = users.changes(from_snapshot_id=snaps[0].snapshot_id,
                       to_snapshot_id=snaps[1].snapshot_id)
    print("changelog of the delete:",
          {r._change_type: r["count"] for r in ch.groupBy("_change_type").count().collect()})

    # -- SQL over engine tables -------------------------------------------
    from go_iceberg_spark.catalog.catalog import register_sql_views

    register_sql_views(cat, spark, ("demo",))
    print("via spark.sql:",
          spark.sql("SELECT count(*) AS n FROM users WHERE score >= 5").collect()[0].n)

    # -- snapshot-replay streaming read (committed data only) -------------
    from go_iceberg_spark.streaming.source import read_snapshot_stream

    # the history contains delete/overwrite snapshots an append-only stream
    # cannot represent; skip them (or consume users.changes() for row-level CDC)
    q = (read_snapshot_stream(spark, users, **{"skip-non-append": "true"})
         .writeStream.format("memory").queryName("users_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    print("streamed committed rows:", spark.table("users_stream").count())

    spark.stop()


if __name__ == "__main__":
    main()
