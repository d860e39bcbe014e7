"""Snapshot-replay Structured Streaming source (Python Data Source API):
committed-only reads, exactly-once across restarts, non-append handling,
and schema evolution mid-stream."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import Row

import go_iceberg_spark as gi
from go_iceberg_spark.streaming.source import read_snapshot_stream


@pytest.fixture()
def table(spark, catalog):
    from go_iceberg_spark.schema import from_spark_schema

    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(4)])
    t = catalog.create_table("db", "snapsrc", from_spark_schema(df.schema))
    t.append(df)
    return t


def drain(spark, t, ckpt, sink, **options):
    s = read_snapshot_stream(spark, t, **options)
    q = (s.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sorted(r.id for r in spark.read.parquet(sink).collect())


def test_committed_only_and_exactly_once_restart(spark, table, tmp_path):
    t = table
    t.append(spark.createDataFrame([Row(id=i, v=float(i)) for i in range(4, 6)]))
    # an uncommitted file in data/ must never be read
    stage = str(tmp_path / "stage")
    spark.createDataFrame([Row(id=999, v=9.9)]).coalesce(1).write.parquet(stage)
    os.rename(glob.glob(stage + "/*.parquet")[0],
              os.path.join(t.location, "data", "orphan-uncommitted.parquet"))

    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    assert drain(spark, t, ckpt, sink) == list(range(6))
    # restart from the same checkpoint: ONLY the new snapshot's rows arrive
    t.append(spark.createDataFrame([Row(id=6, v=6.0)]))
    assert drain(spark, t, ckpt, sink) == list(range(7))


def test_non_append_raises_and_skip_option(spark, table, tmp_path):
    t = table
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    assert drain(spark, t, ckpt, sink) == list(range(4))
    t.delete(gi.lt("id", 2))
    with pytest.raises(Exception, match="append-only|skip-non-append"):
        drain(spark, t, ckpt, sink)
    shutil.rmtree(ckpt + "_skip", ignore_errors=True)
    # skip option continues past the delete without emitting anything new
    assert drain(spark, t, ckpt, sink, **{"skip-non-append": "true"}) == list(range(4))


def test_start_snapshot_id_option(spark, table, tmp_path):
    t = table
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([Row(id=7, v=7.0)]))
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    assert drain(spark, t, ckpt, sink, **{"start-snapshot-id": s1}) == [7]


def test_max_files_per_trigger_splits_snapshot(spark, catalog, tmp_path):
    """r12 (VERDICT r11 task #8): with max-files-per-trigger, a single
    compaction-sized snapshot (20 files) drains across >= 4 capped batches
    instead of one giant batch — exactly-once markers intact (no row lost
    or duplicated across the successive triggers), result identical to the
    uncapped drain, and offsets resume mid-snapshot via the file cursor."""
    from pyspark.sql import Row

    from go_iceberg_spark.schema import from_spark_schema

    proto = spark.createDataFrame([Row(id=0, v=0.0)])
    # tiny target file size so the writer splits the append into many files
    t = catalog.create_table("db", "mftsrc", from_spark_schema(proto.schema),
                             properties={"write.target-file-size-bytes": "300"})
    # ONE snapshot whose manifest holds 20 data files
    t.append(spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(200)]).repartition(20))
    assert len(t.snapshots()) == 1
    n_files = len(list(t.live_entries()))
    assert n_files == 20, n_files

    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    # each run advances the frontier by at most 5 files; successive runs
    # over the SAME checkpoint resume from the mid-snapshot file cursor
    max_rows_per_file = max(e.record_count for e in t.live_entries())
    runs = 0
    prev = -1
    while runs < 12:
        drained = drain(spark, t, ckpt, sink, **{"max-files-per-trigger": 5})
        runs += 1
        assert len(drained) >= prev, "a later run lost rows"
        assert len(drained) - max(prev, 0) <= 5 * max_rows_per_file, "cap exceeded"
        if len(drained) == 200:
            break
        prev = len(drained)
    assert runs >= 4, runs  # 20 files / 5 per trigger
    final = sorted(r.id for r in spark.read.parquet(sink).collect())
    assert final == list(range(200)), "capped drain lost or duplicated rows"

    # the checkpoint's intermediate offsets carry mid-snapshot file cursors
    import json

    offsets = sorted(int(x) for x in os.listdir(os.path.join(ckpt, "offsets"))
                     if x.isdigit())
    cursors = []
    for b in offsets:
        with open(os.path.join(ckpt, "offsets", str(b))) as f:
            last = f.read().splitlines()[-1]
        cursors.append(json.loads(last).get("file_cursor"))
    assert cursors[:3] == [5, 10, 15], cursors
    assert cursors[-1] is None  # final frontier = snapshot complete

    # appending more keeps the capped stream incremental past the cursor
    t.append(spark.createDataFrame([Row(id=900, v=9.0)]))
    out = drain(spark, t, ckpt, sink, **{"max-files-per-trigger": 5})
    assert out == list(range(200)) + [900]


def test_schema_evolution_mid_stream(spark, table, tmp_path):
    t = table
    t.update_schema().add_column("tag", gi.STRING).commit()
    t.refresh()
    t.append(spark.createDataFrame([Row(id=10, v=1.0, tag="x")]))
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    drain(spark, t, ckpt, sink)
    out = spark.read.parquet(sink)
    rows = {r.id: r.tag for r in out.collect()}
    assert rows[10] == "x" and rows[0] is None  # old files aligned, null-filled


def test_expired_parent_raises_instead_of_full_replay(spark, table, tmp_path):
    """If the checkpointed start snapshot's successor has an EXPIRED parent,
    the source must refuse to plan (ValidationError), not silently emit the
    snapshot's full cumulative live set as one 'added' batch."""
    from dataclasses import replace

    from go_iceberg_spark.streaming.source import SnapshotStreamReader

    t = table
    t.append(spark.createDataFrame([Row(id=10, v=1.0)]))
    b = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([Row(id=11, v=2.0)]))
    c = t.current_snapshot().snapshot_id
    # an external expire that did NOT rewrite parent pointers: b vanishes
    # from the snapshot list while c still claims it as parent
    md = t.metadata
    new_md = replace(md, snapshots=tuple(
        s for s in md.snapshots if s.snapshot_id != b))
    t.version = t._commit_fn(new_md, t.version)
    reader = SnapshotStreamReader({"location": t.location})
    # r6: the offset snapshot itself is the expired one, so the explicit
    # expired-offset diagnostic fires (a dangling parent elsewhere in the
    # range still raises "no longer retained")
    with pytest.raises(Exception, match="has been expired|no longer retained"):
        reader.partitions({"snapshot_id": b}, {"snapshot_id": c})


def test_reader_pins_schema_at_construction(spark, table):
    """Mid-stream schema evolution must not change the batch schema until the
    query restarts: the reader pins current_schema when constructed."""
    from go_iceberg_spark.streaming.source import SnapshotStreamReader

    t = table
    reader = SnapshotStreamReader({"location": t.location})
    pinned = [f.name for f in reader._pinned_target]
    t.update_schema().add_column("extra", gi.STRING).commit()
    t.refresh()
    t.append(spark.createDataFrame([Row(id=20, v=2.0, extra="y")]))
    parts = reader.partitions({"snapshot_id": None},
                              {"snapshot_id": t.current_snapshot().snapshot_id})
    assert parts, "expected at least one file partition"
    for p in parts:
        assert [f.name for f in p.target] == pinned  # no 'extra' mid-stream


def test_stream_resumes_across_expired_gap_and_errors_on_expired_offset(
        spark, table, tmp_path):
    """r6 probe: (a) when the checkpoint's offset snapshot SURVIVES an
    expire, the stream resumes incrementally — expiry rewires parents by
    ancestry, so the gap's appends arrive as one net batch, exactly once;
    (b) when the offset snapshot itself is expired, the source raises the
    explicit 'has been expired' diagnostic (not a misleading ancestry
    error) — the delivered-set record is genuinely gone."""
    import time

    t = table
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    assert drain(spark, t, ckpt, sink) == [0, 1, 2, 3]

    t.append(spark.createDataFrame([Row(id=10, v=1.0)]))
    t.append(spark.createDataFrame([Row(id=11, v=1.0)]))
    t.append(spark.createDataFrame([Row(id=12, v=1.0)]))
    t.expire_snapshots(older_than=int(time.time() * 1000) + 10_000, retain_last=4)
    assert drain(spark, t, ckpt, sink) == [0, 1, 2, 3, 10, 11, 12]

    t.append(spark.createDataFrame([Row(id=20, v=1.0)]))
    t.expire_snapshots(older_than=int(time.time() * 1000) + 10_000, retain_last=1)
    with pytest.raises(Exception, match="has been expired"):
        drain(spark, t, ckpt, sink)


def test_compaction_mid_stream_does_not_kill_or_duplicate(spark, table, tmp_path):
    """r7: rows-preserved REPLACE snapshots (compaction, manifest rewrite)
    between micro-batches are skipped by the snapshot source — the stream
    neither dies nor re-emits the compacted rows; later appends still
    arrive exactly once."""
    t = table
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    assert drain(spark, t, ckpt, sink) == list(range(4))

    t.append(spark.createDataFrame([Row(id=4, v=4.0)]))
    t.rewrite_data_files(min_input_files=2)
    t.rewrite_manifests(target_entries_per_manifest=2)
    t.append(spark.createDataFrame([Row(id=5, v=5.0)]))
    assert drain(spark, t, ckpt, sink) == list(range(6))
