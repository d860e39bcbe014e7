"""Incremental manifest layout: append commits write O(added) metadata and
REUSE parent member manifests; deletes rewrite only affected members; the
member list compacts past a threshold; legacy single-manifest snapshots
still read."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row

import go_iceberg_spark as gi
from go_iceberg_spark.table.metadata import (
    MANIFEST_LIST_SUFFIX,
    Snapshot,
    read_manifest_list,
    write_manifest,
)


def mk(spark, catalog, name):
    from go_iceberg_spark.schema import from_spark_schema

    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
    t = catalog.create_table("db", name, from_spark_schema(df.schema))
    t.append(df)
    return t


def members_of(t):
    snap = t.current_snapshot()
    assert snap.manifest_path.endswith(MANIFEST_LIST_SUFFIX)
    return read_manifest_list(os.path.join(t.location, snap.manifest_path))


def test_append_reuses_parent_members(spark, catalog):
    t = mk(spark, catalog, "reuse")
    m1 = members_of(t)
    t.append(spark.createDataFrame([Row(id=100, v=1.0)]))
    m2 = members_of(t)
    # the first commit's member is reused VERBATIM (same path, no rewrite)
    assert m1[0] in m2 and len(m2) == len(m1) + 1
    t.append(spark.createDataFrame([Row(id=200, v=2.0)]))
    m3 = members_of(t)
    assert all(m in m3 for m in m2) and len(m3) == len(m2) + 1
    # full read sees every generation
    assert t.to_df().count() == 12


def test_delete_rewrites_only_affected_member(spark, catalog):
    t = mk(spark, catalog, "partial")
    t.append(spark.createDataFrame([Row(id=100 + i, v=float(i)) for i in range(10)]))
    m_before = members_of(t)
    # CoW delete hits only the second batch's files
    t.delete(gi.gte("id", 100))
    m_after = members_of(t)
    # the untouched first member survives verbatim
    assert m_before[0] in m_after
    # the affected member is gone (all its files rewritten/removed)
    assert m_before[1] not in m_after
    assert t.to_df().count() == 10


def test_member_list_compacts_past_threshold(spark, catalog):
    from go_iceberg_spark.table.table import Table

    t = mk(spark, catalog, "compact")
    old_threshold = Table.MANIFEST_COMPACT_THRESHOLD
    Table.MANIFEST_COMPACT_THRESHOLD = 4
    try:
        for i in range(6):
            t.append(spark.createDataFrame([Row(id=1000 + i, v=float(i))]))
        assert len(members_of(t)) <= 5  # compacted back to one + newer appends
        assert t.to_df().count() == 16
    finally:
        Table.MANIFEST_COMPACT_THRESHOLD = old_threshold


def test_legacy_single_manifest_snapshot_reads(spark, catalog):
    """A snapshot whose manifest_path is a plain parquet manifest (the
    pre-manifest-list layout) still scans, diffs, and expires."""
    from dataclasses import replace

    t = mk(spark, catalog, "legacy")
    entries = t.live_entries()
    rel = "metadata/snap-legacy.parquet"
    write_manifest(os.path.join(t.location, rel), entries)
    snap = t.current_snapshot()
    legacy = Snapshot(
        snapshot_id=snap.snapshot_id + 1, parent_snapshot_id=snap.snapshot_id,
        sequence_number=snap.sequence_number + 1, timestamp_ms=snap.timestamp_ms + 1,
        operation="append", manifest_path=rel, schema_id=snap.schema_id,
        summary=dict(snap.summary))
    md = replace(t.metadata,
                 snapshots=(*t.metadata.snapshots, legacy),
                 current_snapshot_id=legacy.snapshot_id,
                 refs={**t.metadata.refs},
                 last_sequence_number=legacy.sequence_number)
    t.version = t._commit_fn(md, t.version)
    t.metadata = md
    assert t.to_df().count() == 10
    # an append on top of the legacy snapshot folds it into the new layout
    t.append(spark.createDataFrame([Row(id=999, v=9.0)]))
    assert t.current_snapshot().manifest_path.endswith(MANIFEST_LIST_SUFFIX)
    assert t.to_df().count() == 11


def test_rewrite_manifests_compacts_chain(spark, catalog):
    """Explicit rewrite_manifests: many members collapse into one REPLACE
    snapshot with identical data."""
    t = mk(spark, catalog, "rwm")
    for i in range(4):
        t.append(spark.createDataFrame([Row(id=100 + i, v=float(i))]))
    assert len(members_of(t)) == 5
    files_before = {e.file_path for e in t.live_entries()}
    t.rewrite_manifests()
    assert len(members_of(t)) == 1
    assert t.current_snapshot().operation == "replace"
    # pure metadata: exact same data files, same rows
    assert {e.file_path for e in t.live_entries()} == files_before
    assert t.to_df().count() == 14
