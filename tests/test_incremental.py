"""Incremental append scan + row-level changelog over the snapshot lineage
(Iceberg start/end-snapshot-id reads and create_changelog_view; no reference
counterpart — its scan always reads one resolved snapshot, reference:
table/scan.go:80-98)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

import go_iceberg_spark as gi
from go_iceberg_spark.errors import ValidationError
from go_iceberg_spark.table.transaction import delete_equality


def mk(spark, catalog, name, first):
    from go_iceberg_spark.schema import from_spark_schema

    df = spark.createDataFrame(first)
    t = catalog.create_table("db", name, from_spark_schema(df.schema))
    t.append(df)
    return t


def rows_of(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_incremental_appends_only_range(spark, catalog):
    t = mk(spark, catalog, "incr", [Row(id=i, v=float(i)) for i in range(5)])
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([Row(id=i, v=float(i)) for i in range(5, 8)]))
    s2 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([Row(id=i, v=float(i)) for i in range(8, 10)]))

    assert rows_of(t.incremental_scan(from_snapshot_id=s1), "id") == [(i,) for i in range(5, 10)]
    assert rows_of(t.incremental_scan(from_snapshot_id=s1, to_snapshot_id=s2), "id") == \
        [(i,) for i in range(5, 8)]
    # full-history read: from=None includes the first snapshot
    assert rows_of(t.incremental_scan(), "id") == [(i,) for i in range(10)]


def test_incremental_rejects_non_append(spark, catalog):
    t = mk(spark, catalog, "incr_rej", [Row(id=i, v=float(i)) for i in range(5)])
    s1 = t.current_snapshot().snapshot_id
    t.delete(gi.lt("id", 2))
    t.append(spark.createDataFrame([Row(id=100, v=1.0)]))
    with pytest.raises(ValidationError):
        t.incremental_scan(from_snapshot_id=s1)
    # opting out skips the delete snapshot but keeps the later append
    assert rows_of(t.incremental_scan(from_snapshot_id=s1, ignore_non_append=True), "id") == [(100,)]


def test_incremental_validates_lineage(spark, catalog):
    t = mk(spark, catalog, "incr_val", [Row(id=1, v=1.0)])
    with pytest.raises(ValidationError):
        t.incremental_scan(from_snapshot_id=999)


def test_changelog_cow_carryover_eliminated(spark, catalog):
    t = mk(spark, catalog, "cdc_cow", [Row(id=i, v=float(i)) for i in range(6)])
    t.delete(gi.lt("id", 2))  # CoW: rewrites the file, 4 rows survive
    ch = t.changes()
    ins = rows_of(ch.filter("_change_type = 'insert'"), "_change_ordinal", "id")
    dels = rows_of(ch.filter("_change_type = 'delete'"), "_change_ordinal", "id")
    assert ins == [(0, i) for i in range(6)]  # surviving rows NOT re-reported
    assert dels == [(1, 0), (1, 1)]


def test_changelog_mor_position_delete_rows(spark, catalog):
    t = mk(spark, catalog, "cdc_mor", [Row(id=i, v=float(i)) for i in range(6)])
    t.delete(gi.gte("id", 4), mode="merge-on-read")
    ch = t.changes()
    dels = rows_of(ch.filter("_change_type = 'delete'"), "_change_ordinal", "id")
    assert dels == [(1, 4), (1, 5)]
    # scan agrees with the replayed changelog
    assert rows_of(t.to_df(), "id") == [(i,) for i in range(4)]


def test_changelog_mor_equality_delete_rows(spark, catalog):
    t = mk(spark, catalog, "cdc_eq", [Row(id=i, v=float(i)) for i in range(6)])
    delete_equality(t, spark.createDataFrame([Row(id=1), Row(id=3)]), ["id"])
    ch = t.changes()
    dels = rows_of(ch.filter("_change_type = 'delete'"), "_change_ordinal", "id")
    assert dels == [(1, 1), (1, 3)]


def test_changelog_range_is_exclusive_inclusive(spark, catalog):
    t = mk(spark, catalog, "cdc_rng", [Row(id=1, v=1.0)])
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([Row(id=2, v=2.0)]))
    ch = t.changes(from_snapshot_id=s1)
    assert rows_of(ch, "_change_type", "_change_ordinal", "id") == [("insert", 0, 2)]


def test_partitions_and_manifests_metadata_tables(spark, catalog):
    t = mk(spark, catalog, "meta_pm", [Row(id=i, v=float(i)) for i in range(4)])
    t.append(spark.createDataFrame([Row(id=10, v=1.0)]))
    parts = t.partitions_df().collect()
    assert sum(p.record_count for p in parts) == 5
    assert sum(p.file_count for p in parts) >= 2
    # incremental manifest layout: one member per append commit, each
    # reporting its own entries
    man = t.manifests_df().collect()
    assert len(man) == 2
    assert sum(m.added_data_files_count for m in man) >= 2
    assert all(m.length > 0 for m in man)


def test_changelog_compaction_does_not_resurface_mor_deleted_rows(spark, catalog):
    """r5 probe find: a compaction (REPLACE) snapshot materializes MoR
    delete files and drops them in the same commit. The changelog's
    removed-files side must apply the PARENT snapshot's delete files —
    otherwise rows the deletes had already suppressed diff as phantom
    'delete' changes and the full-range net row count goes wrong."""
    from pyspark.sql import Row

    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.transaction import delete_equality

    df1 = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(15)])
    df2 = spark.createDataFrame([Row(k=15 + i, v=float(15 + i)) for i in range(15)])
    t = catalog.create_table("db", "cdcc", from_spark_schema(df1.schema))
    t.append(df1)
    t.append(df2)
    s2 = delete_equality(t, spark.createDataFrame([Row(k=3), Row(k=7), Row(k=21)]), ["k"])
    s3 = t.rewrite_data_files()
    assert s3 is not None and t.scan().count() == 27

    # the compaction slice is logically empty
    assert t.changes(from_snapshot_id=s2.snapshot_id).count() == 0
    # and the full-range net matches the live row count
    by_type = {r["_change_type"]: r["n"] for r in
               t.changes().groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type.get("insert", 0) - by_type.get("delete", 0) == 27
    assert by_type.get("delete", 0) == 3  # exactly the equality-deleted keys


def test_changelog_eq_delete_across_rename(spark, catalog):
    """r5 probe bug fix: changes() resolving an equality delete written
    BEFORE a key-column rename must map the delete parquet's physical
    (old-name) column to the current name by field id — before the fix the
    select of the current name crashed on the old file."""
    from pyspark.sql import Row

    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.transaction import delete_equality

    df = spark.range(0, 20).selectExpr("id", "cast(id as string) AS name")
    t = catalog.create_table("db", "clrn", from_spark_schema(df.schema))
    t.append(df)
    s1 = t.current_snapshot().snapshot_id
    delete_equality(t, spark.range(0, 3).selectExpr("id"), ["id"])
    t.update_schema().rename_column("id", "ident").commit()
    dels = {r.ident for r in t.changes(from_snapshot_id=s1)
            .filter("_change_type = 'delete'").collect()}
    assert dels == {0, 1, 2}


def test_changelog_compaction_mixed_sequence_removed_group(spark, catalog):
    """r6 (r5 ADVICE medium #2): the removed-files side of a compaction
    snapshot groups files by schema id; when that group MIXES files written
    BEFORE and AFTER an equality delete (same key re-inserted), applying
    the delete to the whole group with any(...) suppressed the re-inserted
    row too — the compaction slice showed it as a phantom insert. Deletes
    must apply per-file (sub-grouped by each file's applicable set)."""
    df1 = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(10)])
    t = catalog.create_table("db", "cdc_mixseq", gi.schema.from_spark_schema(df1.schema))
    t.append(df1)                                                    # seq 1: k=0..9
    s2 = delete_equality(t, spark.createDataFrame([Row(k=3)]), ["k"])  # seq 2: -k=3
    # seq 3: k=3 comes BACK (and some fresh keys) — lives above the delete
    t.append(spark.createDataFrame([Row(k=3, v=30.0), Row(k=100, v=100.0)]))
    s4 = t.rewrite_data_files()                                      # compaction
    assert s4 is not None and t.scan().count() == 11

    # pure compaction: the slice after the re-insert append is logically empty
    assert t.changes(from_snapshot_id=s2.snapshot_id).count() == 2  # the seq-3 inserts only
    changes_s4 = t.changes(
        from_snapshot_id=t.snapshot_by_id(s4.snapshot_id).parent_snapshot_id)
    assert changes_s4.count() == 0, \
        "compaction slice must be empty — phantom rows mean the eq delete " \
        "was applied to a file written after it"
    # full-range net: inserts - deletes == live rows; exactly one real delete
    by_type = {r["_change_type"]: r["n"] for r in
               t.changes().groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type.get("insert", 0) - by_type.get("delete", 0) == 11
    assert by_type.get("delete", 0) == 1


def test_degenerate_ranges_pinned(spark, catalog):
    """r7 degenerate sweep over the incremental/changelog surface, pinned
    pass-as-designed: empty ranges (from==to, empty-append-only,
    snapshotless table) yield 0 rows; delete-only ranges raise for the
    strict append scan (skip with ignore_non_append) and emit pure deletes
    from the changelog (CoW and MoR alike); inverted ranges and unknown
    snapshot ids raise ValidationError, never a crash or a silent empty."""
    import pytest
    from pyspark.sql import Row

    import go_iceberg_spark as gi
    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.incremental import (
        changelog_scan,
        incremental_append_scan,
    )

    df = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(6)])
    t = catalog.create_table("db", "degen_ranges", from_spark_schema(df.schema))
    t.append(df)
    s1 = t.current_snapshot().snapshot_id

    assert incremental_append_scan(t, s1, s1).count() == 0
    assert changelog_scan(t, s1, s1).count() == 0

    t.delete(gi.gte("k", 4))  # CoW: delete-only range
    s2 = t.current_snapshot().snapshot_id
    with pytest.raises(ValidationError, match="not append"):
        incremental_append_scan(t, s1, s2)
    assert incremental_append_scan(t, s1, s2, ignore_non_append=True).count() == 0
    assert sorted((r._change_type, r.k) for r in changelog_scan(t, s1, s2).collect()) \
        == [("delete", 4), ("delete", 5)]

    t.delete(gi.eq("k", 1), mode="merge-on-read")  # MoR delete-only range
    s3 = t.current_snapshot().snapshot_id
    assert sorted((r._change_type, r.k) for r in changelog_scan(t, s2, s3).collect()) \
        == [("delete", 1)]

    t.append(df.limit(0))  # empty append inside the range
    s4 = t.current_snapshot().snapshot_id
    assert changelog_scan(t, s3, s4).count() == 0
    assert incremental_append_scan(t, s3, s4).count() == 0

    t2 = catalog.create_table("db", "degen_empty", from_spark_schema(df.schema))
    assert incremental_append_scan(t2).count() == 0
    assert changelog_scan(t2).count() == 0

    with pytest.raises(ValidationError, match="ancestor"):
        incremental_append_scan(t, s4, s1)
    with pytest.raises(ValidationError, match="unknown"):
        changelog_scan(t, 999999, s4)


def test_incremental_join_refresh_equals_full_recompute(spark, catalog):
    """Delta-join IVM (r7): M1 = M0 ∪ (ΔA ⋈ B1) ∪ (A0 ⋈ ΔB) is
    multiset-equal to the full recompute — duplicate join keys preserved,
    the ΔA ⋈ ΔB cross term counted exactly once (ΔA joins post-delta B,
    ΔB joins pre-delta A); a range holding a non-append snapshot refuses
    (append-only contract)."""
    import pytest as _pytest
    from pyspark.sql import Row

    import go_iceberg_spark as gi
    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.incremental import incremental_join_refresh

    A = spark.createDataFrame([Row(k=i % 4, a=i) for i in range(20)])
    B = spark.createDataFrame([Row(k=i, b=i * 10) for i in range(3)])
    ta = catalog.create_table("db", "ivm_a", from_spark_schema(A.schema))
    ta.append(A)
    tb = catalog.create_table("db", "ivm_b", from_spark_schema(B.schema))
    tb.append(B)
    a0, b0 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m0 = ta.to_df().join(tb.to_df(), ["k"])

    ta.append(spark.createDataFrame([Row(k=3, a=100), Row(k=0, a=101)]))
    tb.append(spark.createDataFrame([Row(k=3, b=30), Row(k=0, b=999)]))
    m1 = incremental_join_refresh(m0, ta, tb, ["k"], from_a=a0, from_b=b0)
    full = ta.to_df().join(tb.to_df(), ["k"])
    assert m1.exceptAll(full).count() == 0 and full.exceptAll(m1).count() == 0
    assert m1.filter("k = 3 and a = 100 and b = 30").count() == 1

    ta.delete(gi.eq("a", 101))
    with _pytest.raises(ValidationError):
        incremental_join_refresh(m1, ta, tb, ["k"], from_a=a0, from_b=b0)


def test_incremental_skips_rows_preserved_replaces_not_updates(spark, catalog):
    """r7: compaction / Z-order / rewrite_manifests stamp rows-preserved on
    their REPLACE snapshots, so an incremental range spanning them reads
    only genuinely-new rows instead of raising — but UPDATE also commits a
    replace (it CHANGES row values), carries no marker, and must still
    raise: skipping on the operation alone would silently drop updated
    rows from incremental consumers."""
    from pyspark.sql import Row

    import go_iceberg_spark as gi
    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.incremental import incremental_append_scan

    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)])
    t = catalog.create_table("db", "incr_rp", from_spark_schema(df.schema))
    t.append(df)
    s1 = t.current_snapshot().snapshot_id

    t.append(spark.createDataFrame([Row(id=100, v=1.0)]))
    t.rewrite_data_files(min_input_files=2)           # rows-preserved
    t.rewrite_manifests(target_entries_per_manifest=2)  # rows-preserved
    t.append(spark.createDataFrame([Row(id=200, v=2.0)]))
    got = sorted(r.id for r in incremental_append_scan(t, s1).collect())
    assert got == [100, 200], got

    t.update(gi.eq("id", 3), {"v": -1.0})             # replace, NOT preserved
    with pytest.raises(ValidationError, match="not append"):
        incremental_append_scan(t, s1)
    # opting out still works and still excludes the update's rewrite
    assert sorted(r.id for r in incremental_append_scan(
        t, s1, ignore_non_append=True).collect()) == [100, 200]


def test_changelog_nets_manifest_rewrite_and_compaction(spark, catalog):
    """r7 probe: row-level changelog across a manifest rewrite (paths
    unchanged -> empty file diff) and a compaction (paths change -> the
    carryover eliminator nets the rewrite) both reduce to exactly the
    logical changes in the range."""
    from pyspark.sql import Row

    import go_iceberg_spark as gi
    from go_iceberg_spark.schema import from_spark_schema

    t = catalog.create_table("db", "cl_rwm", from_spark_schema(
        spark.createDataFrame([Row(id=0, v=0.0)]).schema))
    t.append(spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)]))
    s1 = t.current_snapshot().snapshot_id
    t.delete(gi.eq("id", 2), mode="merge-on-read")
    t.rewrite_manifests(target_entries_per_manifest=1)
    t.append(spark.createDataFrame([Row(id=100, v=1.0)]))
    assert sorted((r._change_type, r.id) for r in t.changes(s1).collect()) \
        == [("delete", 2), ("insert", 100)]
    t.rewrite_data_files(min_input_files=1)
    assert sorted((r._change_type, r.id) for r in t.changes(s1).collect()) \
        == [("delete", 2), ("insert", 100)]


@pytest.mark.soak
def test_incremental_join_refresh_changelog_mutable_bases(spark, catalog):
    """r8: counting-semantics delta-join IVM over MUTABLE bases — the
    changelog (insert/delete signed multisets) rides through both join
    legs, so CRUD on either side (CoW delete, update's replace, MoR
    delete, upsert's overwrite) plus in-range compaction all maintain the
    view exactly; duplicate join keys keep their multiplicities."""
    from pyspark.sql import Row

    import go_iceberg_spark as gi
    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.incremental import (
        incremental_join_refresh_changelog,
    )

    A = spark.createDataFrame([Row(k=i % 4, a=i) for i in range(20)])
    B = spark.createDataFrame([Row(k=i, b=i * 10) for i in range(4)])
    ta = catalog.create_table("db", "ivmm_a", from_spark_schema(A.schema))
    ta.append(A)
    tb = catalog.create_table("db", "ivmm_b", from_spark_schema(B.schema))
    tb.append(B)
    a0, b0 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m0 = ta.to_df().join(tb.to_df(), ["k"])

    # A takes the full CRUD mix: append (dup key), CoW delete, UPDATE (a
    # replace that changes rows), and a rows-preserved compaction
    ta.append(spark.createDataFrame([Row(k=3, a=100), Row(k=0, a=101)]))
    ta.delete(gi.eq("a", 5))
    ta.update(gi.eq("a", 6), {"a": F.lit(600)})
    ta.rewrite_data_files(min_input_files=2)
    # B: upsert (update k=0, insert unmatched k=5) + MoR delete of k=1
    tb.upsert(spark.createDataFrame([Row(k=0, b=999), Row(k=5, b=50)]), ["k"])
    tb.delete(gi.eq("k", 1), mode="merge-on-read")

    m1 = incremental_join_refresh_changelog(m0, ta, tb, ["k"],
                                            from_a=a0, from_b=b0)
    full = ta.to_df().join(tb.to_df(), ["k"])
    assert m1.exceptAll(full).count() == 0 and full.exceptAll(m1).count() == 0
    # spot invariants: the updated A row (a=6 -> 600, k=2) still pairs its
    # B row, and the upserted B value (k=0 -> 999) reaches every k=0 A row
    assert m1.filter("k = 2 and a = 600 and b = 20").count() == 1
    assert m1.filter("k = 0 and a = 101 and b = 999").count() == 1
    assert m1.filter("k = 0 and b != 999").count() == 0
    # k=1 rows are gone (MoR delete on B)
    assert m1.filter("k = 1").count() == 0

    # chainable: a second refresh over empty deltas is the identity
    a1, b1 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m2 = incremental_join_refresh_changelog(m1, ta, tb, ["k"],
                                            from_a=a1, from_b=b1)
    assert m2.exceptAll(m1).count() == 0 and m1.exceptAll(m2).count() == 0


def test_changelog_overlapping_mor_deletes_count_once(spark, catalog):
    """r8 fuzz-consumer find: overlapping merge-on-read deletes re-tombstone
    already-dead rows (the position planner marks every predicate match, and
    the spec allows a position in multiple delete files) — scans were
    unaffected (dead is dead) but the changelog replayed each delete file
    independently and reported the shared rows deleted TWICE. The live→dead
    transition diff counts each row's death exactly once."""
    t = mk(spark, catalog, "ovl_mor", [Row(id=i, v=float(i)) for i in range(6)])
    t.delete(gi.gt("id", 3), mode="merge-on-read")   # tombstones 4, 5
    t.delete(gi.gt("id", 2), mode="merge-on-read")   # re-tombstones 4, 5 + kills 3
    ch = [(r.id, r._change_type, r._change_ordinal) for r in t.changes().collect()]
    dels = sorted((i, o) for i, c, o in ch if c == "delete")
    assert dels == [(3, 2), (4, 1), (5, 1)], dels
    assert sorted(r.id for r in t.to_df().collect()) == [0, 1, 2]

    # equality-delete twin: the second delete's key list covers an
    # already-dead key — it must surface only the newly dead row
    t2 = mk(spark, catalog, "ovl_eq", [Row(id=i, v=float(i)) for i in range(4)])
    delete_equality(t2, spark.createDataFrame([(1,)], "id bigint"), ["id"])
    delete_equality(t2, spark.createDataFrame([(1,), (2,)], "id bigint"), ["id"])
    ch2 = [(r.id, r._change_type, r._change_ordinal) for r in t2.changes().collect()]
    dels2 = sorted((i, o) for i, c, o in ch2 if c == "delete")
    assert dels2 == [(1, 1), (2, 2)], dels2


def test_mor_delete_writer_skips_already_dead_rows(spark, catalog):
    """r8: the position planner reads candidate files raw, so an
    overlapping second MoR delete used to re-tombstone rows the first one
    already killed — duplicate (file, pos) pairs that inflate every later
    scan's anti-join for zero information. The writer now anti-joins
    existing applicable tombstones; the second delete file carries ONLY
    newly-dead positions."""
    import os as _os

    from go_iceberg_spark.table.metadata import CONTENT_POSITION_DELETES

    t = mk(spark, catalog, "mor_dedup", [Row(id=i, v=float(i)) for i in range(8)])
    t.delete(gi.gt("id", 5), mode="merge-on-read")   # kills 6, 7
    t.delete(gi.gt("id", 3), mode="merge-on-read")   # newly kills 4, 5 only
    pos_files = sorted(
        (e.sequence_number, e.file_path) for e in t.live_entries()
        if e.content == CONTENT_POSITION_DELETES)
    assert len(pos_files) == 2
    n_first = spark.read.parquet(_os.path.join(t.location, pos_files[0][1])).count()
    n_second = spark.read.parquet(_os.path.join(t.location, pos_files[1][1])).count()
    assert (n_first, n_second) == (2, 2), (n_first, n_second)
    assert sorted(r.id for r in t.to_df().collect()) == [0, 1, 2, 3]
    dels = sorted((r.id, r._change_ordinal) for r in t.changes().collect()
                  if r._change_type == "delete")
    assert dels == [(4, 2), (5, 2), (6, 1), (7, 1)], dels


@pytest.mark.soak
def test_mutable_ivm_across_wap_maintenance_and_expiry(spark, catalog):
    """r8 probe pin: the changelog-driven join-view refresh stays exact
    when the range contains a WAP fast_forward publish, rewrite_manifests,
    and MoR deletes; chained refreshes compose; and a from-snapshot expired
    out of retention raises ValidationError instead of silently returning
    a wrong view."""
    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.incremental import (
        incremental_join_refresh_changelog,
    )

    mk = lambda rows, ddl: spark.createDataFrame(rows, ddl)
    A = mk([(i % 4, i) for i in range(16)], "k bigint, a bigint")
    B = mk([(i, i * 10) for i in range(4)], "k bigint, b bigint")
    ta = catalog.create_table("db", "xivm_a", from_spark_schema(A.schema))
    ta.append(A)
    tb = catalog.create_table("db", "xivm_b", from_spark_schema(B.schema))
    tb.append(B)
    a0, b0 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m0 = ta.to_df().join(tb.to_df(), ["k"])

    ta.delete(gi.eq("a", 5))
    ta.append(mk([(0, 100)], "k bigint, a bigint"))
    ta.rewrite_data_files(min_input_files=2)
    ta.expire_snapshots(retain_last=2)
    if a0 not in {s.snapshot_id for s in ta.snapshots()}:
        with pytest.raises(ValidationError):
            incremental_join_refresh_changelog(m0, ta, tb, ["k"],
                                               from_a=a0, from_b=b0)

    def eq_ms(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    a1, b1 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m1 = ta.to_df().join(tb.to_df(), ["k"]).localCheckpoint()
    tb.create_branch("aud")
    tb.append_to_branch("aud", mk([(9, 90)], "k bigint, b bigint"))
    tb.fast_forward("main", "aud")
    ta.append(mk([(9, 900), (1, 101)], "k bigint, a bigint"))
    ta.rewrite_manifests(target_entries_per_manifest=2)
    tb.upsert(mk([(0, 999)], "k bigint, b bigint"), ["k"])
    m2 = incremental_join_refresh_changelog(m1, ta, tb, ["k"],
                                            from_a=a1, from_b=b1)
    assert eq_ms(m2, ta.to_df().join(tb.to_df(), ["k"]))
    assert m2.filter("k = 9 and a = 900 and b = 90").count() == 1

    a2, b2 = ta.current_snapshot().snapshot_id, tb.current_snapshot().snapshot_id
    m2c = m2.localCheckpoint()
    ta.delete(gi.eq("k", 9), mode="merge-on-read")
    m3 = incremental_join_refresh_changelog(m2c, ta, tb, ["k"],
                                            from_a=a2, from_b=b2)
    assert eq_ms(m3, ta.to_df().join(tb.to_df(), ["k"]))
    assert m3.filter("k = 9").count() == 0


def test_changelog_eq_delete_bounds_prune_keeps_null_and_overlap_semantics(spark, catalog):
    """r8: the changelog's eq-delete before/after read prunes data files
    whose key bounds cannot overlap the delete file's key bounds — but a
    NULL delete key matches NULL data keys null-safely regardless of
    scalar ranges, and a rename between write and read must not break the
    field-id bound mapping. All deltas must still surface exactly once."""
    from pyspark.sql import Row

    from go_iceberg_spark.schema import from_spark_schema

    # two disjoint-range files + one NULL-keyed row in the high file
    df1 = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(5)])
    t = catalog.create_table("db", "eqprune", from_spark_schema(df1.schema))
    t.append(df1)
    t.append(spark.createDataFrame(
        [Row(id=100 + i, v=1.0) for i in range(5)] + [Row(id=None, v=9.0)]))
    t.update_schema().rename_column("id", "ident").commit()
    # delete keys: 3 (low file only) and NULL (high file's NULL row)
    delete_equality(t, spark.createDataFrame(
        [(3,), (None,)], "ident bigint"), ["ident"])
    dels = sorted(((r.ident, r.v) for r in t.changes().collect()
                   if r._change_type == "delete"),
                  key=lambda x: (x[0] is None, x))
    assert dels == [(3, 3.0), (None, 9.0)], dels
    assert t.to_df().count() == 9


def test_changelog_eq_delete_decimal_bounds_not_lexicographic(spark, catalog):
    """r9 (r8 ADVICE medium): decimal bounds are encode_stat'd as
    str(Decimal), so a raw </> disproof is LEXICOGRAPHIC — a delete key
    99 vs a data-file key range [99, 200] yields '200' < '99' = True and
    the file was wrongly pruned, silently dropping the delete row from
    the changelog. The pruner must decode decimals back before comparing."""
    from decimal import Decimal

    from go_iceberg_spark.schema import from_spark_schema

    df1 = spark.createDataFrame(
        [(Decimal(f"{v}.00"), "low") for v in (1, 5, 50)],
        "price decimal(10,2), tag string")
    t = catalog.create_table("db", "eqdec", from_spark_schema(df1.schema))
    t.append(df1)
    # second file: range [99.00, 200.00] — lexicographically '200' < '99'
    t.append(spark.createDataFrame(
        [(Decimal(f"{v}.00"), "high") for v in (99, 120, 200)],
        "price decimal(10,2), tag string"))
    delete_equality(t, spark.createDataFrame(
        [(Decimal("99.00"),)], "price decimal(10,2)"), ["price"])
    ch = t.changes()
    dels = rows_of(ch.filter("_change_type = 'delete'"), "price", "tag")
    assert dels == [(Decimal("99.00"), "high")], dels
    # and the pruner still SKIPS the provably-disjoint low file: bound the
    # before/after read via the plan — the low file's rows never transition,
    # so the scan after the delete must show all three low rows intact
    assert t.to_df().filter("tag = 'low'").count() == 3
    assert t.to_df().count() == 5


def test_incremental_agg_refresh_changelog_mutable_base(spark, catalog):
    """r9 (VERDICT task #3): GROUP BY view maintenance over a CRUD base —
    the signed changelog aggregates to per-group deltas that merge into the
    old view additively; groups die when their merged count hits zero and
    are born when a delta group has no old row. The generic strategy
    re-aggregates touched groups from base-at-to instead (non-additive
    aggs). Both must equal the full recompute over any mutation mix."""
    from go_iceberg_spark.table.incremental import (
        incremental_agg_refresh_changelog,
    )

    rows = [Row(k=i % 5, v=float(i)) for i in range(20)]
    t = mk(spark, catalog, "aggivm", rows)
    s0 = t.current_snapshot().snapshot_id

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"))

    g0 = agg(t.to_df())
    g0.collect()  # materialize before mutating

    import go_iceberg_spark as gi
    from go_iceberg_spark.expr import col as C
    from go_iceberg_spark.table.transaction import delete_equality

    t.append(spark.createDataFrame([Row(k=7, v=100.0), Row(k=0, v=1.5)]))
    t.update(C("k").eq(1), {"v": 999.0})          # CoW update
    t.delete(C("k").eq(2))                        # CoW delete: group 2 dies
    t.upsert(spark.createDataFrame([Row(k=3, v=-1.0), Row(k=8, v=8.0)]),
             ["k"])                               # update-all-matched + insert
    delete_equality(t, spark.createDataFrame([Row(k=4)]), ["k"])  # MoR: group 4 dies

    expected = sorted((r.k, r.n, r.sv) for r in agg(t.to_df()).collect())

    g1 = incremental_agg_refresh_changelog(
        g0, t, ["k"], from_snapshot_id=s0,
        count_col="n", sum_cols={"sv": "v"})
    got = sorted((r.k, r.n, r.sv) for r in g1.collect())
    assert got == expected, (got, expected)

    g1g = incremental_agg_refresh_changelog(
        g0, t, ["k"], from_snapshot_id=s0, agg_fn=agg)
    gotg = sorted((r.k, r.n, r.sv) for r in g1g.collect())
    assert gotg == expected, (gotg, expected)

    # untouched groups must pass through without aggregating: a view row
    # absent from the delta's key set survives verbatim (multiset check
    # via exceptAll on the untouched slice)
    from pyspark.sql import functions as SF
    touched_keys = {r.k for r in t.changes(from_snapshot_id=s0)
                    .select("k").distinct().collect()}
    untouched = [r for r in g0.collect() if r.k not in touched_keys]
    for r in untouched:
        assert (r.k, r.n, r.sv) in got


def test_topk_view_ivm_multi_row_groups_death_and_null_key(spark, catalog):
    """r10: the generic IVM strategy over a MULTI-ROW-per-group view
    (top-2 per key) — the untouched/touched split keys on the GROUP, so
    (a) a dethroned rank-1 row's runner-up re-ranks in, (b) a group whose
    every row is deleted disappears entirely (agg_fn emits nothing for
    it), (c) a NULL group key maintains as the real group it is, and
    (d) untouched groups' rows pass through verbatim."""
    from pyspark.sql import Window

    from go_iceberg_spark.expr import col as C
    from go_iceberg_spark.table.incremental import (
        incremental_agg_refresh_changelog,
    )

    rows = ([Row(k=k, o=10 * k + j, v=float(100 - j)) for k in range(3)
             for j in range(4)]
            + [Row(k=None, o=900 + j, v=float(50 + j)) for j in range(3)])
    t = mk(spark, catalog, "topkivm", rows)
    s0 = t.current_snapshot().snapshot_id

    def topk(df):
        w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("o").asc())
        return (df.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= 2).select("k", "o", "v", "rnk"))

    g0 = topk(t.to_df())
    g0.collect()

    t.delete(C("o").eq(10))       # dethrones k=1's rank-1 (o=10, v=100)
    t.delete(C("k").eq(2))        # group 2 dies entirely
    t.append(spark.createDataFrame([(None, 999, 500.0)],
                                   "k bigint, o bigint, v double"))  # new NULL-group top

    g1 = incremental_agg_refresh_changelog(
        g0, t, ["k"], from_snapshot_id=s0, agg_fn=topk)
    got = sorted(((r.k if r.k is not None else -1), r.o, r.v, r.rnk)
                 for r in g1.collect())
    want = sorted(((r.k if r.k is not None else -1), r.o, r.v, r.rnk)
                  for r in topk(t.to_df()).collect())
    assert got == want, (got, want)
    # group 2 died
    assert not [x for x in got if x[0] == 2]
    # k=1's runner-up (o=11, v=99) is the new rank-1
    assert (1, 11, 99.0, 1) in got
    # the NULL group re-ranked around the new top
    assert (-1, 999, 500.0, 1) in got
    # untouched group 0 passed through verbatim
    assert [x for x in got if x[0] == 0] == \
        sorted((0, r.o, r.v, r.rnk) for r in g0.collect() if r.k == 0)


def test_eq_delete_changelog_prune_ratio_disjoint_files():
    """r9 soak regression (SOAK.md r9): with N data files of DISJOINT key
    ranges and one eq-delete file, the changelog's before/after suppression
    read touches only the files whose range overlaps the delete's bounds —
    I/O ∝ overlapping files, never table size (the claim the pruner's
    docstring makes). NULL delete keys additionally keep every file that
    holds NULL keys; float-keyed deletes refuse the disproof entirely."""
    from go_iceberg_spark.schema import (
        DOUBLE,
        LONG,
        NestedField,
        Schema,
        StructType,
    )
    from go_iceberg_spark.table.incremental import files_that_may_lose_rows
    from go_iceberg_spark.table.metadata import (
        CONTENT_EQUALITY_DELETES,
        DataFileEntry,
    )

    schema = Schema(0, StructType((NestedField(1, "id", LONG),
                                   NestedField(2, "x", DOUBLE))))

    def data(i, nulls=0):
        return DataFileEntry(
            content=0, file_path=f"data/f{i}.parquet", file_format="parquet",
            spec_id=0, schema_id=0, record_count=1000, file_size=1 << 20,
            partition={}, sequence_number=1,
            column_stats={1: {"min": i * 1000, "max": i * 1000 + 999,
                              "null_count": nulls, "value_count": 1000}})

    def eq_del(stats, ids=(1,)):
        return DataFileEntry(
            content=CONTENT_EQUALITY_DELETES, file_path="del/d.parquet",
            file_format="parquet", spec_id=0, schema_id=0, record_count=1,
            file_size=1 << 10, partition={}, sequence_number=2,
            column_stats=stats, equality_ids=tuple(ids))

    n = 5000
    files = [data(i) for i in range(n)]
    # point delete inside file 2500's range: exactly one survivor
    d = eq_del({1: {"min": 2_500_123, "max": 2_500_123, "null_count": 0,
                    "value_count": 1}})
    kept = files_that_may_lose_rows(schema, [d], files)
    assert [e.file_path for e in kept] == ["data/f2500.parquet"]

    # NULL delete key: files holding NULLs survive too, scalar-disjoint or not
    files_n = [data(i, nulls=(5 if i == 7 else 0)) for i in range(n)]
    dn = eq_del({1: {"min": 2_500_123, "max": 2_500_123, "null_count": 1,
                     "value_count": 2}})
    kept = files_that_may_lose_rows(schema, [dn], files_n)
    assert sorted(e.file_path for e in kept) == ["data/f2500.parquet",
                                                 "data/f7.parquet"]

    # float-keyed delete: NaN-unsafe bounds refuse the disproof — keep all
    df = eq_del({2: {"min": 1.5, "max": 2.5, "null_count": 0,
                     "value_count": 1}}, ids=(2,))
    files_f = [DataFileEntry(**{**data(i).__dict__, "column_stats": {
        2: {"min": float(i), "max": float(i) + 0.5,
            "null_count": 0, "value_count": 1000}}}) for i in range(50)]
    assert len(files_that_may_lose_rows(schema, [df], files_f)) == 50

    # delete at same-or-lower sequence number applies to NO older file
    d_old = DataFileEntry(**{**d.__dict__, "sequence_number": 1})
    assert files_that_may_lose_rows(schema, [d_old], files) == []


def test_aggregate_ivm_null_group_key(spark, catalog):
    """r9 self-review: NULL is a REAL group under groupBy, but a plain
    name-list equi-join never matches NULL keys — the split would route the
    NULL-keyed view row to `untouched` (stale) AND re-emit the NULL group
    from the delta merge: one group, two rows. The null-safe key matching
    must maintain the NULL group exactly, in both strategies."""
    from go_iceberg_spark.table.incremental import (
        incremental_agg_refresh_changelog,
    )

    rows = [Row(k=None, v=1.0), Row(k=None, v=2.0), Row(k=1, v=3.0),
            Row(k=2, v=4.0)]
    t = mk(spark, catalog, "aggnull", rows)
    s0 = t.current_snapshot().snapshot_id

    def agg(df):
        return df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                   F.sum("v").alias("sv"))

    g0 = agg(t.to_df())
    g0.collect()
    # mutate the NULL group AND an int group; group 2 untouched
    t.append(spark.createDataFrame([Row(k=None, v=10.0), Row(k=1, v=30.0)]))
    from go_iceberg_spark.expr import col as C
    t.delete(C("v").eq(1.0))  # kills one NULL-group row

    want = sorted(((r.k, r.n, r.sv) for r in agg(t.to_df()).collect()),
                  key=lambda x: (x[0] is None, x))
    g1 = incremental_agg_refresh_changelog(
        g0, t, ["k"], from_snapshot_id=s0, count_col="n", sum_cols={"sv": "v"})
    got = sorted(((r.k, r.n, r.sv) for r in g1.collect()),
                 key=lambda x: (x[0] is None, x))
    assert got == want, (got, want)
    assert sum(1 for k, _, _ in got if k is None) == 1  # exactly ONE null row

    g1g = incremental_agg_refresh_changelog(
        g0, t, ["k"], from_snapshot_id=s0, agg_fn=agg)
    gotg = sorted(((r.k, r.n, r.sv) for r in g1g.collect()),
                  key=lambda x: (x[0] is None, x))
    assert gotg == want, (gotg, want)


def test_aggregate_ivm_generic_path_survives_rename_after_to(spark, catalog):
    """r9 review find: the generic (agg_fn) strategy re-aggregates the base
    at ``to``, whose time-travel read pins the SNAPSHOT's column names —
    group keys carry CURRENT names, so a rename landing after ``to`` must
    be bridged by field id, not crash the key match."""
    from pyspark.sql import functions as SF

    from go_iceberg_spark.table.incremental import (
        incremental_agg_refresh_changelog,
    )

    t = mk(spark, catalog, "ivmrn", [Row(k=i % 3, v=float(i)) for i in range(9)])
    s0 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([Row(k=5, v=50.0)]))
    to_id = t.current_snapshot().snapshot_id
    t.update_schema().rename_column("k", "kk").commit()  # AFTER to

    def agg(df):
        return df.groupBy("kk").agg(SF.count(SF.lit(1)).alias("n"),
                                    SF.sum("v").alias("sv"))

    g0 = (t.scan().use_snapshot(s0).to_df().groupBy("k")
          .agg(SF.count(SF.lit(1)).alias("n"), SF.sum("v").alias("sv"))
          .withColumnRenamed("k", "kk"))
    g1 = incremental_agg_refresh_changelog(
        g0, t, ["kk"], from_snapshot_id=s0, to_snapshot_id=to_id, agg_fn=agg)
    got = sorted((r.kk, r.n, r.sv) for r in g1.collect())
    want = sorted((r.kk, r.n, r.sv) for r in agg(t.to_df()).collect())
    assert got == want, (got, want)
