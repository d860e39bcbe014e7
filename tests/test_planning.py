"""Metadata-scale scan planning (table/planning.py): pruned driver reads,
the distributed Spark path, and snapshot-level bounds short-circuit.

The reference plans with a driver loop over every entry and always-true
pruning stubs (reference: table/scan.go:101-190, table/insert.go:255-266);
these tests pin the scale behavior the engine replaces that with."""

from __future__ import annotations

import time

import pytest

from go_iceberg_spark.expr import and_, eq, gt, is_null, isin, lt, simplify, starts_with
from go_iceberg_spark.schema import DOUBLE, LONG, STRING, NestedField, Schema, StructType
from go_iceberg_spark.table.metadata import DataFileEntry, write_manifest
from go_iceberg_spark.table.planning import (
    plan_distributed,
    prune_manifest_driver,
    summary_bounds,
    summary_might_match,
)
from go_iceberg_spark.table.scan import _encode_filter

SCHEMA = Schema(0, StructType((
    NestedField(1, "x", LONG, False),
    NestedField(2, "s", STRING, False),
    NestedField(3, "v", DOUBLE, False),
)))


def make_entries(n, with_deletes=True):
    out = [
        DataFileEntry(
            content=0, file_path=f"data/part-{i:06d}.parquet", file_format="parquet",
            spec_id=0, schema_id=0, record_count=100, file_size=1 << 20,
            partition={},
            column_stats={
                1: {"min": i * 10, "max": i * 10 + 9, "null_count": 0, "value_count": 100},
                2: {"min": f"k{i:06d}", "max": f"k{i:06d}z", "null_count": 2, "value_count": 100},
                3: {"min": float(i), "max": float(i) + 0.5, "null_count": 0, "value_count": 100},
            },
            sequence_number=1,
        )
        for i in range(n)
    ]
    if with_deletes:
        out.append(DataFileEntry(
            content=1, file_path="data/del-0.parquet", file_format="parquet",
            spec_id=0, schema_id=0, record_count=3, file_size=100,
            partition={}, column_stats={}, sequence_number=2,
        ))
    return out


@pytest.fixture(scope="module")
def manifest_100(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("m") / "m.parquet")
    write_manifest(p, make_entries(100))
    return p


def enc(e):
    return _encode_filter(simplify(e), SCHEMA)


def test_pruned_driver_matches_naive(manifest_100):
    got = prune_manifest_driver(manifest_100, enc(gt("x", 500)), SCHEMA)
    data = [e for e in got if e.content == 0]
    # max = i*10+9 > 500 -> i >= 50 (i=49: max 499)
    assert sorted(e.file_path for e in data) == [f"data/part-{i:06d}.parquet" for i in range(50, 100)]
    # delete entries always survive
    assert any(e.content == 1 for e in got)
    # survivors carry full stats for downstream use
    assert data[0].column_stats[2]["null_count"] == 2


def test_pruned_driver_compound_and_in(manifest_100):
    got = prune_manifest_driver(
        manifest_100, enc(and_(gt("x", 100), lt("v", 20.0))), SCHEMA)
    data = [e.file_path for e in got if e.content == 0]
    # x: i >= 10; v: min=i < 20 -> i <= 19
    assert data == [f"data/part-{i:06d}.parquet" for i in range(10, 20)]

    got = prune_manifest_driver(manifest_100, enc(isin("x", 5, 995)), SCHEMA)
    data = [e.file_path for e in got if e.content == 0]
    assert data == ["data/part-000000.parquet", "data/part-000099.parquet"]


def test_pruned_driver_string_fallback(manifest_100):
    # string-typed bounds use the exact per-row path
    got = prune_manifest_driver(manifest_100, enc(eq("s", "k000042x")), SCHEMA)
    data = [e.file_path for e in got if e.content == 0]
    assert data == ["data/part-000042.parquet"]
    # starts_with is conservative but must not drop the matching file
    got = prune_manifest_driver(manifest_100, enc(starts_with("s", "k00007")), SCHEMA)
    assert "data/part-000070.parquet" in [e.file_path for e in got]


def test_pruned_driver_is_null(manifest_100):
    got = prune_manifest_driver(manifest_100, enc(is_null("x")), SCHEMA)
    assert [e for e in got if e.content == 0] == []  # null_count=0 everywhere
    got = prune_manifest_driver(manifest_100, enc(is_null("s")), SCHEMA)
    assert len([e for e in got if e.content == 0]) == 100  # s has nulls


def test_distributed_matches_driver(spark, manifest_100):
    for f in (gt("x", 500), and_(gt("x", 100), lt("v", 20.0)), isin("x", 5, 995),
              eq("s", "k000042x"), is_null("x")):
        a = {e.file_path for e in prune_manifest_driver(manifest_100, enc(f), SCHEMA)}
        b = {e.file_path for e in plan_distributed(spark, manifest_100, enc(f), SCHEMA)}
        # the Catalyst predicate may be more conservative (string ops) but
        # must never drop a file the driver path keeps
        assert a <= b, f
        if f is not None and not isinstance(f, str):
            pass
    # numeric filters are exact on both paths
    a = {e.file_path for e in prune_manifest_driver(manifest_100, enc(gt("x", 500)), SCHEMA)}
    b = {e.file_path for e in plan_distributed(spark, manifest_100, enc(gt("x", 500)), SCHEMA)}
    assert a == b


def test_planning_100k_under_a_second(tmp_path):
    p = str(tmp_path / "big.parquet")
    write_manifest(p, make_entries(100_000, with_deletes=False))
    t0 = time.time()
    got = prune_manifest_driver(p, enc(gt("x", 990_000)), SCHEMA)
    dt = time.time() - t0
    assert len(got) == 1000  # i*10+9 > 990000 -> i >= 99000
    assert dt < 1.0, f"100k-entry planning took {dt:.2f}s"


def test_summary_bounds_short_circuit():
    entries = make_entries(100)
    b = summary_bounds(entries)
    assert summary_might_match(b, enc(gt("x", 500)), SCHEMA) is True
    assert summary_might_match(b, enc(gt("x", 10**7)), SCHEMA) is False
    assert summary_might_match(b, enc(lt("x", -5)), SCHEMA) is False
    # unknown junk never blocks a scan
    assert summary_might_match("not json", enc(gt("x", 1)), SCHEMA) is True


def test_scan_uses_bounds_short_circuit(spark, catalog):
    """End-to-end: a committed table's snapshot carries bounds, and an
    out-of-range scan plans zero files without touching the manifest."""
    import go_iceberg_spark as gi
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(id=i, name=f"n{i}") for i in range(50)])
    from go_iceberg_spark.schema import from_spark_schema

    cat = catalog
    cat.create_namespace(("db",))
    t = cat.create_table(("db",), "bounded", from_spark_schema(df.schema))
    t.append(df)
    assert "bounds" in t.current_snapshot().summary
    assert t.scan().filter(gi.gt("id", 10**6)).plan_files() == []
    assert len(t.scan().filter(gi.gt("id", 25)).plan_files()) >= 1


def test_legacy_blob_manifest_still_reads_and_prunes(tmp_path):
    """Manifests written before the columnar-stats layout (stats_json blob
    per entry) still read and prune — tables from older engine versions keep
    working without a rewrite."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_iceberg_spark.table.metadata import read_manifest

    entries = make_entries(20, with_deletes=False)
    cols = {
        "content": [e.content for e in entries],
        "file_path": [e.file_path for e in entries],
        "file_format": ["parquet"] * 20,
        "spec_id": [0] * 20,
        "schema_id": [0] * 20,
        "record_count": [e.record_count for e in entries],
        "file_size": [e.file_size for e in entries],
        "partition_json": ["{}"] * 20,
        "stats_json": [json.dumps({str(k): v for k, v in e.column_stats.items()})
                       for e in entries],
        "sequence_number": [1] * 20,
        "equality_ids_json": ["[]"] * 20,
    }
    p = str(tmp_path / "legacy.parquet")
    pq.write_table(pa.table(cols), p)

    got = read_manifest(p)
    assert got == entries
    pruned = prune_manifest_driver(p, enc(gt("x", 100)), SCHEMA)
    assert sorted(e.file_path for e in pruned) == sorted(e.file_path for e in entries[10:])


def test_distributed_over_manifest_list_members(spark, tmp_path):
    """The distributed planner accepts a manifest-LIST's member paths (the
    incremental commit layout) and prunes across all of them in one job."""
    p1, p2 = str(tmp_path / "m1.parquet"), str(tmp_path / "m2.parquet")
    e1, e2 = make_entries(500), make_entries(500)
    # shift the second member's ids so the two files don't collide
    e2 = [
        DataFileEntry(e.content, "g2/" + e.file_path, e.file_format, e.spec_id,
                      e.schema_id, e.record_count, e.file_size, e.partition,
                      e.column_stats, e.sequence_number, e.equality_ids)
        for e in e2
    ]
    write_manifest(p1, e1)
    write_manifest(p2, e2)
    single1 = {e.file_path for e in plan_distributed(spark, p1, enc(gt("x", 2000)), SCHEMA)}
    single2 = {e.file_path for e in plan_distributed(spark, p2, enc(gt("x", 2000)), SCHEMA)}
    both = {e.file_path for e in plan_distributed(spark, [p1, p2], enc(gt("x", 2000)), SCHEMA)}
    assert both == single1 | single2
    assert any(fp.startswith("g2/") for fp in both) and len(both) > 0


def test_distributed_mixed_prebloom_members(spark, tmp_path):
    """Manifest lists REUSE immutable member manifests across snapshots, so
    one plan can read members written before the stats_blooms column existed
    next to new ones. plan_distributed must mergeSchema and entry building
    must tolerate a null row-level blooms array."""
    import pyarrow.parquet as pq

    p_new = str(tmp_path / "new.parquet")
    write_manifest(p_new, make_entries(10, with_deletes=False))
    # simulate a pre-bloom member: same manifest minus the stats_blooms column
    p_old = str(tmp_path / "old.parquet")
    tbl = pq.read_table(p_new)
    pq.write_table(tbl.drop_columns(["stats_blooms"]), p_old)

    for f in (gt("x", 30), is_null("x")):
        a = {e.file_path for e in prune_manifest_driver(p_new, enc(f), SCHEMA)}
        both = {e.file_path
                for e in plan_distributed(spark, [p_old, p_new], enc(f), SCHEMA)}
        assert both == a  # same logical entries in both members


def test_distributed_tier_prunes_bucket_partitions(spark, catalog, monkeypatch):
    """The bucket-partition predicate must run INSIDE the distributed
    planning job (get_json_object over partition_json), not as a driver
    post-filter — at manifest scale a hashed layout would otherwise collect
    every data entry for an EQ lookup. Forced through the distributed tier
    via DISTRIBUTED_THRESHOLD=0."""
    import go_iceberg_spark.table.planning as P
    from go_iceberg_spark import eq
    from go_iceberg_spark.schema import from_spark_schema
    from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec

    from pyspark.sql import functions as F

    df = spark.range(0, 400).select(F.col("id"), (F.col("id") % 7).alias("v"))
    schema = from_spark_schema(df.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (PartitionField(fid["id"], 1000, "bucket[8]", "id_bucket"),))
    t = catalog.create_table("db", "dist_bucketed", schema, spec=spec)
    t.append(df)

    monkeypatch.setattr(P, "DISTRIBUTED_THRESHOLD", 0)
    sb = t.scan().filter(eq("id", 123))
    pruned = sb.plan_files()
    assert len(pruned) == 1, f"expected 1 bucket file, planned {len(pruned)}"
    assert [r["id"] for r in sb.to_df().collect()] == [123]


def test_bucket_pred_disabled_when_name_reused_by_non_bucket_transform(spark):
    """ADVICE r3 (medium): a partition-field NAME defined by identity in one
    spec and bucket[N] in another must emit NO bucket condition — the
    identity generation's partition_json holds raw values, and comparing
    them to bucket ordinals at the distributed tier silently pruned live
    files. Same-definition bucket reuse across specs still prunes."""
    from go_iceberg_spark.expr import eq
    from go_iceberg_spark.schema import LONG, NestedField, Schema, StructType
    from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec
    from go_iceberg_spark.table.planning import _bucket_partition_pred

    schema = Schema(0, StructType((NestedField(1, "k", LONG),)))
    clash_specs = [
        PartitionSpec(0, (PartitionField(1, 1000, "identity", "k"),)),
        PartitionSpec(1, (PartitionField(1, 1001, "bucket[8]", "k"),)),
    ]
    assert _bucket_partition_pred(eq("k", 42), clash_specs, schema) is None

    ok_specs = [
        PartitionSpec(0, (PartitionField(1, 1000, "bucket[8]", "kb"),)),
        PartitionSpec(1, (PartitionField(1, 1001, "bucket[8]", "kb"),)),
    ]
    assert _bucket_partition_pred(eq("k", 42), ok_specs, schema) is not None

    # different bucket definitions under one name: also disabled
    redef_specs = [
        PartitionSpec(0, (PartitionField(1, 1000, "bucket[8]", "kb"),)),
        PartitionSpec(1, (PartitionField(1, 1001, "bucket[4]", "kb"),)),
    ]
    assert _bucket_partition_pred(eq("k", 42), redef_specs, schema) is None


def test_member_bounds_skip_ratio_clustered_vs_path_ordered(spark, tmp_path):
    """r8 scale-soak regression (SOAK.md r8): with members CLUSTERED by value
    range (what rewrite_manifests(target_entries_per_manifest=...) produces)
    a point filter keeps exactly the covering member — 1/N of the member
    manifests are ever read — while path-ordered members have near-full-range
    bounds and keep everything. At 100k entries the measured planning gap is
    ~112x; this pins the ratio structurally at a test-sized tree."""
    import random

    import go_iceberg_spark as gi
    from go_iceberg_spark.schema import LONG, NestedField, Schema, StructType
    from go_iceberg_spark.table.metadata import (
        DataFileEntry,
        write_manifest,
        write_manifest_list,
    )
    from go_iceberg_spark.table.planning import (
        prune_manifest_driver,
        summary_bounds,
        summary_might_match,
    )
    from go_iceberg_spark.table.scan import _encode_filter, simplify

    schema = Schema(0, StructType((NestedField(1, "id", LONG),)))

    def entry(i):
        return DataFileEntry(
            content=0, file_path=f"data/f{i}.parquet", file_format="parquet",
            spec_id=0, schema_id=0, record_count=1000, file_size=1 << 20,
            partition={}, sequence_number=1,
            column_stats={1: {"min": i * 1000, "max": i * 1000 + 999,
                              "null_count": 0, "value_count": 1000}})

    def build(tag, clustered):
        d = tmp_path / tag
        d.mkdir()
        idx = list(range(5000))
        if not clustered:
            random.Random(7).shuffle(idx)
        members = []
        for m in range(0, 5000, 500):
            es = [entry(i) for i in idx[m:m + 500]]
            rel = f"m{m // 500}.parquet"
            write_manifest(str(d / rel), es)
            members.append({"path": rel, "n": len(es), "nd": 0,
                            "bounds": summary_bounds(es)})
        write_manifest_list(str(d / "list.json"), members)
        return d, members

    flt = _encode_filter(simplify(gi.eq("id", 2_500_123)), schema)

    def kept(members):
        return [m for m in members if m["nd"]
                or not summary_might_match(m["bounds"], flt, schema) is False]

    d_c, mem_c = build("clu", True)
    d_s, mem_s = build("sho", False)
    kept_c, kept_s = kept(mem_c), kept(mem_s)
    assert len(kept_c) == 1, [m["path"] for m in kept_c]   # 1/10 members
    assert len(kept_s) == 10                               # bounds useless
    # the surviving clustered member prunes to exactly the covering entry
    ents = prune_manifest_driver(str(d_c / kept_c[0]["path"]), flt, schema)
    assert len(ents) == 1 and ents[0].file_path == "data/f2500.parquet"
