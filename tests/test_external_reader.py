"""Spec-only external reader for ``manifest-format=avro`` tables.

Interop gate for the Iceberg wire mode (VERDICT r2 task #1 fallback — no
pyiceberg in the sandbox): a reader implemented HERE, from the spec alone,
reconstructs the table's planned-file output using ONLY the on-disk
artifacts and non-engine parsers:

- table metadata:   plain ``json`` over ``metadata/vN.metadata.json``
- manifest list:    the *Java* Apache Avro implementation on Spark's classpath
- member manifests: same Java reader
- bound values:     decoded with ``struct`` straight off the spec's
                    little-endian single-value encoding (Appendix D) —
                    byte-for-byte, no engine serde involved
- row count:        DuckDB over the parquet data + delete files, applying the
                    spec's sequence-number MoR rules (position deletes apply at
                    delete_seq >= data_seq, equality deletes at > )

and must agree with ``scan().plan_files()`` / ``scan().count()`` on a
CRUD-exercised table (appends + CoW delete + MoR position delete + equality
delete).  Reference layout being validated: spec/avro.go:91-171 (manifest
list), :302-335 (entries), :338-534 (serde), :814-883 (bounds);
spec/metadata.go:55-78 (metadata JSON).
"""

from __future__ import annotations

import json
import os
import struct

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Row

import go_iceberg_spark as gi
from go_iceberg_spark.schema import from_spark_schema
from go_iceberg_spark.table.transaction import delete_equality

STATUS_DELETED = 2


# ---------------------------------------------------------------------------
# the external reader (spec-only; none of the engine's Python readers)
# ---------------------------------------------------------------------------


def _jocf(spark, path):
    """Read an Avro OCF through the JVM's org.apache.avro — returns
    (writer schema as dict, file metadata dict, records as dicts).  Byte
    fields come back latin-1-mapped inside the JSON rendering; callers
    recover them with .encode('latin-1')."""
    jvm = spark.sparkContext._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    schema = json.loads(dfr.getSchema().toString())
    meta = {k: dfr.getMetaString(k) for k in dfr.getMetaKeys()}
    records = []
    while dfr.hasNext():
        records.append(json.loads(dfr.next().toString()))
    dfr.close()
    return schema, meta, records


def _raw(v):
    return None if v is None else v.encode("latin-1")


def external_table_state(spark, location):
    """metadata JSON -> manifest list -> manifests -> live entries, with no
    engine reader in the path.  Returns (metadata json, current snapshot
    json, manifest-file records, live entry records)."""
    mdir = os.path.join(location, "metadata")
    versions = sorted(
        int(n[1 : -len(".metadata.json")])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".metadata.json")
    )
    with open(os.path.join(mdir, f"v{versions[-1]}.metadata.json")) as f:
        md = json.load(f)
    assert md["format-version"] == 2
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"])
    # the spec's key for the Avro manifest list ("manifest-list"); the
    # engine-native "manifest" key may point at the parquet dialect instead
    list_path = os.path.join(location, snap["manifest-list"])
    assert list_path.endswith(".avro"), "manifest-list must point at an OCF manifest list"

    _, list_meta, manifest_files = _jocf(spark, list_path)
    assert int(list_meta["snapshot-id"]) == snap["snapshot-id"]
    assert list_meta["format-version"] == "2"

    entries = []
    for mf in manifest_files:
        mschema, mmeta, recs = _jocf(spark, os.path.join(location, mf["manifest_path"]))
        assert mmeta["format-version"] == "2"
        # spec field ids present on the wire schema
        top_ids = {f["name"]: f.get("field-id") for f in mschema["fields"]}
        assert top_ids["status"] == 0 and top_ids["data_file"] == 2
        for r in recs:
            if r["status"] == STATUS_DELETED:
                continue
            # spec sequence-number INHERITANCE: an ADDED entry with a null
            # sequence_number inherits the manifest's (v2 writers may omit
            # it on fresh entries; the engine stamps explicit numbers, but
            # a spec-only reader must handle both encodings)
            if r.get("sequence_number") is None and r["status"] == 1:
                r["sequence_number"] = mf["sequence_number"]
            entries.append(r)
    return md, snap, manifest_files, entries


def _field_types(md):
    """field id -> iceberg type string, from the CURRENT schema's JSON."""
    cur = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    return {f["id"]: f["type"] for f in cur["fields"]}, {
        f["id"]: f["name"] for f in cur["fields"]
    }


def _decode_bound(type_name, raw):
    """Spec Appendix D single-value decode, implemented independently."""
    if raw is None:
        return None
    if type_name == "long":
        return struct.unpack("<q", raw)[0]
    if type_name == "int":
        return struct.unpack("<i", raw)[0]
    if type_name == "double":
        return struct.unpack("<d", raw)[0]
    if type_name == "float":
        return struct.unpack("<f", raw)[0]
    if type_name == "string":
        return raw.decode("utf-8")
    if type_name == "boolean":
        return raw != b"\x00"
    raise AssertionError(f"unexpected bound type {type_name}")


def _kv(rec_list):
    return {kv["key"]: kv["value"] for kv in rec_list or []}


# ---------------------------------------------------------------------------
# the CRUD-exercised fixture table
# ---------------------------------------------------------------------------


def _crud_table(spark, catalog, properties=None):
    rows1 = [Row(ok=i, price=float(i) * 10.0, note=f"note-{i:03d}") for i in range(50)]
    rows2 = [Row(ok=50 + i, price=1000.0 + i, note=f"late-{i:03d}") for i in range(50)]
    df1 = spark.createDataFrame(rows1)
    df2 = spark.createDataFrame(rows2)
    t = catalog.create_table(
        "db", "ext", from_spark_schema(df1.schema), properties=properties
    )
    t.append(df1)
    t.append(df2)
    t.delete(gi.lt("ok", 10))  # CoW: rewrites the first batch's file
    t.delete(gi.gt("price", 1040.0), mode="merge-on-read")  # position-delete file
    keys = spark.createDataFrame([Row(ok=20), Row(ok=21), Row(ok=999)])
    delete_equality(t, keys, ["ok"])  # equality-delete file
    return t


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "props",
    [None, {"manifest-format": "avro"}],
    ids=["dual-default", "avro-only"],
)
def test_external_reconstructs_plan_files(spark, catalog, props):
    t = _crud_table(spark, catalog, props)
    tasks = t.scan().plan_files()

    md, snap, manifest_files, entries = external_table_state(spark, t.location)

    # -- file-set parity, data and deletes ---------------------------------
    ext_data = {e["data_file"]["file_path"]: e for e in entries if e["data_file"]["content"] == 0}
    ext_dels = {e["data_file"]["file_path"]: e for e in entries if e["data_file"]["content"] != 0}
    assert set(ext_data) == {task.file.file_path for task in tasks}
    engine_dels = {d.file_path for task in tasks for d in task.delete_files}
    assert set(ext_dels) == engine_dels
    assert any(e["data_file"]["content"] == 1 for e in ext_dels.values())  # position
    assert any(e["data_file"]["content"] == 2 for e in ext_dels.values())  # equality

    # -- per-entry parity: counts, sequence numbers, bounds byte-for-byte --
    types, _names = _field_types(md)
    for task in tasks:
        ext = ext_data[task.file.file_path]
        assert ext["data_file"]["record_count"] == task.file.record_count
        assert ext["sequence_number"] == task.file.sequence_number
        lowers = _kv(ext["data_file"]["lower_bounds"])
        uppers = _kv(ext["data_file"]["upper_bounds"])
        for fid, s in task.file.column_stats.items():
            if s.get("min") is not None:
                assert _decode_bound(types[fid], _raw(lowers[fid])) == s["min"], (
                    f"lower bound mismatch fid={fid} file={task.file.file_path}"
                )
            if s.get("max") is not None:
                assert _decode_bound(types[fid], _raw(uppers[fid])) == s["max"]

    # -- equality ids ride the wire ----------------------------------------
    eq = [e for e in ext_dels.values() if e["data_file"]["content"] == 2]
    ok_fid = next(fid for fid, n in _names_by_id(md).items() if n == "ok")
    assert all(e["data_file"]["equality_ids"] == [ok_fid] for e in eq)

    # -- manifest-list bookkeeping is self-consistent ----------------------
    for mf in manifest_files:
        _, _, recs = _jocf(spark, os.path.join(t.location, mf["manifest_path"]))
        added = [r for r in recs if r["status"] == 1]
        existing = [r for r in recs if r["status"] == 0]
        assert mf["added_files_count"] == len(added)
        assert mf["existing_files_count"] == len(existing)
        assert mf["added_rows_count"] == sum(r["data_file"]["record_count"] for r in added)
        assert mf["min_sequence_number"] == min(r["sequence_number"] for r in recs)
        # ADDED entries carry the sequence number of the snapshot that wrote
        # the member (the member's own sequence_number — reused members keep
        # their original one, exactly like Iceberg's immutable manifests)
        assert all(r["sequence_number"] == mf["sequence_number"] for r in added)


def _names_by_id(md):
    cur = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    return {f["id"]: f["name"] for f in cur["fields"]}


def test_external_row_count_matches_scan(spark, catalog):
    """DuckDB replays the MoR merge from the externally-read tree and lands on
    the engine's scan().count() — the pyiceberg-equivalent end-to-end check."""
    t = _crud_table(spark, catalog)
    md, _snap, _mfs, entries = external_table_state(spark, t.location)
    names = _names_by_id(md)

    loc = t.location
    data = [(e["data_file"]["file_path"], e["sequence_number"]) for e in entries
            if e["data_file"]["content"] == 0]
    pos = [(e["data_file"]["file_path"], e["sequence_number"]) for e in entries
           if e["data_file"]["content"] == 1]
    eqd = [(e["data_file"]["file_path"], e["sequence_number"],
            [names[fid] for fid in e["data_file"]["equality_ids"]]) for e in entries
           if e["data_file"]["content"] == 2]
    assert data and pos and eqd, "fixture must exercise all three content kinds"
    (eq_cols,) = {tuple(cols) for _, _, cols in eqd}

    con = duckdb.connect()
    con.register("datafiles", pd.DataFrame(
        {"abs": [os.path.join(loc, p) for p, _ in data], "rel": [p for p, _ in data],
         "seq": [s for _, s in data]}))
    con.register("posfiles", pd.DataFrame(
        {"abs": [os.path.join(loc, p) for p, _ in pos], "seq": [s for _, s in pos]}))
    con.register("eqfiles", pd.DataFrame(
        {"abs": [os.path.join(loc, p) for p, _, _ in eqd], "seq": [s for _, s, _ in eqd]}))

    eq_col = eq_cols[0]

    def lst(rows):
        return "[" + ", ".join(f"'{os.path.join(loc, p[0])}'" for p in rows) + "]"

    n = con.execute(
        f"""
        WITH data_rows AS (
            SELECT r.{eq_col} AS eq_key, df.rel, df.seq, r.file_row_number AS pos
            FROM read_parquet({lst(data)}, filename=true, file_row_number=true) r
            JOIN datafiles df ON r.filename = df.abs
        ),
        pos_del AS (
            SELECT p.file_path AS rel, p.pos, pf.seq AS dseq
            FROM read_parquet({lst(pos)}, filename=true) p
            JOIN posfiles pf ON p.filename = pf.abs
        ),
        eq_del AS (
            SELECT e.{eq_col} AS eq_key, ef.seq AS dseq
            FROM read_parquet({lst(eqd)}, filename=true) e
            JOIN eqfiles ef ON e.filename = ef.abs
        )
        SELECT count(*) FROM data_rows d
        WHERE NOT EXISTS (SELECT 1 FROM pos_del pd
                          WHERE pd.rel = d.rel AND pd.pos = d.pos AND pd.dseq >= d.seq)
          AND NOT EXISTS (SELECT 1 FROM eq_del ed
                          WHERE ed.eq_key IS NOT DISTINCT FROM d.eq_key AND ed.dseq > d.seq)
        """
    ).fetchone()[0]

    engine = t.scan().count()
    # CRUD arithmetic: 100 - 10 (CoW) - 9 (pos: price>1040 => ok 91..99)
    #                      - 2 (eq: ok 20,21 present; 999 absent)
    assert engine == 79
    assert n == engine


def test_dual_avro_tree_is_incremental(spark, catalog):
    """Appends REUSE prior avro member manifests verbatim (same path, same
    manifest_file record) — commit metadata cost stays O(added), the property
    that makes dual-by-default viable at 100 TB."""
    df = spark.createDataFrame([Row(a=i) for i in range(5)])
    t = catalog.create_table("db", "inc", from_spark_schema(df.schema))
    t.append(df)
    s1 = t.current_snapshot()
    assert s1.avro_manifest_path and s1.avro_manifest_path.endswith(".avro")
    _, _, mfs1 = _jocf(spark, os.path.join(t.location, s1.avro_manifest_path))

    t.append(spark.createDataFrame([Row(a=100 + i) for i in range(5)]))
    s2 = t.current_snapshot()
    assert s2.avro_manifest_path != s1.avro_manifest_path
    _, _, mfs2 = _jocf(spark, os.path.join(t.location, s2.avro_manifest_path))
    assert len(mfs2) == len(mfs1) + 1
    assert mfs1[0] in mfs2  # first member carried verbatim, zero rewrite

    # and the parquet dialect still drives the engine scan in dual mode
    assert not s2.manifest_path.endswith(".avro")
    assert t.scan().count() == 10


def test_expire_cleans_both_manifest_dialects(spark, catalog):
    """Snapshot expiry reclaims avro lists+members of dropped snapshots while
    keeping every manifest (both dialects) of retained ones."""
    from go_iceberg_spark.table.maintenance import expire_snapshots

    df = spark.createDataFrame([Row(a=i) for i in range(5)])
    t = catalog.create_table("db", "expboth", from_spark_schema(df.schema))
    t.append(df)
    doomed_avro = t.current_snapshot().avro_manifest_path
    t.delete(gi.lt("a", 2))  # rewrites: old avro members become snapshot-1-only
    t.append(spark.createDataFrame([Row(a=50)]))
    kept_avro = t.current_snapshot().avro_manifest_path

    expire_snapshots(t, retain_last=1)
    assert not os.path.exists(os.path.join(t.location, doomed_avro))
    assert os.path.exists(os.path.join(t.location, kept_avro))
    from go_iceberg_spark.table.manifest_avro import member_manifest_paths

    for rel in member_manifest_paths(t.location, kept_avro):
        assert os.path.exists(os.path.join(t.location, rel))
    # the surviving avro tree still reconstructs the table externally
    _, _, _, entries = external_table_state(spark, t.location)
    assert sum(
        e["data_file"]["record_count"] for e in entries if e["data_file"]["content"] == 0
    ) == t.scan().count() == 4


def test_external_typed_partition_tuples_and_pruning(spark, catalog):
    """r4 (VERDICT task #2): partition tuples ride the Avro wire as the
    spec's TYPED partition struct — identity keeps the source type, day is
    an int date ordinal, month/bucket are ints — and an external reader can
    PRUNE by tuple alone, landing on the same file set as the engine scan.
    Both dialects must agree: the typed tuple converts back to exactly the
    engine's path-derived string encoding (parquet-dialect partition dict)."""
    import datetime as dt

    from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec
    from go_iceberg_spark.table.write import bucket_for_literal

    rows = [
        Row(ok=i, seg=f"s{i % 3}", d=dt.date(2021, 1, 1) + dt.timedelta(days=31 * (i % 3)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    schema = from_spark_schema(df.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (
        PartitionField(fid["seg"], 1000, "identity", "seg"),
        PartitionField(fid["d"], 1001, "day", "d_day"),
        PartitionField(fid["ok"], 1002, "bucket[4]", "ok_bucket"),
        PartitionField(fid["d"], 1003, "month", "d_month"),
    ))
    t = catalog.create_table("db", "extpart", schema, spec=spec)
    t.append(df)
    t.append(spark.createDataFrame(
        [Row(ok=100 + i, seg="s9", d=dt.date(2022, 6, 1)) for i in range(10)]
    ))

    md, _snap, mfs, entries = external_table_state(spark, t.location)
    data_entries = [e for e in entries if e["data_file"]["content"] == 0]
    assert data_entries

    # -- the wire schema itself is typed (spec-only check on writer schema) --
    mschema, _, _ = _jocf(spark, os.path.join(t.location, mfs[0]["manifest_path"]))
    dfield = next(f for f in mschema["fields"] if f["name"] == "data_file")
    pfield = next(f for f in dfield["type"]["fields"] if f["name"] == "partition")
    ptypes = {f["name"]: f["type"] for f in pfield["type"]["fields"]}
    assert ptypes["seg"] == ["null", "string"]
    assert ptypes["ok_bucket"] == ["null", "int"]
    assert ptypes["d_month"] == ["null", "int"]
    day_t = ptypes["d_day"][1]
    assert day_t["type"] == "int" and day_t.get("logicalType") == "date"

    # -- tuples decode to typed values matching the engine dialect ---------
    epoch = dt.date(1970, 1, 1)
    by_path = {task.file.file_path: task.file for task in t.scan().plan_files()}
    for e in data_entries:
        p = e["data_file"]["partition"]
        eng = by_path[e["data_file"]["file_path"]].partition  # parquet dialect strings
        assert isinstance(p["d_day"], int)
        assert p["d_day"] == (dt.date.fromisoformat(eng["d_day"]) - epoch).days
        y, m = eng["d_month"].split("-")
        assert p["d_month"] == (int(y) - 1970) * 12 + int(m) - 1
        assert p["ok_bucket"] == int(eng["ok_bucket"])
        assert p["seg"] == eng["seg"]

    # -- prune by tuple alone: day + identity ------------------------------
    target = dt.date(2022, 6, 1)
    ext_files = {
        e["data_file"]["file_path"]
        for e in data_entries
        if e["data_file"]["partition"]["d_day"] == (target - epoch).days
    }
    eng_files = {
        task.file.file_path
        for task in t.scan().filter(gi.eq("d", target)).plan_files()
    }
    assert ext_files and ext_files == eng_files

    ext_seg = {
        e["data_file"]["file_path"]
        for e in data_entries
        if e["data_file"]["partition"]["seg"] == "s1"
    }
    eng_seg = {t2.file.file_path for t2 in t.scan().filter(gi.eq("seg", "s1")).plan_files()}
    assert ext_seg and ext_seg == eng_seg

    # -- bucket ordinal agrees with the engine's literal hash --------------
    b = bucket_for_literal(100, 4, schema.find_field_by_id(fid["ok"]).type)
    assert any(
        e["data_file"]["partition"]["ok_bucket"] == b
        and e["data_file"]["partition"]["seg"] == "s9"
        for e in data_entries
    )

    # -- manifest-list partition summaries carry typed spec bounds ---------
    summaries = mfs[0]["partitions"]
    assert summaries is not None and len(summaries) == 4
    lo = _raw(summaries[1]["lower_bound"])
    hi = _raw(summaries[1]["upper_bound"])
    assert struct.unpack("<i", lo)[0] <= struct.unpack("<i", hi)[0]  # d_day int date ordinals


def test_uuid_and_binary_bounds_on_avro_wire(spark, catalog):
    """r4 (VERDICT task #2, second half): uuid bounds serialize as the
    spec's 16-byte big-endian form and binary bounds as raw bytes — both
    decodable by a spec-only reader, both matching the engine's parquet-
    dialect stats."""
    import uuid as uuid_mod

    from go_iceberg_spark.schema import UUID, NestedField, Schema, StructType

    rows = [
        Row(u=str(uuid_mod.UUID(int=i)), b=bytes([i % 256, (i + 1) % 256]), v=i)
        for i in range(32)
    ]
    df = spark.createDataFrame(rows)
    base = from_spark_schema(df.schema)
    # retype u: string -> uuid (uuid surfaces as Spark StringType; the
    # Iceberg schema remembers the true type)
    fields = tuple(
        NestedField(f.field_id, f.name, UUID if f.name == "u" else f.type, f.required)
        for f in base.fields
    )
    schema = Schema(base.schema_id, StructType(fields))
    t = catalog.create_table("db", "extuuid", schema)
    t.append(df)

    md, _snap, _mfs, entries = external_table_state(spark, t.location)
    data = [e for e in entries if e["data_file"]["content"] == 0]
    assert data
    fid = {f.name: f.field_id for f in schema.fields}
    eng = {task.file.file_path: task.file for task in t.scan().plan_files()}
    saw_uuid = saw_binary = False
    for e in data:
        lowers = _kv(e["data_file"]["lower_bounds"])
        uppers = _kv(e["data_file"]["upper_bounds"])
        stats = eng[e["data_file"]["file_path"]].column_stats
        if fid["u"] in lowers:
            saw_uuid = True
            lo = _raw(lowers[fid["u"]])
            hi = _raw(uppers[fid["u"]])
            assert len(lo) == 16 and len(hi) == 16  # spec: 16-byte big-endian
            assert str(uuid_mod.UUID(bytes=lo)) == stats[fid["u"]]["min"]
            assert str(uuid_mod.UUID(bytes=hi)) == stats[fid["u"]]["max"]
        if fid["b"] in lowers:
            saw_binary = True
            # engine stat space stores hex; wire carries the raw bytes
            assert _raw(lowers[fid["b"]]).hex() == stats[fid["b"]]["min"]
            assert _raw(uppers[fid["b"]]).hex() == stats[fid["b"]]["max"]
    assert saw_uuid and saw_binary, "uuid/binary bounds missing from the Avro wire"


@pytest.mark.soak
def test_avro_compaction_preserves_spec_generations(spark, catalog):
    """r4 regression: compacting the avro tree must NOT relabel old-spec
    entries under the default spec — the pre-fix behavior rewrote a
    partition-evolved table's old generation with null tuples under the NEW
    spec's fields, so an external reader pruning by tuple would wrongly
    drop those files. Members now group by (content, schema, spec) and each
    carries its own generation's spec id and partition struct."""
    from go_iceberg_spark.table.manifest_avro import AVRO_COMPACT_THRESHOLD

    df = spark.range(0, 50).selectExpr("id", "id % 5 AS grp")
    t = catalog.create_table(
        "db", "specgen", from_spark_schema(df.schema),
        properties={"manifest-format": "avro"},
    )
    t.append(df)                     # spec-0 (unpartitioned) generation
    t.update_partition_spec("grp")   # evolve
    for k in range(AVRO_COMPACT_THRESHOLD + 2):  # force full compaction
        t.append(spark.range(1000 + k, 1001 + k).selectExpr("id", "id % 5 AS grp"))

    ents = t.live_entries()
    old = [e for e in ents if e.spec_id == 0]
    assert old, "old generation lost its spec id through compaction"
    assert all(e.partition == {} for e in old), "old gen gained phantom partition keys"
    new = [e for e in ents if e.spec_id == 1]
    assert new and all("grp" in e.partition for e in new)

    # the wire view agrees: each member manifest declares its own spec id
    md, _snap, mfs, entries = external_table_state(spark, t.location)
    spec_ids = set()
    for mf in mfs:
        _, mmeta, _ = _jocf(spark, os.path.join(t.location, mf["manifest_path"]))
        spec_ids.add(int(mmeta["partition-spec-id"]))
        assert int(mf["partition_spec_id"]) == int(mmeta["partition-spec-id"])
    assert spec_ids == {0, 1}
    assert t.scan().count() == 50 + AVRO_COMPACT_THRESHOLD + 2



def _fixed(v):
    """Java Avro's JSON rendering of a fixed value: list of signed byte ints."""
    if isinstance(v, list):
        return bytes(b & 0xFF for b in v)
    return v.encode("latin-1")

@pytest.mark.parametrize(
    "props",
    [None, {"manifest-format": "avro"}],
    ids=["dual-default", "avro-only"],
)
def test_external_typed_decimal_timestamp_partition_tuples(spark, catalog, props):
    """r5 (VERDICT r4 task #3): decimal- and timestamp-identity partition
    values (plus truncate[decimal]) ride the Avro wire TYPED — fixed decimal
    logical type / timestamp-micros — an external reader prunes by tuple
    alone, and the typed value converts back to exactly the engine's
    path-derived string so both dialects stay bit-identical."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec

    sch = T.StructType([
        T.StructField("dec", T.DecimalType(6, 2)),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("v", T.IntegerType()),
    ])
    rows = [
        (Decimal(f"{10 + i % 3}.50"), dt.datetime(2024, 3, 1 + i % 2, 12, 34, 56), i)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, sch)
    schema = from_spark_schema(df.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (
        PartitionField(fid["dec"], 1000, "identity", "dec"),
        PartitionField(fid["ts"], 1001, "identity", "ts"),
        PartitionField(fid["dec"], 1002, "truncate[10]", "dec_trunc"),
    ))
    name = "extdects" + ("a" if props else "d")
    t = catalog.create_table("db", name, schema, spec=spec, properties=props)
    t.append(df)

    md, _snap, mfs, entries = external_table_state(spark, t.location)
    data_entries = [e for e in entries if e["data_file"]["content"] == 0]
    assert data_entries

    # -- writer schema is typed (spec-only check) --------------------------
    mschema, _, _ = _jocf(spark, os.path.join(t.location, mfs[0]["manifest_path"]))
    dfield = next(f for f in mschema["fields"] if f["name"] == "data_file")
    pfield = next(f for f in dfield["type"]["fields"] if f["name"] == "partition")
    ptypes = {f["name"]: f["type"][1] for f in pfield["type"]["fields"]}
    assert ptypes["dec"]["logicalType"] == "decimal"
    assert ptypes["dec"]["precision"] == 6 and ptypes["dec"]["scale"] == 2
    assert ptypes["dec"]["type"] == "fixed" and ptypes["dec"]["size"] == 3
    assert ptypes["ts"]["logicalType"] == "timestamp-micros"
    assert ptypes["ts"]["type"] == "long"
    assert ptypes["dec_trunc"]["logicalType"] == "decimal"

    # -- typed tuples decode to the engine's parquet-dialect strings -------
    epoch = dt.datetime(1970, 1, 1)
    by_path = {task.file.file_path: task.file for task in t.scan().plan_files()}
    for e in data_entries:
        p = e["data_file"]["partition"]
        eng = by_path[e["data_file"]["file_path"]].partition
        unscaled = int.from_bytes(_fixed(p["dec"]), "big", signed=True)
        assert unscaled == int(Decimal(eng["dec"]).scaleb(2))
        assert isinstance(p["ts"], int)
        assert p["ts"] == (dt.datetime.fromisoformat(eng["ts"]) - epoch) // dt.timedelta(
            microseconds=1)
        tr_unscaled = int.from_bytes(_fixed(p["dec_trunc"]), "big", signed=True)
        assert tr_unscaled == int(Decimal(eng["dec_trunc"]).scaleb(2))

    # -- external reader prunes by typed tuple alone -----------------------
    target = dt.datetime(2024, 3, 2, 12, 34, 56)
    target_us = (target - epoch) // dt.timedelta(microseconds=1)
    ext_files = {
        e["data_file"]["file_path"]
        for e in data_entries
        if e["data_file"]["partition"]["ts"] == target_us
    }
    eng_files = {
        task.file.file_path for task in t.scan().filter(gi.eq("ts", target)).plan_files()
    }
    assert ext_files and ext_files == eng_files

    ext_dec = {
        e["data_file"]["file_path"]
        for e in data_entries
        if int.from_bytes(_fixed(e["data_file"]["partition"]["dec"]),
                          "big", signed=True) == 1150
    }
    eng_dec = {
        task.file.file_path for task in t.scan().plan_files()
        if task.file.partition["dec"] == "11.50"
    }
    assert ext_dec and ext_dec == eng_dec

    # -- the engine's own read of the wire agrees (string round-trip) ------
    assert t.scan().filter(gi.eq("ts", target)).count() == 20
    assert {e.partition["dec"] for e in t.live_entries()} == {"10.50", "11.50", "12.50"}
    # spec decimal truncate (r6): W=10 at scale 2 steps by 0.10, so every
    # x.50 value is already on a boundary and truncates to itself
    assert ({e.partition["dec_trunc"] for e in t.live_entries()}
            == {"10.50", "11.50", "12.50"})


def test_legacy_string_partition_members_read_correctly(spark, catalog, monkeypatch):
    """r5 regression (r4 ADVICE): members written BEFORE a transform gained a
    typed form encode partition values as [null, string]; the reader must
    key off the OCF writer schema and pass those through — converting the
    legacy string "2024" through the typed year path yields "3994" (and
    month/day strings raise)."""
    import datetime as dt

    import go_iceberg_spark.table.manifest_avro as ma
    from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec

    df = spark.createDataFrame(
        [Row(d=dt.date(2024, 1, 1 + i % 5), v=i) for i in range(20)]
    )
    schema = from_spark_schema(df.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (
        PartitionField(fid["d"], 1000, "year", "d_year"),
        PartitionField(fid["d"], 1001, "month", "d_month"),
    ))
    t = catalog.create_table("db", "legacystr", schema, spec=spec,
                             properties={"manifest-format": "avro"})
    with monkeypatch.context() as m:
        m.setattr(ma, "_typed_partition_type", lambda pf, schema: None)
        t.append(df)

    # the on-disk member really is legacy: writer schema says [null, string]
    mschema, _, _ = _jocf(
        spark, os.path.join(t.location, t.current_snapshot().manifest_path))
    t._manifest_cache.clear()
    ents = t.live_entries()
    assert ents and all(e.partition["d_year"] == "2024" for e in ents)
    assert all(e.partition["d_month"] == "2024-01" for e in ents)

    # a partial member rewrite READS the legacy member and re-encodes typed
    t.delete(gi.eq("v", 0))
    t._manifest_cache.clear()
    ents = t.live_entries()
    assert ents and all(e.partition["d_year"] == "2024" for e in ents)
    assert all(e.partition["d_month"] == "2024-01" for e in ents)
    assert t.scan().count() == 19
    # and year-pruning still works across the mixed legacy/typed tree
    assert t.scan().filter(gi.eq("d", dt.date(2024, 1, 3))).count() == 4


def test_sequence_number_inheritance_from_manifest_list(spark, catalog):
    """r5 (VERDICT r4 task #5 fallback): the spec's sequence-number
    INHERITANCE — ADDED entries may carry null sequence_number on the wire
    and inherit the manifest's (what Java Iceberg writers emit for fresh
    entries). The engine always stamps explicit numbers, so this test
    REWRITES the avro members of a MoR-exercised table with nulled ADDED
    seqs and asserts both the engine reader and the spec-only external
    reader still replay the MoR merge correctly (sequence rules decide
    which deletes apply to which data files — inheritance gone wrong
    flips rows in or out)."""
    from go_iceberg_spark.avro import read_ocf, write_ocf

    t = _crud_table(spark, catalog, {"manifest-format": "avro"})
    want = t.scan().count()
    assert want == 79
    entries_before = {(e.file_path, e.sequence_number) for e in t.live_entries()}

    # null out sequence_number on every ADDED entry, member by member
    list_rel = t.current_snapshot().manifest_path
    _, _, mfs = read_ocf(os.path.join(t.location, list_rel))
    nulled = 0
    for mf in mfs:
        p = os.path.join(t.location, mf["manifest_path"])
        schema, meta, recs = read_ocf(p)
        changed = False
        for r in recs:
            if r["status"] == 1 and r.get("sequence_number") is not None:
                assert r["sequence_number"] == mf["sequence_number"], (
                    "fixture assumption: ADDED entries carry the member's seq")
                r["sequence_number"] = None
                r["file_sequence_number"] = None
                changed = True
                nulled += 1
        if changed:
            write_ocf(p, schema, recs,
                      metadata={k: v for k, v in meta.items()
                                if not k.startswith("avro.")})
    assert nulled > 0, "fixture produced no ADDED entries to null"

    # engine reader: inherited seqs reproduce the exact entry set + MoR count
    t._manifest_cache.clear()
    assert {(e.file_path, e.sequence_number) for e in t.live_entries()} == entries_before
    assert t.scan().count() == want

    # spec-only external reader agrees (inheritance applied in
    # external_table_state) — full file-set and per-entry seq parity
    _, _, _, ext = external_table_state(spark, t.location)
    ext_pairs = {(e["data_file"]["file_path"], e["sequence_number"]) for e in ext}
    assert ext_pairs == entries_before


def test_external_typed_float_double_partition_tuples(spark, catalog):
    """r11 (VERDICT task #1, retires the r6 ADR): float/double identity
    partitions ride the Avro wire as typed float/double — made exact by
    canonicalizing the ENGINE's partition strings at path-derivation time
    (write.canonicalize_partition_values), so the Java dir rendering
    (``1.23456792E8``) never enters metadata. A spec-only reader decodes
    the numeric value with no engine code; tuple-only pruning matches the
    engine scan; the avro round-trip reproduces the canonical dict."""
    from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec

    # 123456792.0 is float32-exact and Java renders it "1.23456792E8";
    # 1e22 renders "1.0E22" in Java vs "1e+22" in repr — both exercise
    # the rendering gap the canonicalization closes. One NaN partition
    # exercises the special spellings.
    rows = []
    for i in range(12):
        f = [123456792.0, 0.25, float("nan")][i % 3]
        g = [1e22, 0.5][i % 2]
        rows.append(Row(ok=i, f=f, g=g))
    df = spark.createDataFrame(rows).selectExpr(
        "ok", "cast(f as float) f", "cast(g as double) g")
    schema = from_spark_schema(df.schema)
    fid = {f.name: f.field_id for f in schema.fields}
    spec = PartitionSpec(0, (
        PartitionField(fid["f"], 1000, "identity", "f"),
        PartitionField(fid["g"], 1001, "identity", "g"),
    ))
    t = catalog.create_table("db", "floatpart", schema, spec=spec,
                             properties={"manifest-format": "avro"})
    t.append(df)

    # engine dict is canonical (repr / special spellings), never Java text
    native = {e.partition["f"] for e in t.scan().plan_files() for e in [e.file]}
    assert native == {"123456792.0", "0.25", "NaN"}, native
    gvals = {e.file.partition["g"] for e in t.scan().plan_files()}
    assert gvals == {"1e+22", "0.5"}, gvals

    # wire schema is typed; values decode as plain JSON numbers
    md, _snap, mfs, entries = external_table_state(spark, t.location)
    mschema, _, recs = _jocf(
        spark, os.path.join(t.location, mfs[0]["manifest_path"]))
    dfield = next(f for f in mschema["fields"] if f["name"] == "data_file")
    pfield = next(f for f in dfield["type"]["fields"] if f["name"] == "partition")
    ptypes = {f["name"]: f["type"] for f in pfield["type"]["fields"]}
    assert ptypes["f"] == ["null", "float"]
    assert ptypes["g"] == ["null", "double"]
    data_entries = [e for e in entries if e["data_file"]["content"] == 0]
    ext_f = {e["data_file"]["partition"]["f"] for e in data_entries}
    finite_f = {v for v in ext_f if isinstance(v, float) and v == v}
    assert finite_f == {123456792.0, 0.25}
    # the NaN partition: Java's JSON rendering of a float NaN is the quoted
    # token "NaN" (the BINARY wire value is a true Avro float NaN — the
    # engine round-trip below proves that); accept either spelling here
    assert any(v == "NaN" or (isinstance(v, float) and v != v) for v in ext_f)
    assert {e["data_file"]["partition"]["g"] for e in data_entries} == {1e22, 0.5}

    # avro read path reproduces the canonical engine dict bit-for-bit
    t._manifest_cache.clear()
    ents = t.live_entries()
    assert {e.partition["f"] for e in ents} == {"123456792.0", "0.25", "NaN"}
    assert {e.partition["g"] for e in ents} == {"1e+22", "0.5"}

    # tuple-only pruning agrees with the engine scan (float + double).
    # The engine keeps NaN-bound files under eq() (stats-based pruning is
    # conservative: NaN bounds are unprunable; Catalyst filters the rows),
    # so tuple pruning may be strictly TIGHTER — assert the engine set is
    # the tuple set plus only NaN-partition files.
    ext_sel = {e["data_file"]["file_path"] for e in data_entries
               if e["data_file"]["partition"]["f"] == 0.25}
    eng_sel = {task.file.file_path
               for task in t.scan().filter(gi.eq("f", 0.25)).plan_files()}
    assert ext_sel and ext_sel <= eng_sel
    assert all("_p_f=NaN" in p for p in eng_sel - ext_sel)
    assert t.scan().filter(gi.eq("g", 0.5)).count() == 6
    assert t.scan().filter(gi.eq("f", 0.25)).to_df().count() == 4


def test_binary_fixed_partition_tuples_roundtrip(spark, tmp_path):
    """r11 (VERDICT task #1, second half): binary/fixed partition values —
    which only arise via constructed specs, Spark cannot partitionBy
    binary — serialize as typed bytes/fixed on the Avro wire (engine dict
    convention: hex, the stat space), decode externally without engine
    code, and round-trip exactly."""
    import go_iceberg_spark.table.manifest_avro as ma
    from go_iceberg_spark.schema import (
        BINARY, FixedType, NestedField, PrimitiveType, Schema, StructType,
    )
    from go_iceberg_spark.table.metadata import (
        DataFileEntry, PartitionField, PartitionSpec,
    )

    schema = Schema(0, StructType((
        NestedField(1, "id", PrimitiveType("long")),
        NestedField(2, "b", BINARY),
        NestedField(3, "fx", FixedType(4)),
    )))
    spec = PartitionSpec(0, (
        PartitionField(2, 1000, "identity", "b"),
        PartitionField(3, 1001, "identity", "fx"),
    ))
    entry = DataFileEntry(
        content=0, file_path="data/f1.parquet", file_format="parquet",
        spec_id=0, schema_id=0, record_count=10, file_size=1000,
        partition={"b": "0a0bff", "fx": "00112233"},
        column_stats={}, sequence_number=1, equality_ids=(),
    )
    loc = str(tmp_path / "tbl")
    os.makedirs(os.path.join(loc, "metadata"))
    rel = ma.write_avro_manifests(
        loc, "metadata", [entry], snapshot_id=7, sequence_number=1,
        spec=spec, schemas_by_id={0: schema})

    # spec-only: writer schema declares bytes / fixed(4); values decode
    # to the raw bytes with latin-1 recovery, no engine serde
    lst_schema, _, lst = _jocf(spark, os.path.join(loc, rel))
    mschema, _, recs = _jocf(spark, os.path.join(loc, lst[0]["manifest_path"]))
    dfield = next(f for f in mschema["fields"] if f["name"] == "data_file")
    pfield = next(f for f in dfield["type"]["fields"] if f["name"] == "partition")
    ptypes = {f["name"]: f["type"] for f in pfield["type"]["fields"]}
    assert ptypes["b"] == ["null", "bytes"]
    assert ptypes["fx"][1]["type"] == "fixed" and ptypes["fx"][1]["size"] == 4
    p = recs[0]["data_file"]["partition"]
    assert _raw(p["b"]) == bytes.fromhex("0a0bff")
    # Java's JSON rendering of an Avro fixed is an int array
    assert bytes(p["fx"]) == bytes.fromhex("00112233")

    # engine read path round-trips the hex dict exactly
    back = ma.read_avro_manifest_tree(loc, rel)
    assert len(back) == 1
    assert back[0].partition == {"b": "0a0bff", "fx": "00112233"}
