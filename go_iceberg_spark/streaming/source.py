"""Snapshot-aware Structured Streaming SOURCE for engine tables, built on
Spark 4's Python Data Source API.

The file-glob source in ``stream.py`` discovers parquet files as they land
in the data directory — including files from uncommitted or aborted writes.
This source replays the COMMITTED snapshot lineage instead: offsets are
snapshot ids recorded in the streaming checkpoint, each micro-batch is
exactly the set of data files added by the snapshots in (start, end], and a
file written but never committed is never read. That is the contract
Iceberg's Spark streaming read provides, expressed through
``spark.readStream.format("table_snapshots")``.

Distribution: planning (offset resolution + manifest diff) is driver-side
metadata work, bounded by file counts; each added data file becomes one
``InputPartition`` read on an executor with pyarrow, yielding Arrow record
batches — rows never pass through the driver. Schema evolution mid-stream
is handled the same way as the batch scan: files are aligned to the
current schema by field id (renames follow ids, missing columns are null,
widened types cast).

Non-append snapshots (overwrite/delete/replace) cannot be represented in an
append-only stream; the source raises by default, or skips them with
``.option("skip-non-append", "true")`` — matching Iceberg's
``streaming-skip-delete-snapshots`` / ``streaming-skip-overwrite-snapshots``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import pyarrow as pa

from ..errors import ValidationError
from ..schema import Schema, to_spark_type
from ..table.metadata import (
    CONTENT_DATA,
    OP_APPEND,
    OP_REPLACE,
    DataFileEntry,
    Snapshot,
    TableMetadata,
    load_metadata,
)

try:  # pragma: no cover - exercised through Spark
    from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
except ImportError:  # pragma: no cover - pyspark < 4 fallback for import-time safety
    DataSource = object
    DataSourceStreamReader = object
    InputPartition = object

FORMAT_NAME = "table_snapshots"


def _manifest_entries(location: str, snap: Snapshot) -> list[DataFileEntry]:
    from ..table.metadata import read_manifest_tree

    return read_manifest_tree(location, snap.manifest_path)


def _lineage(md: TableMetadata, from_id: int | None, to_id: int | None) -> list[Snapshot]:
    """(from, to] snapshot chain, oldest first (mirrors
    incremental.snapshots_between, but Spark-free for the data-source
    planner)."""
    if to_id is None:
        cur = md.current_snapshot()
        if cur is None:
            return []
        to_id = cur.snapshot_id
    by_id = {s.snapshot_id: s for s in md.snapshots}
    if from_id is not None and from_id not in by_id:
        # the checkpoint's offset snapshot was EXPIRED: its manifest (the
        # only record of what the stream already delivered) is gone, so an
        # incremental resume cannot be reconstructed — say that, instead of
        # the misleading "not an ancestor" a failed ancestry walk produces
        # (r6 probe). Protect streams by retaining at least the checkpoint
        # horizon (retain_last / a branch ref on the offset snapshot).
        raise ValidationError(
            f"stream offset snapshot {from_id} has been expired from the "
            "table's history; cannot compute an incremental diff — restart "
            "the stream with a fresh checkpoint, and size expire_snapshots "
            "retention to cover the streaming checkpoint horizon")
    chain: list[Snapshot] = []
    cursor: int | None = to_id
    while cursor is not None and cursor != from_id:
        snap = by_id.get(cursor)
        if snap is None:
            raise ValidationError(f"snapshot {cursor} in stream range is no longer retained")
        chain.append(snap)
        cursor = snap.parent_snapshot_id
    if from_id is not None and cursor != from_id:
        raise ValidationError(f"start snapshot {from_id} is not an ancestor of {to_id}")
    chain.reverse()
    return chain


def _pa_type(spark_type) -> pa.DataType:
    """Arrow type for a Spark type via an empty-schema conversion (keeps the
    one authoritative spec→Spark mapping in schema.py)."""
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(spark_type)


class _FilePartition(InputPartition):
    """One committed data file: absolute path + (src column or None) per
    target field + picklable Arrow target schema."""

    def __init__(self, path: str, src_cols: list[str | None], target: pa.Schema):
        self.path = path
        self.src_cols = src_cols
        self.target = target


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.location = options.get("location") or options.get("path")
        if not self.location:
            raise ValidationError(f"{FORMAT_NAME} requires .option('location', <table dir>)")
        self.skip_non_append = str(options.get("skip-non-append", "false")).lower() == "true"
        start = options.get("start-snapshot-id")
        self.start_snapshot_id = int(start) if start is not None else None
        # Pin the stream's schema ONCE at reader construction: Spark fixed the
        # declared schema via DataSource.schema() at start, so every batch for
        # the stream's lifetime must align to it. Re-resolving current_schema
        # per micro-batch would let a mid-stream schema evolution make batches
        # disagree with the declared schema until query restart.
        md, _ = load_metadata(self.location)
        self._pinned_schema: Schema = md.current_schema
        self._pinned_target: pa.Schema = pa.schema([
            pa.field(f.name, _pa_type(to_spark_type(f.type)), nullable=True)
            for f in self._pinned_schema.fields
        ])

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_snapshot_id}

    def latestOffset(self) -> dict:
        # NOTE: no per-batch snapshot cap here on purpose: under the
        # availableNow trigger Spark captures this offset ONCE and drains
        # exactly to it, so a rate-limited latestOffset would silently
        # truncate the drain instead of splitting it into batches.
        md, _ = load_metadata(self.location)
        cur = md.current_snapshot()
        if cur is None:
            return {"snapshot_id": self.start_snapshot_id}
        return {"snapshot_id": cur.snapshot_id}

    def commit(self, end: dict) -> None:  # checkpoint-managed; nothing to clean
        pass

    # -- planning ---------------------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        md, _ = load_metadata(self.location)
        chain = _lineage(md, start.get("snapshot_id"), end.get("snapshot_id"))
        cur_schema = self._pinned_schema
        target = self._pinned_target

        prev_paths: dict[int, set[str]] = {}

        def live_paths(snap: Snapshot | None) -> set[str]:
            if snap is None:
                return set()
            if snap.snapshot_id not in prev_paths:
                prev_paths[snap.snapshot_id] = {
                    e.file_path for e in _manifest_entries(self.location, snap)}
            return prev_paths[snap.snapshot_id]

        by_id = {s.snapshot_id: s for s in md.snapshots}
        parts: list[InputPartition] = []
        for snap in chain:
            if (snap.operation == OP_REPLACE
                    and snap.summary.get("rows-preserved") == "true"):
                # compaction / manifest rewrite mid-stream: file-level
                # reorganization, no new rows — skip instead of killing the
                # stream (UPDATE's replace lacks the marker and still
                # raises; see incremental.py for the full rationale)
                continue
            if snap.operation != OP_APPEND:
                if self.skip_non_append:
                    continue
                raise ValidationError(
                    f"snapshot {snap.snapshot_id} is {snap.operation!r}; an append-only "
                    "stream cannot represent it — set .option('skip-non-append', 'true') "
                    "to skip, or consume table.changes() for row-level CDC")
            if snap.parent_snapshot_id is not None:
                parent = by_id.get(snap.parent_snapshot_id)
                if parent is None:
                    # An expired parent means we cannot diff this snapshot
                    # against its predecessor; treating it as table-start would
                    # replay the snapshot's FULL cumulative live set as "added"
                    # files, breaking the committed-only/exactly-once contract.
                    # Mirror incremental._entry_diff / snapshot_by_id.
                    raise ValidationError(
                        f"parent snapshot {snap.parent_snapshot_id} of "
                        f"{snap.snapshot_id} is no longer retained; cannot compute "
                        "an incremental diff — restart the stream from a retained "
                        "snapshot (start-snapshot-id) or from latest")
            else:
                parent = None
            before = live_paths(parent)
            for e in _manifest_entries(self.location, snap):
                if e.content != CONTENT_DATA or e.file_path in before:
                    continue
                file_schema = _schema_by_id(md, e.schema_id) or cur_schema
                src_cols: list[str | None] = []
                for f in cur_schema.fields:
                    old = file_schema.find_field_by_id(f.field_id)
                    src_cols.append(old.name if old is not None else None)
                parts.append(_FilePartition(
                    os.path.join(self.location, e.file_path), src_cols, target))
        return parts

    # -- execution (runs on executors) ------------------------------------
    def read(self, partition: _FilePartition) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        src_needed = [c for c in partition.src_cols if c is not None]
        t = pq.read_table(partition.path, columns=src_needed)
        n = t.num_rows
        arrays = []
        for src, field in zip(partition.src_cols, partition.target):
            if src is None:
                arrays.append(pa.nulls(n, type=field.type))
            else:
                col = t.column(src)
                arrays.append(col.cast(field.type) if col.type != field.type else col)
        out = pa.Table.from_arrays(arrays, schema=partition.target)
        yield from out.to_batches()


def _schema_by_id(md: TableMetadata, sid: int) -> Schema | None:
    for s in md.schemas:
        if s.schema_id == sid:
            return s
    return None


class SnapshotStreamDataSource(DataSource):
    """``spark.readStream.format("table_snapshots").option("location", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        md, _ = load_metadata(self.options["location"])
        return to_spark_type(md.current_schema.struct)

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(dict(self.options))


_REGISTERED: set[int] = set()


def read_snapshot_stream(spark, table, **options):
    """Register the source (once per session) and open a snapshot-replay
    stream on ``table``. Options pass through (``start-snapshot-id``,
    ``skip-non-append``)."""
    if id(spark) not in _REGISTERED:
        spark.dataSource.register(SnapshotStreamDataSource)
        _REGISTERED.add(id(spark))
    reader = spark.readStream.format(FORMAT_NAME).option("location", table.location)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


__all__ = [
    "FORMAT_NAME",
    "SnapshotStreamDataSource",
    "SnapshotStreamReader",
    "read_snapshot_stream",
]
