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
        # r12 (VERDICT r11 task #8): maxFilesPerTrigger-style backpressure.
        # Offsets carry (snapshot_id, file_cursor): cursor K means "the
        # first K ADDED files of that snapshot are delivered", None means
        # the snapshot is complete — so one compaction-sized snapshot
        # splits across triggers instead of becoming one giant batch.
        mft = options.get("max-files-per-trigger")
        self.max_files = int(mft) if mft is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValidationError("max-files-per-trigger must be >= 1")
        # last frontier this reader planned or committed; None until the
        # first initialOffset/latestOffset/partitions call observes one
        # (see latestOffset for the fresh-vs-restart derivation).
        self._progress: dict | None = None
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
        self._progress = {"snapshot_id": self.start_snapshot_id, "file_cursor": None}
        return dict(self._progress)

    def latestOffset(self) -> dict:
        # Without a cap: no per-batch limit on purpose — under the
        # availableNow trigger Spark captures this offset ONCE and drains
        # exactly to it, so a rate-limited latestOffset would silently
        # truncate the drain instead of splitting it into batches. WITH
        # max-files-per-trigger the split IS the point: each trigger
        # advances the frontier by at most that many files (run repeated
        # triggers — processingTime or successive availableNow runs — to
        # drain a backlog).
        md, _ = load_metadata(self.location)
        cur = md.current_snapshot()
        if cur is None:
            return {"snapshot_id": self.start_snapshot_id, "file_cursor": None}
        full = {"snapshot_id": cur.snapshot_id, "file_cursor": None}
        if self.max_files is None:
            self._progress = full
            return dict(full)
        # frontier: on a fresh query the first latestOffset precedes
        # initialOffset (probed empirically), so fall back to the stream's
        # configured start; on a checkpoint RESTART Spark replays
        # partitions(start, end) of the last batch before asking for a new
        # offset, and partitions() records that end here — the fallback is
        # never a stale start-of-stream on restart.
        base = self._progress or {"snapshot_id": self.start_snapshot_id,
                                  "file_cursor": None}
        base_id = base.get("snapshot_id")
        base_cur = base.get("file_cursor")
        by_id = {s.snapshot_id: s for s in md.snapshots}
        memo: dict[int, set[str]] = {}
        budget = self.max_files
        last_complete = {"snapshot_id": base_id, "file_cursor": None}
        if base_cur is not None:
            base_snap = by_id.get(base_id)
            if base_snap is None:
                raise ValidationError(
                    f"stream offset snapshot {base_id} has been expired from "
                    "the table's history; restart the stream with a fresh "
                    "checkpoint")
            added = self._added_entries(md, by_id, base_snap, memo)
            remaining = len(added) - base_cur
            if remaining > budget:
                end = {"snapshot_id": base_id, "file_cursor": base_cur + budget}
                self._progress = end
                return dict(end)
            budget -= remaining
        for snap in _lineage(md, base_id, cur.snapshot_id):
            added = self._added_entries(md, by_id, snap, memo)
            if len(added) > budget:
                end = ({"snapshot_id": snap.snapshot_id, "file_cursor": budget}
                       if budget > 0 else last_complete)
                self._progress = end
                return dict(end)
            budget -= len(added)
            last_complete = {"snapshot_id": snap.snapshot_id, "file_cursor": None}
        self._progress = full
        return dict(full)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        self._progress = {"snapshot_id": end.get("snapshot_id"),
                          "file_cursor": end.get("file_cursor")}

    # -- planning ---------------------------------------------------------
    def _added_entries(self, md: TableMetadata, by_id: dict[int, Snapshot],
                       snap: Snapshot, memo: dict[int, set[str]]) -> list[DataFileEntry]:
        """The ordered data-file entries snapshot ``snap`` ADDS over its
        parent (manifest order — the deterministic order file_cursor
        offsets index into). Non-row-bearing replaces and (under the skip
        option) non-append snapshots contribute []."""
        if (snap.operation == OP_REPLACE
                and snap.summary.get("rows-preserved") == "true"):
            # compaction / manifest rewrite mid-stream: file-level
            # reorganization, no new rows — skip instead of killing the
            # stream (UPDATE's replace lacks the marker and still
            # raises; see incremental.py for the full rationale)
            return []
        if snap.operation != OP_APPEND:
            if self.skip_non_append:
                return []
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
        if parent is not None and parent.snapshot_id not in memo:
            memo[parent.snapshot_id] = {
                e.file_path for e in _manifest_entries(self.location, parent)}
        before = memo[parent.snapshot_id] if parent is not None else set()
        return [e for e in _manifest_entries(self.location, snap)
                if e.content == CONTENT_DATA and e.file_path not in before]

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        md, _ = load_metadata(self.location)
        s_id, s_cur = start.get("snapshot_id"), start.get("file_cursor")
        e_id, e_cur = end.get("snapshot_id"), end.get("file_cursor")
        cur_schema = self._pinned_schema
        target = self._pinned_target
        by_id = {s.snapshot_id: s for s in md.snapshots}
        memo: dict[int, set[str]] = {}
        parts: list[InputPartition] = []

        def emit(entries: list[DataFileEntry]) -> None:
            for e in entries:
                file_schema = _schema_by_id(md, e.schema_id) or cur_schema
                src_cols: list[str | None] = []
                for f in cur_schema.fields:
                    old = file_schema.find_field_by_id(f.field_id)
                    src_cols.append(old.name if old is not None else None)
                parts.append(_FilePartition(
                    os.path.join(self.location, e.file_path), src_cols, target))

        if s_cur is not None:
            # the start snapshot was split by the cap: deliver its tail
            s_snap = by_id.get(s_id)
            if s_snap is None:
                raise ValidationError(
                    f"stream offset snapshot {s_id} has been expired from the "
                    "table's history; cannot compute an incremental diff — "
                    "restart the stream with a fresh checkpoint")
            added = self._added_entries(md, by_id, s_snap, memo)
            hi = e_cur if (e_id == s_id and e_cur is not None) else len(added)
            emit(added[s_cur:hi])
        for snap in _lineage(md, s_id, e_id):
            added = self._added_entries(md, by_id, snap, memo)
            if snap.snapshot_id == e_id and e_cur is not None:
                added = added[:e_cur]
            emit(added)
        # remember the frontier so a capped latestOffset resumes from here
        # (covers WAL replay right after a restart, when commit() has not
        # run yet in this reader instance)
        self._progress = {"snapshot_id": e_id, "file_cursor": e_cur}
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
