"""Model-based mutation fuzz (r6, extended r7): a seeded random walk of table
operations runs against BOTH the engine table and a plain in-memory model;
after every step the scan must equal the model, and a randomly chosen RETAINED
snapshot must equal the model's recorded state at that snapshot (time-travel
consistency through every later mutation, compaction, and expiry).

This mechanizes the manual probe sweep that found the round 3-6 composition
bugs (changelog netting, per-file delete application, rewrite
over-suppression, ...): instead of hand-picking feature PAIRS, the walk
composes append / CoW+MoR delete / equality delete / update / upsert /
merge(+NOT MATCHED BY SOURCE) / rollback / compaction / expiry in random
order and checks full-table equality at every step.

r7 (VERDICT r6 task #2) adds the op families whose pairwise compositions
produced the r6 bug harvest but were missing from the walk vocabulary:
- ``spec_evolve``: partition-spec evolution mid-walk (identity / bucket /
  truncate / unpartition) — later writes lay out by the new spec while older
  files keep theirs, so every subsequent op scans mixed-spec file sets;
- ``wap``: branch + staged append + (usually) fast_forward publish — main
  must not move before publish, and abandoned audit branches must never
  leak rows into main or break expiry/rollback;
- ``add_files``: zero-copy import of an externally written parquet file
  (rejected with ValidationError while the table is partitioned — asserted);
- ``widen``: add a nullable int column, then widen it to long — old files
  stay readable via field-id alignment + type promotion, and pre-add
  snapshots must time-travel WITHOUT the column.

r8 (VERDICT r7 task #1) adds CONSUMER invariants: the walk previously checked
only the table's own scan + time-travel, but r7's critical bug (maintenance
REPLACE commits silently killing incremental scans and changelogs) lived in
the read paths LAYERED ON the snapshot lineage, which no walk step exercised.
After each step (probabilistically) and once at walk end, over a random
retained ancestor pair (i, j]:

- incremental_append_scan(i, j, ignore_non_append=True) must equal the
  multiset union of the batches recorded for the range's OP_APPEND
  snapshots — nothing from deletes/updates/upserts, nothing from
  rows-preserved maintenance replaces (checked on ranges whose parent
  pointers were not rewired by expiry, so attribution is exact);
- strict incremental_append_scan(i, j) must RAISE iff the range contains a
  snapshot that is neither an append nor a rows-preserved replace — a
  compaction/rewrite_manifests inside the range must NOT raise (and must
  contribute no rows), while an UPDATE's replace must;
- changelog_scan(i, j) must NET to the model state diff:
  state(i) + inserts − deletes == state(j) as multisets — valid across
  expiry-rewired gaps because netting is end-state-based;
- exactly-once stream sink: ``stream_commit`` applies a micro-batch via
  append_batch_exactly_once (True), an immediate replay of the same
  (ckpt, batch) dedupes (False); ``stream_replay`` re-delivers a random
  APPLIED batch and must dedupe even after marker-snapshot expiry (the
  high-water property); a rollback that UNDOES committed batches must let
  them replay (True, ascending order — the restart-from-savepoint path),
  unless the walk abandons them.
"""

from __future__ import annotations

import copy
import glob
import math
import os
import random
import tempfile
from collections import Counter

import pytest

import go_iceberg_spark as gi
from go_iceberg_spark.errors import ValidationError
from go_iceberg_spark.schema import INT, LONG, from_spark_schema
from go_iceberg_spark.streaming.stream import (
    BATCH_MARKER_KEY,
    HIGH_WATER_PROP,
    HIGH_WATER_SEQ_PROP,
    _batch_already_committed,
    agg_view_commit_batch,
    append_batch_exactly_once,
)
from go_iceberg_spark.table.incremental import CHANGE_TYPE_COL
from go_iceberg_spark.table.metadata import OP_APPEND, OP_REPLACE
from go_iceberg_spark.table.mutate import merge
from go_iceberg_spark.table.transaction import delete_equality

COLS = ("k", "v", "x")  # base columns; the widen op appends "w"


def _norm(x):
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return "NaN"  # distinct from None: a NaN<->NULL confusion must fail
    if isinstance(x, float):
        return round(x, 9)
    return x


def _engine_rows(t, names, cols):
    return sorted(tuple(_norm(r[names[c]]) for c in cols) for r in t.to_df().collect())


def _model_rows(rows, cols):
    return sorted(tuple(_norm(r.get(c)) for c in cols) for r in rows)


def _batch(spark, rng, ks, names=None, cols=COLS, wtype="int"):
    names = names or dict(zip(COLS, COLS))
    with_w = "w" in cols
    rows = []
    for k in ks:
        u = rng.random()  # x mixes NaN AND NULL (r9: eq-delete edge keys)
        x = float("nan") if u < 0.1 else None if u < 0.18 else round(rng.uniform(-50, 50), 2)
        r = (k, f"v{rng.randint(0, 99)}", x)
        rows.append(r + (rng.randint(0, 9),) if with_w else r)
    ddl = f"{names['k']} bigint, {names['v']} string, {names['x']} double"
    if with_w:
        ddl += f", {names['w']} {wtype}"
    return (spark.createDataFrame(rows, ddl),
            [dict(zip(cols, r)) for r in rows])


def _walk(spark, catalog, seed: int, steps: int, partitioned: bool = False,
          properties: dict | None = None):
    rng = random.Random(seed)
    names = dict(zip(COLS, COLS))  # logical -> CURRENT physical column name
    cols = list(COLS)              # logical columns currently in the schema
    wtype = "int"                  # current physical type of "w" (post-add)
    df, model = _batch(spark, rng, range(1, 9))
    schema = from_spark_schema(df.schema)
    spec = None
    if partitioned:
        from go_iceberg_spark.table.metadata import PartitionField, PartitionSpec

        kid = next(f.field_id for f in schema.fields if f.name == "k")
        spec = PartitionSpec(0, (PartitionField(kid, 1000, "bucket[4]", "kb"),))
    t = catalog.create_table("db", f"fuzz{seed}{'p' if partitioned else ''}",
                             schema, **({"spec": spec} if spec else {}),
                             **({"properties": properties} if properties else {}))
    t.append(df)
    parted = partitioned  # tracks the CURRENT default spec (spec_evolve moves it)
    next_k = 100
    # exactly-once stream-sink state: applied = batch ids whose data is in
    # the CURRENT table state (snapshotted per history entry so rollback
    # restores it); batch_log = immutable (kind, rows) payloads for replays
    # — kind is "append" (append_stream path) or "upsert" (CDC MERGE sink)
    applied: set[int] = set()
    batch_log: dict[int, tuple[str, list[dict]]] = {}
    next_bid = 0

    def _upsert_once(df, bid):
        """The upsert_stream sink's per-batch commit path: marker + high
        water + per-retry pre_commit_check, MERGE semantics on key k."""
        from go_iceberg_spark.table.table import COMMIT_SEQ_PLACEHOLDER

        t.refresh()
        if _batch_already_committed(t, "fz", bid):
            return False
        t.upsert(df, [names["k"]],
                 summary_extra={BATCH_MARKER_KEY: f"fz:{bid}"},
                 properties_extra={HIGH_WATER_PROP + "fz": str(bid),
                                   HIGH_WATER_SEQ_PROP + "fz": COMMIT_SEQ_PLACEHOLDER},
                 pre_commit_check=lambda: not _batch_already_committed(t, "fz", bid))
        return True

    def _apply_upsert_to_model(rows):
        by_k = {r["k"]: r for r in rows}
        hit = set()
        for r in model:
            if r["k"] in by_k:
                r.update(copy.deepcopy(by_k[r["k"]]))
                hit.add(r["k"])
        model.extend(copy.deepcopy(r) for kk, r in by_k.items() if kk not in hit)

    # streaming AGG-VIEW sink state (r10, VERDICT r9 task #5): the view is a
    # SEPARATE engine table (created lazily) maintained by the sink's real
    # per-batch additive-MERGE path; exactly-once is LOAD-BEARING — one
    # silently double-applied replay double-counts the view. The model is a
    # dict k -> [n, sx] mirroring Spark semantics (sum skips NULL, NaN
    # absorbs, all-NULL partial coalesces to 0).
    agg_view = {"t": None, "model": {}, "log": {}, "next_bid": 0}

    def _agg_once(df, bid) -> bool:
        if agg_view["t"] is None:
            proto = spark.createDataFrame([], "k bigint, n bigint, sx double")
            agg_view["t"] = catalog.create_table(
                "db", f"fuzzv{seed}{'p' if partitioned else ''}",
                from_spark_schema(proto.schema))
        return agg_view_commit_batch(
            agg_view["t"], "fzagg", df, bid, ["k"],
            count_col="n", sum_cols={"sx": "x"})

    def _agg_df_of(rows):
        return spark.createDataFrame([(r["k"], r["x"]) for r in rows],
                                     "k bigint, x double")

    def _apply_agg_to_model(rows):
        by_k: dict = {}
        for r in rows:
            by_k.setdefault(r["k"], []).append(r["x"])
        for kk, xs in by_k.items():
            vals = [x for x in xs if x is not None]
            partial = sum(vals) if vals else 0.0  # coalesce-to-0 identity
            n, sx = agg_view["model"].get(kk, (0, 0.0))
            agg_view["model"][kk] = (n + len(xs), sx + partial)

    def _check_agg_view(step, op):
        if agg_view["t"] is None:
            return
        r6 = lambda v: "NaN" if isinstance(v, float) and math.isnan(v) \
            else round(v, 6)  # noqa: E731
        got = sorted((r["k"], r["n"], r6(r["sx"]))
                     for r in agg_view["t"].to_df().collect())
        want = sorted((kk, n, r6(sx))
                      for kk, (n, sx) in agg_view["model"].items())
        assert got == want, (seed, step, op, "agg view state", got[:5], want[:5])
    # snapshot-id -> record of (model state, column names, logical cols AT
    # SNAPSHOT CREATION, appended batch if the commit was an OP_APPEND,
    # original parent pointer, applied stream batches): a time-travel read
    # pins the snapshot's schema, so later renames/widenings/adds must NOT
    # retitle already-recorded snapshots; "appended"/"parent" feed the
    # incremental-scan consumer check; "applied" feeds the exactly-once one
    history: dict[int, dict] = {}

    def record(appended=None):
        # insert-once: a snapshot's state is immutable. A NO-OP commit (e.g.
        # compaction below min_input_files) leaves the current snapshot id
        # unchanged; re-recording it would retitle a pre-rename snapshot
        # with post-rename column names.
        snap = t.current_snapshot()
        if appended is not None:
            assert snap.operation == OP_APPEND, (snap.operation, "append rows "
                                                 "recorded for a non-append commit")
        if snap.snapshot_id not in history:
            history[snap.snapshot_id] = dict(
                state=copy.deepcopy(model), names=dict(names), cols=list(cols),
                appended=copy.deepcopy(appended),
                parent=snap.parent_snapshot_id, applied=set(applied))

    record(appended=model)

    def _tuples(rows, tcols):
        return sorted(tuple(_norm(r.get(c)) for c in tcols) for r in rows)

    def _df_of(rows):
        # rebuild a logged stream batch with the CURRENT physical column
        # names (a real replayed micro-batch comes from the live stream, so
        # it carries current names); a batch logged before the widen simply
        # lacks "w" and the writer NULL-fills it
        has_w = "w" in rows[0]
        data = [tuple(r[c] for c in COLS) + ((r["w"],) if has_w else ())
                for r in rows]
        ddl = f"{names['k']} bigint, {names['v']} string, {names['x']} double"
        if has_w:
            ddl += f", {names['w']} {wtype}"
        return spark.createDataFrame(data, ddl)

    def _mm_check(step, op):
        """r10: whenever metadata-only MIN/MAX claims exactness it must
        equal the model — across whatever CRUD/maintenance/evolution state
        the walk is in. None (refusal) is always legal; a non-None answer
        that disagrees with the model is a correctness bug. Exercises the
        int path in every walk and the string bounds_exact / float
        NaN-proof paths in the properties variant."""
        for c in cols:
            mm = t.scan().metadata_min_max(names[c])
            if mm is None:
                continue
            vals = [r.get(c) for r in model]
            vals = [v for v in vals
                    if v is not None and not (isinstance(v, float) and math.isnan(v))]
            want = (min(vals), max(vals)) if vals else (None, None)
            assert mm == want, (seed, step, op, "metadata min/max", c, mm, want)

    def consumer_checks(step, op):
        """Incremental + changelog + strict-mode invariants over a random
        retained ancestor range (i, j] — the read surfaces LAYERED on the
        lineage that the r7 rows-preserved bug silently broke."""
        _mm_check(step, op)
        by_id = {s.snapshot_id: s for s in t.snapshots()}
        pool = [sid for sid in history if sid in by_id]
        if not pool:
            return
        j = rng.choice(pool)
        chain = []  # j's retained ancestry, newest first
        cur = j
        while cur is not None and cur in by_id:
            chain.append(cur)
            cur = by_id[cur].parent_snapshot_id
        anc = chain[1:]
        i = rng.choice(anc + [None]) if anc else None
        if i is not None and i not in history:
            return
        rng_sids = []  # (i, j] oldest first
        for sid in chain:
            if sid == i:
                break
            rng_sids.append(sid)
        rng_sids.reverse()
        if not rng_sids:
            return
        cur_cols = list(cols)
        phys = [names[c] for c in cur_cols]

        # (b) changelog netting: state_i + inserts − deletes == state_j as
        # multisets. End-state-based, so it holds even across expiry-rewired
        # parent gaps (the r6 netting fix) and maintenance replaces (r7).
        bal = Counter(_tuples(history[i]["state"], cur_cols)) if i else Counter()
        for r in t.changes(i, j).collect():
            tup = tuple(_norm(r[p]) for p in phys)
            bal[tup] += 1 if r[CHANGE_TYPE_COL] == "insert" else -1
        got = {k: v for k, v in bal.items() if v != 0}
        want_c = Counter(_tuples(history[j]["state"], cur_cols))
        want = {k: v for k, v in want_c.items() if v != 0}
        diff = {k: (got.get(k, 0), want.get(k, 0))
                for k in set(got) | set(want) if got.get(k, 0) != want.get(k, 0)}
        assert got == want, (seed, step, op, "changelog netting", i, j,
                             "got!=want (got_count, want_count):", diff)

        # (c) aggregate-view IVM consumer (r9): a count/guarded-sum view
        # built at snapshot i and refreshed through the range's changelog
        # must equal the full recompute at j — over whatever CRUD mix,
        # WAP publish, maintenance, or eq-delete the range holds. The sum
        # source is NaN/NULL-guarded because algebraic sum maintenance is
        # documented as NaN-absorbing (incremental.py); counts are exact.
        if i is not None and rng.random() < 0.5:
            from pyspark.sql import functions as F

            from go_iceberg_spark.table.incremental import (
                incremental_agg_refresh_changelog,
            )
            kc, xc = names["k"], names["x"]

            def agg_at(sid):
                # time-travel reads PIN the snapshot's schema, so the view
                # aggregates under that snapshot's column names and renames
                # the key to the CURRENT name (the changelog's schema)
                nm = history[sid]["names"]
                xs = F.col(nm["x"])
                g = (F.when(xs.isNull() | F.isnan(xs), 0.0).otherwise(xs))
                return (t.scan().use_snapshot(sid).to_df()
                        .groupBy(nm["k"])
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.sum(g).alias("sx"))
                        .withColumnRenamed(nm["k"], kc))

            guarded = (F.when(F.col(xc).isNull() | F.isnan(F.col(xc)), 0.0)
                       .otherwise(F.col(xc)))
            g1 = incremental_agg_refresh_changelog(
                agg_at(i), t, [kc], from_snapshot_id=i, to_snapshot_id=j,
                count_col="n", sum_cols={"sx": guarded})
            r6 = lambda v: None if v is None else round(v, 6)  # noqa: E731
            got_g = sorted((r[kc], r["n"], r6(r["sx"])) for r in g1.collect())
            want_g = sorted((r[kc], r["n"], r6(r["sx"]))
                            for r in agg_at(j).collect())
            assert got_g == want_g, (seed, step, op, "aggregate IVM", i, j,
                                     got_g[:4], want_g[:4])

        # (a) incremental append scan: exact attribution needs an unrewired
        # range (expiry re-parents across gaps, folding expired snapshots'
        # file diffs into the first retained one above the gap)
        if not all(sid in history
                   and history[sid]["parent"] == by_id[sid].parent_snapshot_id
                   for sid in rng_sids):
            return
        expected = []
        for sid in rng_sids:
            if history[sid]["appended"] is not None:
                expected.extend(history[sid]["appended"])
        inc = t.incremental_scan(i, j, ignore_non_append=True).collect()
        got_inc = sorted(tuple(_norm(r[p]) for p in phys) for r in inc)
        assert got_inc == _tuples(expected, cur_cols), \
            (seed, step, op, "incremental appends", i, j)

        # strict mode: raises iff the range holds a snapshot that is neither
        # an append nor a rows-preserved maintenance replace — compaction /
        # rewrite_manifests in-range must NOT raise (r7's critical bug class)
        strict_bad = any(
            by_id[sid].operation != OP_APPEND
            and not (by_id[sid].operation == OP_REPLACE
                     and by_id[sid].summary.get("rows-preserved") == "true")
            for sid in rng_sids)
        if strict_bad:
            with pytest.raises(ValidationError):
                t.incremental_scan(i, j)
        else:
            strict = t.incremental_scan(i, j).collect()
            assert sorted(tuple(_norm(r[p]) for p in phys)
                          for r in strict) == got_inc, \
                (seed, step, op, "strict incremental", i, j)

    for step in range(steps):
        op = rng.choice(
            ["append", "delete_cow", "delete_mor", "eq_delete", "update",
             "upsert", "merge_nmbs", "rollback", "compact", "expire",
             "rename", "rename", "txn",
             "spec_evolve", "wap", "add_files", "widen",
             "rewrite_manifests", "stream_commit", "stream_replay",
             "stream_upsert", "stream_agg"])
        ks = [r["k"] for r in model]
        if op == "append":
            new_ks = [next_k + i for i in range(rng.randint(1, 4))]
            # ~1/3 of appends re-insert an existing key (duplicates are legal)
            if ks and rng.random() < 0.3:
                new_ks[0] = rng.choice(ks)
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names, cols, wtype)
            t.append(df)
            model.extend(rows)
            record(appended=rows)
        elif op in ("delete_cow", "delete_mor"):
            if ks and rng.random() < 0.5:
                pivot = rng.choice(ks)
                flt, pred = gi.eq(names["k"], pivot), (lambda r, p=pivot: r["k"] == p)
            else:
                cut = next_k - 15
                flt, pred = gi.gt(names["k"], cut), (lambda r, c=cut: r["k"] > c)
            t.delete(flt, mode="merge-on-read" if op == "delete_mor" else "copy-on-write")
            model[:] = [r for r in model if not pred(r)]
            record()
        elif op == "eq_delete":
            # r9 (VERDICT r8 task #2): the changelog's eq-delete bounds
            # pruning has three conservatism branches — NULL keys, float
            # keys (NaN hides from min/max), missing stats — that int-only
            # keys never exercised; an over-eager skip there is exactly the
            # silent-consumer class the changelog netting invariant catches.
            # The walk now deletes by bigint keys (± a NULL), by DOUBLE
            # keys (existing x values, so sometimes NaN or NULL), and by
            # composite (k, x) tuples; matching is null-safe AND
            # NaN-safe (Spark joins normalize NaN = NaN) on both sides.
            if not ks:
                continue

            def _nsafe(a, b):
                if a is None or b is None:
                    return a is None and b is None
                if (isinstance(a, float) and isinstance(b, float)
                        and math.isnan(a) and math.isnan(b)):
                    return True
                return a == b

            kind = rng.choice(["k", "k", "x", "kx"])
            if kind == "k":
                dks = list({rng.choice(ks) for _ in range(rng.randint(1, 3))})
                if rng.random() < 0.3:
                    dks.append(None)  # no NULL k rows exist: pure pruner probe
                delete_equality(t, spark.createDataFrame(
                    [(k,) for k in dks], f"{names['k']} bigint"), [names["k"]])
                model[:] = [r for r in model
                            if not any(_nsafe(r["k"], k) for k in dks)]
            elif kind == "x":
                xs = [r["x"] for r in model]
                dxs = [rng.choice(xs) for _ in range(rng.randint(1, 2))]
                if rng.random() < 0.3:
                    dxs.append(None)
                delete_equality(t, spark.createDataFrame(
                    [(x,) for x in dxs], f"{names['x']} double"), [names["x"]])
                model[:] = [r for r in model
                            if not any(_nsafe(r["x"], x) for x in dxs)]
            else:  # composite (k, x): both fids participate in the disproof
                row = rng.choice(model)
                delete_equality(t, spark.createDataFrame(
                    [(row["k"], row["x"])],
                    f"{names['k']} bigint, {names['x']} double"),
                    [names["k"], names["x"]])
                model[:] = [r for r in model
                            if not (_nsafe(r["k"], row["k"])
                                    and _nsafe(r["x"], row["x"]))]
            record()
        elif op == "update":
            if not ks:
                continue
            pivot = rng.choice(ks)
            from pyspark.sql import functions as F
            t.update(gi.gte(names["k"], pivot),
                     {names["v"]: F.concat(F.col(names["v"]), F.lit("_u"))})
            for r in model:
                if r["k"] >= pivot:
                    r["v"] += "_u"
            record()
        elif op == "upsert":
            src_ks = list({rng.choice(ks) if ks and rng.random() < 0.6 else next_k + i
                           for i in range(rng.randint(1, 3))})
            next_k += 10
            df, rows = _batch(spark, rng, src_ks, names, cols, wtype)
            t.upsert(df, [names["k"]])
            by_k = {r["k"]: r for r in rows}
            hit = set()
            for r in model:
                if r["k"] in by_k:
                    r.update(by_k[r["k"]])
                    hit.add(r["k"])
            model.extend(r for k, r in by_k.items() if k not in hit)
            record()
        elif op == "merge_nmbs":
            if len(ks) < 2:
                continue
            keep = list({rng.choice(ks) for _ in range(max(1, len(set(ks)) // 2))})
            df, rows = _batch(spark, rng, keep, names, cols, wtype)
            merge(t, df, [names["k"]], when_matched_update="*",
                  when_not_matched_insert=True,
                  when_not_matched_by_source_delete=True)
            by_k = {r["k"]: r for r in rows}
            nxt = []
            for r in model:
                if r["k"] in by_k:
                    nxt.append({**by_k[r["k"]]})
            have = {r["k"] for r in model}
            nxt.extend({**r} for k, r in by_k.items() if k not in have)
            model[:] = nxt
            record()
        elif op == "rollback":
            retained = {s.snapshot_id for s in t.snapshots()}
            pool = [sid for sid in history if sid in retained]
            if not pool:
                continue
            target = rng.choice(pool)
            t.rollback_to(target)
            # rows revert; the CURRENT schema (names/cols) does not — and the
            # target snapshot keeps its creation-time schema in history.
            # Rows recorded before a widen lack "w": current reads surface it
            # as NULL, matched via r.get(c) in _model_rows.
            model[:] = copy.deepcopy(history[target]["state"])
            applied.clear()
            applied.update(history[target]["applied"])
            # stream batches UNDONE by the rollback must be replayable (the
            # r6 ADVICE data-loss class): half the time the "stream restarts
            # from a savepoint" and re-delivers them ascending — each must
            # APPLY (True); otherwise they are abandoned (dropped from the
            # log so a later stream_replay doesn't expect a dedupe for them)
            undone = sorted(b for b in batch_log if b not in applied)
            if undone and rng.random() < 0.5:
                for b in undone:
                    kind, rows = batch_log[b]
                    if kind == "append":
                        ok = append_batch_exactly_once(t, _df_of(rows), "fz", b)
                    else:
                        ok = _upsert_once(_df_of(rows), b)
                    assert ok is True, (seed, step, "undone batch permanently "
                                        "deduped after rollback", b, kind)
                    if kind == "append":
                        model.extend(copy.deepcopy(rows))
                        applied.add(b)
                        record(appended=rows)
                    else:
                        _apply_upsert_to_model(rows)
                        applied.add(b)
                        record()
            else:
                for b in undone:
                    del batch_log[b]
        elif op == "compact":
            # half the time SELECTIVE (r9): a key-scoped rewrite compacts
            # only the files whose stats match, leaves the rest verbatim,
            # and keeps only still-needed delete files — later ops and
            # consumers then run over mixed rewritten/untouched sets.
            # r10 adds the tombstone-only rewrite (rewrite_position_deletes)
            # to the vocabulary: data files untouched, position-delete
            # files merged/dedup'd/dangling-dropped in one REPLACE.
            u = rng.random()
            if u < 0.25:
                t.rewrite_position_deletes()
            elif ks and u < 0.6:
                t.rewrite_data_files(min_input_files=2,
                                     where=gi.lte(names["k"], rng.choice(ks)))
            else:
                t.rewrite_data_files(min_input_files=2)
            record()  # metadata-only: model unchanged, new snapshot maybe
        elif op == "rewrite_manifests":
            # r7: member-clustering metadata-only rewrite — rows must be
            # untouched while the manifest tree (and its list-level bounds)
            # is rebuilt; composes with every later op via member reuse
            t.rewrite_manifests(
                target_entries_per_manifest=rng.choice([1, 2, 5, None]))
            record()
        elif op == "txn":
            # one atomic snapshot: a staged delete applies to PRE-txn rows
            # only; staged appends land regardless of the delete filter
            from go_iceberg_spark.table.transaction import Transaction

            tx = Transaction(t)
            cut = rng.choice(ks) if ks and rng.random() < 0.7 else next_k - 15
            tx.delete(gi.gte(names["k"], cut))
            new_ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names, cols, wtype)
            tx.append(df)
            n_snaps = len(t.snapshots())
            tx.commit()
            t.refresh()
            assert len(t.snapshots()) == n_snaps + 1  # ONE snapshot for both ops
            model[:] = [r for r in model if r["k"] < cut]
            model.extend(rows)
            record()
        elif op == "rename":
            c = rng.choice(cols)
            new = f"{c}_{step}"
            t.update_schema().rename_column(names[c], new).commit()
            names[c] = new
            # no new snapshot: current reads see the new name, recorded
            # snapshots keep their creation-time names (pinned schemas)
        elif op == "spec_evolve":
            # partition evolution mid-walk: older files keep their spec's
            # tuples, future writes lay out by the new default; every later
            # op then scans/rewrites a MIXED-spec file set
            choice = rng.choice([
                (names["k"], "bucket[4]"), (names["k"], "truncate[25]"),
                (names["v"], "truncate[2]"), None])
            if choice is None:
                t.update_partition_spec()  # unpartition future writes
                parted = False
            else:
                t.update_partition_spec(choice)
                parted = True
            # metadata-only: no snapshot, model unchanged
        elif op == "wap":
            # write-audit-publish: staged rows must be invisible on main
            # until publish; ~30% of audits are abandoned and their
            # branch must never leak rows or break later expiry/rollback.
            # Publish is fast_forward OR cherry-pick (r9) — the pick lands
            # the staged commit as a NEW append on main, composing with
            # every later op exactly like a plain append
            bname = f"aud{step}"
            t.create_branch(bname)
            new_ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names, cols, wtype)
            staged = t.append_to_branch(bname, df)
            assert _engine_rows(t, names, cols) == _model_rows(model, cols), \
                (seed, step, "main advanced before WAP publish")
            if rng.random() < 0.7:
                if rng.random() < 0.4:
                    t.cherrypick(staged.snapshot_id)
                else:
                    t.fast_forward("main", bname)
                model.extend(rows)
                record(appended=rows)
            elif rng.random() < 0.5:
                # fully abandoned audit: DROP the branch (r9 remove_ref) so
                # a later expire can reclaim the staged snapshot + files —
                # main and every consumer must stay oblivious
                t.remove_ref(bname)
        elif op == "add_files":
            new_ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names, cols, wtype)
            ext = tempfile.mkdtemp(prefix=f"fuzz_addfiles_{seed}_{step}_")
            df.coalesce(1).write.mode("overwrite").parquet(ext)
            paths = sorted(glob.glob(os.path.join(ext, "*.parquet")))
            if parted:
                # partitioned tables reject imports whose paths can't prove
                # partition values (and bucket imports outright)
                with pytest.raises(ValidationError):
                    t.add_files(paths)
            else:
                t.add_files(paths)
                model.extend(rows)
                record(appended=rows)
        elif op == "widen":
            if "w" not in cols:
                t.update_schema().add_column("w", INT).commit()
                names["w"] = "w"
                cols.append("w")
                # existing rows surface the new column as NULL
                # (model rows simply lack the key; _model_rows uses .get)
            elif wtype == "int":
                # widen int -> long: files written as int stay readable via
                # field-id alignment + type promotion; future writes are long
                t.update_schema().update_column_type(names["w"], LONG).commit()
                wtype = "bigint"
            else:
                continue  # already widened
            # schema-only: no snapshot, model values unchanged
        elif op == "stream_commit":
            # exactly-once micro-batch sink: first delivery applies, an
            # immediate replay of the same (ckpt, batch) — the crash between
            # table commit and checkpoint write — dedupes
            bid, next_bid = next_bid, next_bid + 1
            new_ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names, cols, wtype)
            assert append_batch_exactly_once(t, df, "fz", bid) is True, \
                (seed, step, "fresh stream batch did not apply", bid)
            batch_log[bid] = ("append", copy.deepcopy(rows))
            model.extend(rows)
            applied.add(bid)
            record(appended=rows)
            if rng.random() < 0.4:
                assert append_batch_exactly_once(
                    t, _df_of(batch_log[bid][1]), "fz", bid) is False, \
                    (seed, step, "replayed batch double-applied", bid)
        elif op == "stream_upsert":
            # CDC MERGE sink batch (upsert_stream's commit path): keys mix
            # existing rows (update ALL their duplicates) and fresh inserts;
            # same (ckpt, batch) marker + high-water dedup as the append sink
            bid, next_bid = next_bid, next_bid + 1
            src_ks = list({rng.choice(ks) if ks and rng.random() < 0.6
                           else next_k + i for i in range(rng.randint(1, 3))})
            next_k += 10
            df, rows = _batch(spark, rng, src_ks, names, cols, wtype)
            assert _upsert_once(df, bid) is True, \
                (seed, step, "fresh upsert batch did not apply", bid)
            batch_log[bid] = ("upsert", copy.deepcopy(rows))
            _apply_upsert_to_model(rows)
            applied.add(bid)
            record()
            if rng.random() < 0.4:
                assert _upsert_once(_df_of(batch_log[bid][1]), bid) is False, \
                    (seed, step, "replayed upsert batch double-applied", bid)
        elif op == "stream_agg":
            # streaming aggregate-view sink batch (agg_view_stream's REAL
            # commit path): per-group partials MERGE additively into the
            # view table. Exactly-once is LOAD-BEARING — a double-applied
            # replay double-counts silently, so replays (immediate, random
            # old, and post-maintenance) must all dedupe; the view state is
            # compared against the model's full recompute after every op.
            bid = agg_view["next_bid"]
            agg_view["next_bid"] += 1
            src_ks = [next_k + i for i in range(rng.randint(1, 3))]
            if agg_view["model"] and rng.random() < 0.6:
                src_ks[0] = rng.choice(list(agg_view["model"]))
            src_ks = sorted(set(src_ks))
            next_k += 10
            _, rows = _batch(spark, rng, src_ks, names, cols, wtype)
            assert _agg_once(_agg_df_of(rows), bid) is True, \
                (seed, step, "fresh agg batch did not apply", bid)
            agg_view["log"][bid] = copy.deepcopy(rows)
            _apply_agg_to_model(rows)
            if rng.random() < 0.4:  # crash between commit and checkpoint
                assert _agg_once(_agg_df_of(agg_view["log"][bid]), bid) is False, \
                    (seed, step, "replayed agg batch double-applied", bid)
            if len(agg_view["log"]) > 1 and rng.random() < 0.5:
                ob = rng.choice(sorted(agg_view["log"])[:-1])
                assert _agg_once(_agg_df_of(agg_view["log"][ob]), ob) is False, \
                    (seed, step, "old agg batch replayed as new", ob)
            if rng.random() < 0.35:
                # maintenance landing between micro-batches must disturb
                # neither the additive state nor the replay guard — expiry
                # drops the marker snapshots, so dedup then rides the
                # high-water property (the r6 expiry-resurrection class)
                if rng.random() < 0.5:
                    agg_view["t"].rewrite_data_files(min_input_files=1)
                else:
                    agg_view["t"].expire_snapshots(retain_last=1)
                rb = rng.choice(sorted(agg_view["log"]))
                assert _agg_once(_agg_df_of(agg_view["log"][rb]), rb) is False, \
                    (seed, step, "agg replay applied after maintenance", rb)
            _check_agg_view(step, op)
        elif op == "stream_replay":
            # re-deliver a random APPLIED batch: must dedupe via the summary
            # marker or — after the marker snapshot expired — the
            # high-water property (the r6 expiry-resurrection class); the
            # post-step scan equality below confirms no rows were re-added
            done = sorted(b for b in batch_log if b in applied)
            if not done:
                continue
            b = rng.choice(done)
            kind, rows = batch_log[b]
            replayed = (append_batch_exactly_once(t, _df_of(rows), "fz", b)
                        if kind == "append" else _upsert_once(_df_of(rows), b))
            assert replayed is False, \
                (seed, step, "applied batch replayed as new", b, kind)
        elif op == "expire":
            t.expire_snapshots(retain_last=rng.randint(2, 4))
            retained = {s.snapshot_id for s in t.snapshots()}
            for sid in list(history):
                if sid not in retained:
                    del history[sid]

        got, want = _engine_rows(t, names, cols), _model_rows(model, cols)
        assert got == want, (seed, step, op, got[:5], want[:5])

        # time-travel spot check against a retained recorded snapshot
        retained = {s.snapshot_id for s in t.snapshots()}
        pool = [sid for sid in history if sid in retained]
        if pool:
            sid = rng.choice(pool)
            rec = history[sid]
            st, snames, scols = rec["state"], rec["names"], rec["cols"]
            tt = sorted(tuple(_norm(r[snames[c]]) for c in scols)
                        for r in t.scan().use_snapshot(sid).to_df().collect())
            assert tt == _model_rows(st, scols), (seed, step, op, "time-travel", sid)

        # consumer invariants (incremental / changelog / strict mode) over a
        # random retained range — probabilistic per step, guaranteed once at
        # walk end
        if rng.random() < 0.35 or step == steps - 1:
            consumer_checks(step, op)

    _check_agg_view(steps - 1, "walk-end")


@pytest.mark.parametrize(
    "seed",
    [pytest.param(20260815, marks=pytest.mark.soak), 977])
def test_mutation_walk_matches_model(spark, catalog, seed):
    _walk(spark, catalog, seed, steps=14)


@pytest.mark.soak
def test_mutation_walk_matches_model_bucket_partitioned(spark, catalog):
    """Same walk over a bucket[4]-partitioned table: every op then exercises
    partitioned writes, per-spec partition tuples, and bucket pruning."""
    _walk(spark, catalog, 424242, steps=14, partitioned=True)


def test_mutation_walk_matches_model_avro_manifests(spark, catalog):
    """Same walk with manifest-format=avro: every snapshot's live set rides
    the Iceberg-spec OCF serde (manifest list + manifests + binary bound
    round-trip) through mutations, renames, rollbacks, and expiry."""
    _walk(spark, catalog, 31337, steps=14,
          properties={"manifest-format": "avro"})


@pytest.mark.soak
def test_mutation_walk_matches_model_stat_properties(spark, catalog):
    """r10: the walk with write.exact-bounds-columns (string v) and
    write.nan-count-columns (double x) ON — the metadata MIN/MAX consumer
    check then exercises the bounds_exact marker and the NaN proof across
    the full CRUD/maintenance/evolution vocabulary, including renames
    (the name-keyed properties must follow) and add_files imports (whose
    unmarked stats must flip string answers back to refusal)."""
    _walk(spark, catalog, 55101, steps=16,
          properties={"write.exact-bounds-columns": "v",
                      "write.nan-count-columns": "x"})


@pytest.mark.soak
@pytest.mark.parametrize("seed", [7001, 7002])
def test_mutation_walk_new_vocabulary(spark, catalog, seed):
    """r7: longer walks weighted toward the new ops (spec evolution, WAP,
    add_files, widening) composing with the r6 vocabulary."""
    _walk(spark, catalog, seed, steps=20)


@pytest.mark.soak
def test_mutation_walk_matches_model_rest_catalog(spark, tmp_path):
    """r7: the extended walk (spec evolution, WAP, add_files, widening +
    the r6 ops) through the REST catalog — every mutation then rides the
    commit protocol's requirements/updates vocabulary instead of direct
    filesystem metadata commits."""
    from go_iceberg_spark.catalog.rest import RESTCatalog
    from go_iceberg_spark.catalog.rest_server import serve_background

    srv, uri = serve_background(str(tmp_path / "wh"))
    try:
        rcat = RESTCatalog(spark, uri)
        rcat.create_namespace(("db",))
        _walk(spark, rcat, 5150, steps=14)
    finally:
        srv.shutdown()
