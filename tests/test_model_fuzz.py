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
"""

from __future__ import annotations

import copy
import glob
import math
import os
import random
import tempfile

import pytest

import go_iceberg_spark as gi
from go_iceberg_spark.errors import ValidationError
from go_iceberg_spark.schema import INT, LONG, from_spark_schema
from go_iceberg_spark.table.mutate import merge
from go_iceberg_spark.table.transaction import delete_equality

COLS = ("k", "v", "x")  # base columns; the widen op appends "w"


def _norm(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
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
        r = (k, f"v{rng.randint(0, 99)}",
             float("nan") if rng.random() < 0.1 else round(rng.uniform(-50, 50), 2))
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
    # snapshot-id -> (model state, column names, logical cols AT SNAPSHOT
    # CREATION): a time-travel read pins the snapshot's schema, so later
    # renames/widenings/adds must NOT retitle already-recorded snapshots
    history = {t.current_snapshot().snapshot_id:
               (copy.deepcopy(model), dict(names), list(cols))}

    def record():
        # insert-once: a snapshot's state is immutable. A NO-OP commit (e.g.
        # compaction below min_input_files) leaves the current snapshot id
        # unchanged; re-recording it would retitle a pre-rename snapshot
        # with post-rename column names.
        sid = t.current_snapshot().snapshot_id
        if sid not in history:
            history[sid] = (copy.deepcopy(model), dict(names), list(cols))

    for step in range(steps):
        op = rng.choice(
            ["append", "delete_cow", "delete_mor", "eq_delete", "update",
             "upsert", "merge_nmbs", "rollback", "compact", "expire",
             "rename", "rename", "txn",
             "spec_evolve", "wap", "add_files", "widen",
             "rewrite_manifests"])
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
            record()
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
            if not ks:
                continue
            dks = list({rng.choice(ks) for _ in range(rng.randint(1, 3))})
            delete_equality(t, spark.createDataFrame(
                [(k,) for k in dks], f"{names['k']} bigint"), [names["k"]])
            model[:] = [r for r in model if r["k"] not in dks]
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
            model[:] = copy.deepcopy(history[target][0])
        elif op == "compact":
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
            # until fast_forward; ~30% of audits are abandoned and their
            # branch must never leak rows or break later expiry/rollback
            bname = f"aud{step}"
            t.create_branch(bname)
            new_ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names, cols, wtype)
            t.append_to_branch(bname, df)
            assert _engine_rows(t, names, cols) == _model_rows(model, cols), \
                (seed, step, "main advanced before WAP publish")
            if rng.random() < 0.7:
                t.fast_forward("main", bname)
                model.extend(rows)
                record()
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
                record()
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
            st, snames, scols = history[sid]
            tt = sorted(tuple(_norm(r[snames[c]]) for c in scols)
                        for r in t.scan().use_snapshot(sid).to_df().collect())
            assert tt == _model_rows(st, scols), (seed, step, op, "time-travel", sid)


@pytest.mark.parametrize("seed", [20260815, 977])
def test_mutation_walk_matches_model(spark, catalog, seed):
    _walk(spark, catalog, seed, steps=14)


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


@pytest.mark.parametrize("seed", [7001, 7002])
def test_mutation_walk_new_vocabulary(spark, catalog, seed):
    """r7: longer walks weighted toward the new ops (spec evolution, WAP,
    add_files, widening) composing with the r6 vocabulary."""
    _walk(spark, catalog, seed, steps=20)


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
