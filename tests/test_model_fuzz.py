"""Model-based mutation fuzz (r6): a seeded random walk of table operations
runs against BOTH the engine table and a plain in-memory model; after every
step the scan must equal the model, and a randomly chosen RETAINED snapshot
must equal the model's recorded state at that snapshot (time-travel
consistency through every later mutation, compaction, and expiry).

This mechanizes the manual probe sweep that found the round 3-6 composition
bugs (changelog netting, per-file delete application, rewrite
over-suppression, ...): instead of hand-picking feature PAIRS, the walk
composes append / CoW+MoR delete / equality delete / update / upsert /
merge(+NOT MATCHED BY SOURCE) / rollback / compaction / expiry in random
order and checks full-table equality at every step.
"""

from __future__ import annotations

import copy
import math
import random

import pytest

import go_iceberg_spark as gi
from go_iceberg_spark.schema import from_spark_schema
from go_iceberg_spark.table.mutate import merge
from go_iceberg_spark.table.transaction import delete_equality

COLS = ("k", "v", "x")


def _norm(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    if isinstance(x, float):
        return round(x, 9)
    return x


def _engine_rows(t, names):
    return sorted(tuple(_norm(r[names[c]]) for c in COLS) for r in t.to_df().collect())


def _model_rows(rows):
    return sorted(tuple(_norm(r[c]) for c in COLS) for r in rows)


def _batch(spark, rng, ks, names=None):
    names = names or dict(zip(COLS, COLS))
    rows = [(k, f"v{rng.randint(0, 99)}",
             float("nan") if rng.random() < 0.1 else round(rng.uniform(-50, 50), 2))
            for k in ks]
    ddl = f"{names['k']} bigint, {names['v']} string, {names['x']} double"
    return (spark.createDataFrame(rows, ddl),
            [dict(zip(COLS, r)) for r in rows])


def _walk(spark, catalog, seed: int, steps: int, partitioned: bool = False,
          properties: dict | None = None):
    rng = random.Random(seed)
    names = dict(zip(COLS, COLS))  # logical -> CURRENT physical column name
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
    next_k = 100
    # snapshot-id -> (model state, column names AT SNAPSHOT CREATION): a
    # time-travel read pins the snapshot's schema, so later renames must NOT
    # retitle already-recorded snapshots
    history = {t.current_snapshot().snapshot_id: (copy.deepcopy(model), dict(names))}

    def record():
        # insert-once: a snapshot's state is immutable. A NO-OP commit (e.g.
        # compaction below min_input_files) leaves the current snapshot id
        # unchanged; re-recording it would retitle a pre-rename snapshot
        # with post-rename column names.
        sid = t.current_snapshot().snapshot_id
        if sid not in history:
            history[sid] = (copy.deepcopy(model), dict(names))

    for step in range(steps):
        op = rng.choice(
            ["append", "delete_cow", "delete_mor", "eq_delete", "update",
             "upsert", "merge_nmbs", "rollback", "compact", "expire",
             "rename", "rename", "txn"])
        ks = [r["k"] for r in model]
        if op == "append":
            new_ks = [next_k + i for i in range(rng.randint(1, 4))]
            # ~1/3 of appends re-insert an existing key (duplicates are legal)
            if ks and rng.random() < 0.3:
                new_ks[0] = rng.choice(ks)
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names)
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
            df, rows = _batch(spark, rng, src_ks, names)
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
            df, rows = _batch(spark, rng, keep, names)
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
            # rows revert; the CURRENT schema (names) does not — and the
            # target snapshot keeps its creation-time schema in history
            model[:] = copy.deepcopy(history[target][0])
        elif op == "compact":
            t.rewrite_data_files(min_input_files=2)
            record()  # metadata-only: model unchanged, new snapshot maybe
        elif op == "txn":
            # one atomic snapshot: a staged delete applies to PRE-txn rows
            # only; staged appends land regardless of the delete filter
            from go_iceberg_spark.table.transaction import Transaction

            tx = Transaction(t)
            cut = rng.choice(ks) if ks and rng.random() < 0.7 else next_k - 15
            tx.delete(gi.gte(names["k"], cut))
            new_ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += 10
            df, rows = _batch(spark, rng, new_ks, names)
            tx.append(df)
            n_snaps = len(t.snapshots())
            tx.commit()
            t.refresh()
            assert len(t.snapshots()) == n_snaps + 1  # ONE snapshot for both ops
            model[:] = [r for r in model if r["k"] < cut]
            model.extend(rows)
            record()
        elif op == "rename":
            c = rng.choice(COLS)
            new = f"{c}_{step}"
            t.update_schema().rename_column(names[c], new).commit()
            names[c] = new
            # no new snapshot: current reads see the new name, recorded
            # snapshots keep their creation-time names (pinned schemas)
        elif op == "expire":
            t.expire_snapshots(retain_last=rng.randint(2, 4))
            retained = {s.snapshot_id for s in t.snapshots()}
            for sid in list(history):
                if sid not in retained:
                    del history[sid]

        got, want = _engine_rows(t, names), _model_rows(model)
        assert got == want, (seed, step, op, got[:5], want[:5])

        # time-travel spot check against a retained recorded snapshot
        retained = {s.snapshot_id for s in t.snapshots()}
        pool = [sid for sid in history if sid in retained]
        if pool:
            sid = rng.choice(pool)
            st, snames = history[sid]
            tt = sorted(tuple(_norm(r[snames[c]]) for c in COLS)
                        for r in t.scan().use_snapshot(sid).to_df().collect())
            assert tt == _model_rows(st), (seed, step, op, "time-travel", sid)


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
