"""Property-based equivalence of the expression DSL's Catalyst translation
(hypothesis): random expression trees over nullable int/string columns,
evaluated by Spark via ``to_column`` AND rendered to ANSI SQL for DuckDB —
both engines must keep exactly the same rows. This pins the three-valued
NULL semantics across EVERY op, including the NotIn / StartsWith /
NotStartsWith family the reference's row interpreter silently defaulted to
TRUE (reference: table/delete.go:324-326)."""

from __future__ import annotations

import duckdb
import pytest

pytestmark = pytest.mark.soak  # r13: soak lane (see pytest.ini)
from hypothesis import HealthCheck, given, settings, strategies as st

from go_iceberg_spark.expr import (
    Expression,
    and_,
    col,
    not_,
    or_,
    simplify,
    to_column,
)

INTS = [-3, -1, 0, 1, 2, 5, 9]
STRS = ["", "a", "ab", "abc", "b", "ba", "zz"]

ROWS = [
    (rid, i, s)
    for rid, (i, s) in enumerate(
        (i, s)
        for i in INTS + [None]
        for s in STRS + [None]
    )
]


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def to_duckdb_sql(e: Expression) -> str:
    """ANSI-SQL rendering of the IR with the same 3VL semantics the
    Catalyst translation produces (NOT(x IN ...), NOT starts_with, Kleene
    AND/OR)."""
    from go_iceberg_spark.expr import Op

    op = e.op
    if op is Op.ALWAYS_TRUE:
        return "TRUE"
    if op is Op.ALWAYS_FALSE:
        return "FALSE"
    if op is Op.AND:
        return "(" + " AND ".join(to_duckdb_sql(c) for c in e.children) + ")"
    if op is Op.OR:
        return "(" + " OR ".join(to_duckdb_sql(c) for c in e.children) + ")"
    if op is Op.NOT:
        return f"(NOT {to_duckdb_sql(e.children[0])})"
    c = e.column
    cmp = {Op.EQ: "=", Op.NOT_EQ: "<>", Op.LT: "<", Op.LTE: "<=", Op.GT: ">", Op.GTE: ">="}
    if op in cmp:
        return f"({c} {cmp[op]} {_sql_lit(e.value)})"
    if op is Op.IN:
        return f"({c} IN ({', '.join(_sql_lit(v) for v in e.values)}))"
    if op is Op.NOT_IN:
        return f"(NOT ({c} IN ({', '.join(_sql_lit(v) for v in e.values)})))"
    if op is Op.IS_NULL:
        return f"({c} IS NULL)"
    if op is Op.NOT_NULL:
        return f"({c} IS NOT NULL)"
    if op is Op.STARTS_WITH:
        return f"starts_with({c}, {_sql_lit(e.value)})"
    if op is Op.NOT_STARTS_WITH:
        return f"(NOT starts_with({c}, {_sql_lit(e.value)}))"
    raise ValueError(op)


int_leaf = st.sampled_from(INTS).flatmap(lambda v: st.sampled_from([
    col("i").eq(v), col("i").not_eq(v), col("i").lt(v), col("i").lte(v),
    col("i").gt(v), col("i").gte(v),
    col("i").isin(v, v + 1), col("i").not_in(v, v + 2),
    col("i").is_null(), col("i").is_not_null(),
]))
str_leaf = st.sampled_from(STRS).flatmap(lambda v: st.sampled_from([
    col("s").eq(v), col("s").not_eq(v), col("s").lt(v), col("s").gte(v),
    col("s").isin(v, v + "x"), col("s").not_in(v),
    col("s").starts_with(v), col("s").not_starts_with(v),
    col("s").is_null(), col("s").is_not_null(),
]))
leaf = st.one_of(int_leaf, str_leaf)
trees = st.recursive(
    leaf,
    lambda sub: st.one_of(
        st.tuples(sub, sub).map(lambda t: and_(*t)),
        st.tuples(sub, sub).map(lambda t: or_(*t)),
        sub.map(not_),
    ),
    max_leaves=6,
)


@pytest.fixture(scope="module")
def fixture_data(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exprfuzz") / "t.parquet")
    df = spark.createDataFrame(ROWS, "rid long, i long, s string")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return df, con


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(e=trees)
def test_to_column_matches_ansi_3vl(fixture_data, e):
    df, con = fixture_data
    spark_ids = {r["rid"] for r in df.filter(to_column(e)).select("rid").collect()}
    duck_ids = {r[0] for r in
                con.execute(f"SELECT rid FROM t WHERE {to_duckdb_sql(e)}").fetchall()}
    assert spark_ids == duck_ids, to_duckdb_sql(e)
    # simplify() must be a semantic no-op, not just a structural cleanup
    simplified = {r["rid"] for r in df.filter(to_column(simplify(e))).select("rid").collect()}
    assert simplified == spark_ids, to_duckdb_sql(e)
