"""Expression DSL tests — ports the intents of the reference's
expression_test.go (structure) and adds what it lacked: evaluation
correctness via Spark, and stats-pruning (might_match) unit tests."""

from __future__ import annotations

import pytest

from go_iceberg_spark import expr as E
from go_iceberg_spark.expr import ColumnStats, might_match


# -- structure (reference: table/expression_test.go:7-260) -------------------


def test_builders_structure():
    e = E.col("id").eq(5)
    assert e.op is E.Op.EQ and e.column == "id" and e.value == 5
    e = E.col("x").isin(1, 2, 3)
    assert e.op is E.Op.IN and e.values == (1, 2, 3)
    e = E.col("x").not_in([4, 5])
    assert e.op is E.Op.NOT_IN and e.values == (4, 5)
    e = E.col("s").starts_with("ab")
    assert e.op is E.Op.STARTS_WITH and e.value == "ab"


def test_between_desugars_to_and():
    # reference: table/expression.go:295-300
    e = E.col("v").between(1, 9)
    assert e.op is E.Op.AND
    assert e.children[0].op is E.Op.GTE and e.children[0].value == 1
    assert e.children[1].op is E.Op.LTE and e.children[1].value == 9


def test_simplify():
    # reference: table/expression.go:384-433
    assert E.and_() is E.ALWAYS_TRUE
    assert E.or_() is E.ALWAYS_FALSE
    single = E.eq("a", 1)
    assert E.and_(single) is single
    assert E.not_(E.not_(single)) is single
    assert E.and_(single, E.ALWAYS_FALSE) is E.ALWAYS_FALSE
    assert E.or_(single, E.ALWAYS_TRUE) is E.ALWAYS_TRUE


def test_referenced_columns():
    e = E.and_(E.eq("a", 1), E.or_(E.gt("b", 2), E.eq("a", 3)))
    assert E.referenced_columns(e) == ["a", "b"]


def test_operator_overloads():
    e = (E.col("a").eq(1) & E.col("b").gt(2)) | ~E.col("c").is_null()
    assert e.op is E.Op.OR


# -- translation to Catalyst + evaluation ------------------------------------


def test_to_column_eval(spark):
    df = spark.createDataFrame(
        [(1, "alpha", None), (2, "beta", 5.0), (3, None, 7.5)], "id long, name string, score double"
    )

    def ids(e):
        return sorted(r.id for r in df.filter(E.to_column(e)).collect())

    assert ids(E.eq("id", 2)) == [2]
    assert ids(E.col("id").between(2, 3)) == [2, 3]
    assert ids(E.col("name").is_null()) == [3]
    assert ids(E.col("name").is_not_null()) == [1, 2]
    assert ids(E.col("name").starts_with("a")) == [1]
    # NotStartsWith / NotIn handled correctly (reference drops them,
    # table/delete.go:324-326) — NULL name row excluded per SQL 3VL
    assert ids(E.col("name").not_starts_with("a")) == [2]
    assert ids(E.col("name").not_in("alpha")) == [2]
    assert ids(E.not_(E.eq("score", 5.0))) == [3]  # NULL dropped (3VL)


# -- stats pruning (real impl of reference stubs, table/insert.go:255-266) ---


def _stats(lo, hi, nulls=0, count=10):
    return {"c": ColumnStats(min=lo, max=hi, null_count=nulls, value_count=count)}


@pytest.mark.parametrize(
    "e,stats,expected",
    [
        (E.eq("c", 5), _stats(1, 10), True),
        (E.eq("c", 11), _stats(1, 10), False),
        (E.eq("c", 0), _stats(1, 10), False),
        (E.lt("c", 1), _stats(1, 10), False),
        (E.lt("c", 2), _stats(1, 10), True),
        (E.lte("c", 1), _stats(1, 10), True),
        (E.lte("c", 0), _stats(1, 10), False),
        (E.gt("c", 10), _stats(1, 10), False),
        (E.gt("c", 9), _stats(1, 10), True),
        (E.gte("c", 10), _stats(1, 10), True),
        (E.gte("c", 11), _stats(1, 10), False),
        (E.isin("c", 0, 11), _stats(1, 10), False),
        (E.isin("c", 0, 10), _stats(1, 10), True),
        (E.is_null("c"), _stats(1, 10, nulls=0), False),
        (E.is_null("c"), _stats(1, 10, nulls=1), True),
        (E.is_not_null("c"), _stats(None, None, nulls=10, count=10), False),
        (E.eq("c", 5), _stats(None, None, nulls=10, count=10), False),  # all-null
        (E.starts_with("c", "m"), _stats("a", "f"), False),
        (E.starts_with("c", "b"), _stats("a", "f"), True),
        (E.starts_with("c", "a"), _stats("ab", "f"), True),
        # conservative: unknown column, NOT, NOT_IN never prune
        (E.eq("other", 1), _stats(1, 10), True),
        (E.not_(E.eq("c", 5)), _stats(5, 5), True),
        (E.col("c").not_in(5), _stats(5, 5), True),
    ],
)
def test_might_match(e, stats, expected):
    assert might_match(e, stats) is expected


def test_might_match_and_or():
    s = _stats(1, 10)
    assert might_match(E.and_(E.eq("c", 5), E.eq("c", 11)), s) is False
    assert might_match(E.or_(E.eq("c", 11), E.eq("c", 5)), s) is True
    assert might_match(E.or_(E.eq("c", 11), E.eq("c", 12)), s) is False


def test_must_match_proves_full_file_coverage():
    """must_match: True only when stats PROVE every row matches (the
    metadata-only delete fast path); any uncertainty is False."""
    from go_iceberg_spark.expr import (
        ColumnStats,
        and_,
        col,
        must_match,
        or_,
    )

    full = {"g": ColumnStats(min="a", max="a", null_count=0, value_count=10),
            "x": ColumnStats(min=5, max=9, null_count=0, value_count=10)}
    assert must_match(col("g").eq("a"), full)
    assert not must_match(col("g").eq("b"), full)
    assert must_match(col("x").lt(10), full)
    assert must_match(col("x").gte(5), full)
    assert not must_match(col("x").lt(9), full)  # max row == 9 fails x < 9
    assert must_match(col("x").not_eq(4), full)
    assert must_match(col("x").not_in(1, 2), full)
    assert not must_match(col("x").not_in(7), full)
    assert must_match(and_(col("g").eq("a"), col("x").gt(4)), full)
    assert must_match(or_(col("g").eq("zz"), col("x").lte(9)), full)
    assert must_match(col("g").starts_with("a"), full)
    assert not must_match(col("g").starts_with("ab"), full)

    # nulls poison comparisons but prove IS_NULL when total
    with_nulls = {"x": ColumnStats(min=5, max=9, null_count=3, value_count=10)}
    assert not must_match(col("x").lt(10), with_nulls)
    all_null = {"x": ColumnStats(min=None, max=None, null_count=10, value_count=10)}
    assert must_match(col("x").is_null(), all_null)
    assert not must_match(col("x").is_not_null(), all_null)
    # unknown column / missing stats -> never proven
    assert not must_match(col("zz").eq(1), full)


def test_must_match_refuses_float_columns_nan_blind_stats():
    """Parquet min/max stats EXCLUDE NaN: a float file whose non-NaN values
    all satisfy the predicate may still hold NaN rows that don't. must_match
    must therefore never 'prove' full coverage from float bounds (the
    metadata-only delete fast path would silently drop those NaN rows)."""
    from go_iceberg_spark.expr import ColumnStats, col, must_match

    fs = {"f": ColumnStats(min=1.0, max=50.0, null_count=0, value_count=10)}
    assert not must_match(col("f").lt(100.0), fs)
    assert not must_match(col("f").lte(50.0), fs)
    assert not must_match(col("f").gte(1.0), fs)
    assert not must_match(col("f").not_eq(99.0), fs)
    # might_match (inclusive projection) is unaffected — scan still visits
    from go_iceberg_spark.expr import might_match

    assert might_match(col("f").lt(100.0), fs)
