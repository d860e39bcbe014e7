"""Property-based soundness of the stats-pruning core (hypothesis):

- might_match is COMPLETE: if any row of a file satisfies the filter, the
  file's stats must report might_match=True (a false negative here silently
  drops rows from scans — the worst bug class in the engine).
- must_match is SOUND: if stats prove full coverage, then every row really
  satisfies the filter (a false positive here deletes rows that should
  survive a metadata-only delete).
- must_match implies might_match.

Filters and file contents are generated randomly; stats are derived from the
actual rows exactly as the writer derives them (min/max/null_count/
value_count)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from go_iceberg_spark.expr import (
    ColumnStats,
    Expression,
    col,
    might_match,
    must_match,
)

values = st.lists(
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    min_size=1, max_size=12,
)
literals = st.integers(min_value=-55, max_value=55)


def stats_of(rows: list[int | None]) -> dict[str, ColumnStats]:
    present = [r for r in rows if r is not None]
    return {
        "x": ColumnStats(
            min=min(present) if present else None,
            max=max(present) if present else None,
            null_count=sum(1 for r in rows if r is None),
            value_count=len(rows),
        )
    }


def filters(v: int, vs: tuple[int, ...]):
    c = col("x")
    return [
        c.eq(v), c.not_eq(v), c.lt(v), c.lte(v), c.gt(v), c.gte(v),
        c.isin(*vs), c.not_in(*vs), c.is_null(), c.is_not_null(),
        c.eq(v) | c.gt(v + 3), c.gte(v) & c.lte(v + 5),
    ]


def row_satisfies(e: Expression, x: int | None) -> bool:
    """Ground-truth SQL semantics for a single row (NULL fails every
    comparison; only IS NULL matches it)."""
    from go_iceberg_spark.expr import Op

    op = e.op
    if op is Op.AND:
        return all(row_satisfies(ch, x) for ch in e.children)
    if op is Op.OR:
        return any(row_satisfies(ch, x) for ch in e.children)
    if op is Op.IS_NULL:
        return x is None
    if op is Op.NOT_NULL:
        return x is not None
    if x is None:
        return False
    if op is Op.EQ:
        return x == e.value
    if op is Op.NOT_EQ:
        return x != e.value
    if op is Op.LT:
        return x < e.value
    if op is Op.LTE:
        return x <= e.value
    if op is Op.GT:
        return x > e.value
    if op is Op.GTE:
        return x >= e.value
    if op is Op.IN:
        return x in e.values
    if op is Op.NOT_IN:
        return x not in e.values
    raise AssertionError(f"unhandled op {op}")


@settings(max_examples=300, deadline=None)
@given(rows=values, v=literals, vs=st.tuples(literals, literals, literals))
def test_pruning_soundness_and_completeness(rows, v, vs):
    stats = stats_of(rows)
    for f in filters(v, vs):
        truth = [row_satisfies(f, r) for r in rows]
        if any(truth):
            assert might_match(f, stats), (f, rows, "completeness violated")
        if must_match(f, stats):
            assert all(truth), (f, rows, "must_match soundness violated")
            assert might_match(f, stats), (f, rows, "must without might")
