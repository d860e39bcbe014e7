"""Physical-plan inspection: assert the plans we ship are the plans we want.

The 100 TB contract is a plan-shape contract: dimension joins must broadcast,
scans must push filters and prune columns, operator pipelines must not
duplicate expensive subtrees. These helpers turn those expectations into
assertions (used in tests/test_plans.py) so a regression in plan shape fails
CI even while results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text, returned instead of printed."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def count_op(df: DataFrame, op: str) -> int:
    """Number of DISTINCT physical operator instances in the plan (e.g.
    'BroadcastHashJoin', 'SortMergeJoin', 'Exchange', 'Generate').
    formatted-explain prints each node twice (tree + detail block), so we
    count unique node ids rather than raw substring hits."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"\((\d+)\) " + re.escape(op) + r"\b", plan))
    return len(ids) if ids else plan.count(op)


def num_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the plan — each is a full shuffle of its input."""
    return count_op(df, "Exchange")


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists from the scans in the plan."""
    return [m for m in re.findall(r"PushedFilters: \[([^\]]+)\]", formatted_plan(df)) if m.strip()]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verifies column pruning reached parquet."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def assert_broadcasts(df: DataFrame, at_least: int = 1) -> None:
    n = count_op(df, "BroadcastHashJoin")
    assert n >= at_least, f"expected >= {at_least} BroadcastHashJoin, plan has {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a CartesianProduct"


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """A pushed filter mentioning ``fragment`` (usually a column name) reached
    the parquet scan."""
    pf = pushed_filters(df)
    assert any(fragment in p for p in pf), f"no pushed filter mentions {fragment!r}: {pf}"


def exchange_nodes(df: DataFrame) -> list[dict]:
    """Detail blocks of every Exchange node: {'id', 'input', 'arguments'}.
    Lets tests assert WHAT each shuffle carries (payload columns) and on
    WHICH keys it partitions — the difference between a plan that moves
    candidate ids and one that moves the whole corpus payload."""
    plan = formatted_plan(df)
    out = []
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) Exchange", block)
        if not m:
            continue
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", block)
        args = re.search(r"Arguments: (.*)", block)
        out.append({
            "id": int(m.group(1)),
            "input": inp.group(1) if inp else "",
            "arguments": args.group(1) if args else "",
        })
    return out


def assert_max_op(df: DataFrame, op: str, at_most: int) -> None:
    """Bound the occurrences of an operator — e.g. the shingle Generate must
    appear once, not once per LSH band."""
    n = count_op(df, op)
    assert n <= at_most, f"expected <= {at_most} {op}, plan has {n}"
