"""Assertions over the optimized physical plan.

These encode the engine's performance invariants as testable facts —
the things `.explain("formatted")` is eyeballed for, made regression-
proof:

* filters reach the parquet scan (PushedFilters),
* column pruning happened (ReadSchema carries only needed columns),
* small dims broadcast (BroadcastHashJoin, no shuffle on the dim side),
* no Exchange sits above an Arrow/Python UDF node (a post-UDF shuffle
  oversubscribes python workers + shuffle writers; see cdc/merge.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = plan_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    assert any(fragment in ln for ln in pushed), (
        f"filter fragment {fragment!r} not pushed; PushedFilters lines: {pushed}"
    )


def assert_read_schema_pruned(df: DataFrame, max_columns: int) -> None:
    plan = plan_str(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            schema_part = ln.split("ReadSchema:", 1)[1]
            ncols = schema_part.count(":")
            assert ncols <= max_columns, f"scan reads {ncols} cols (> {max_columns}): {ln}"
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = plan_str(df, "simple")
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected >= {at_least} BroadcastHashJoin, got {n}:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    return plan_str(df, "simple").count("Exchange")


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*"))


def assert_no_exchange_above_python_udf(df: DataFrame) -> None:
    """In the plan tree text, no Exchange may be an ancestor of an
    Arrow/BatchEvalPython node: the UDF must pipeline into its sink.
    Ancestors of a node print earlier with smaller indentation."""
    plan = plan_str(df, "simple")
    lines = plan.splitlines()
    udf_lines = [
        i for i, ln in enumerate(lines) if "ArrowEvalPython" in ln or "BatchEvalPython" in ln
    ]
    assert udf_lines, f"no python UDF node in plan:\n{plan}"
    for i in udf_lines:
        ind = _indent(lines[i])
        for k in range(i - 1, -1, -1):
            kind = _indent(lines[k])
            if kind < ind:
                assert "Exchange" not in lines[k], (
                    f"Exchange is an ancestor of the python UDF node:\n{plan}"
                )
                ind = kind
