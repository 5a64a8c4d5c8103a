"""Plan-inspection helpers: assert the physical plan is the one we
want (pushdown reached the scan, the join went broadcast, codegen
spans the hot path) — used in tests so plan regressions fail CI."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The scan node must show ``fragment`` in PushedFilters — i.e.
    the predicate reached parquet, it is not a post-scan Filter."""
    plan = explain_str(df)
    assert "PushedFilters" in plan, plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(fragment.lower() in l.lower() for l in pushed), (
        f"filter {fragment!r} not pushed to scan:\n" + "\n".join(pushed)
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def assert_segment_attach_no_shuffle(df: DataFrame) -> None:
    """The query-term attach must never shuffle the postings side:
    either the literal-map Generate (r7 — query terms inlined as one
    expression, no join at all) or a broadcast join (the large-
    expansion fallback). A hash/sort-merge join or any Exchange below
    the attach would mean postings bytes moved — fail."""
    plan = explain_str(df, "simple")
    attach_ok = (
        "Generate explode(element_at(map(" in plan
        or "BroadcastHashJoin" in plan
        or "BroadcastNestedLoopJoin" in plan
    )
    assert attach_ok, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan


def assert_read_schema_only(df: DataFrame, cols: set[str]) -> None:
    """Column pruning check: the parquet ReadSchema must contain only
    ``cols`` (a 2-column projection must not scan all columns)."""
    plan = explain_str(df)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
    assert read <= cols, f"scan reads {read - cols} beyond {cols}"


def assert_no_python(df: DataFrame) -> None:
    """The plan must contain NO Python evaluation of any kind — not
    row-at-a-time (BatchEvalPython), not Arrow-batched
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas): the whole
    query stays JVM-side."""
    plan = explain_str(df, "simple")
    for node in (
        "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
        "FlatMapGroupsInPandas", "PythonUDF",
    ):
        assert node not in plan, f"{node} in plan:\n{plan}"


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (formatted plan shows them
    as 'WholeStageCodegen (N)'; simple mode only marks them '*(N)')."""
    plan = explain_str(df, "formatted")
    import re

    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
