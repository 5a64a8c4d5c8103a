"""Physical-plan regression tests: the plans we shipped are the plans
we want (pushdown at the scan, broadcast where intended, codegen on
the hot path, no cartesian products) — .explain as a test subject."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xml_to_es_spark.operators.query_engine import bm25_topk_dataframe
from xml_to_es_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema_only,
    codegen_stage_count,
    explain_str,
)


def test_read_pages_pushdown(spark, tmp_path):
    from xml_to_es_spark import fixtures
    from xml_to_es_spark.sources.pages import read_pages

    p = str(tmp_path / "pages")
    spark.createDataFrame(fixtures.generate_pages(50)).write.parquet(p)
    df = read_pages(spark, p, langs=("en",)).select("url", "lang")
    # the lang whitelist must reach the parquet scan, not sit in a
    # post-scan Filter
    assert_pushed_filter(df, "lang")
    assert_read_schema_only(df, {"url", "lang", "html"})


def test_bm25_dataframe_plan_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan_df = bm25_topk_dataframe(docs, [(1, "hash join")], k=5)
    assert_no_cartesian(plan_df)
    assert_broadcast_join(plan_df)  # query-term table broadcast
    plan = explain_str(plan_df, "formatted")
    # rank<=k compiled to a group-limit pushdown, not full sort
    assert "WindowGroupLimit" in plan
    # no row-at-a-time Python anywhere in the hot path
    assert "BatchEvalPython" not in plan
    # under AQE the codegen spans only appear once the plan executes
    plan_df.collect()
    final = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "WholeStageCodegen" in final or "isFinalPlan=true" in final


def test_query_engine_scan_pruning(spark, tmp_path):
    from xml_to_es_spark.config import IndexConfig
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.operators.query_engine import QueryEngine

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(60), "text": [f"alpha beta w{i} gamma" for i in range(60)]}
        )
    )
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, IndexConfig(n_groups=4)).build(docs, idx)
    eng = QueryEngine(spark, idx)
    matched = eng._matched_segments([(1, "alpha")])
    plan = explain_str(matched)
    # group partition-dir pruning: only the query term's group scanned
    g = eng.term_groups(["alpha"])["alpha"]
    assert f"group = {g}" in plan or f"group#" in plan
    assert "PushedFilters" in plan and "term" in plan
    assert_broadcast_join(matched)


def test_mapping_stays_projection(spark):
    from pyspark.sql import Row

    from xml_to_es_spark.functions import mapping as M

    df = spark.createDataFrame([Row(S=Row(A="x"), KEEP="y")])
    out = M.apply_mapping(df, promote_spec={"s": ["a"]})
    assert "Exchange" not in explain_str(out, "simple")
