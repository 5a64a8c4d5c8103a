"""Structured Streaming: incremental index deltas via foreachBatch and
watermarked windowed metrics, driven synchronously with the memory
sink / processAllAvailable pattern."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.query_engine import QueryEngine
from xml_to_es_spark.streaming.incremental import (
    crawl_rate_metrics,
    incremental_index_query,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_incremental_index_foreachbatch(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    out = str(tmp_path / "inc_index")
    ck = str(tmp_path / "ck")

    batch1 = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["spark shuffle join", "hash join batch"]}
    )
    spark.createDataFrame(batch1, DOCS_SCHEMA).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(str(src))
    q = incremental_index_query(
        spark, stream, out, IndexConfig(n_groups=1), checkpoint=ck
    ).start()
    q.processAllAvailable()

    # batch 2: one NEW doc + one UPDATE of doc 1 (re-crawl)
    batch2 = pd.DataFrame(
        {"doc_id": [2, 1], "text": ["window agg stream join", "hash rewrite nochange"]}
    )
    spark.createDataFrame(batch2, DOCS_SCHEMA).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()

    import glob

    # batch 1 = base build; batch 2 = delta + tombstone for doc 1
    assert glob.glob(f"{out}/deltas/delta=*")
    # tombstones are STAGED inside the committed delta dir (atomic
    # with its commit marker), not in a shared root log
    assert glob.glob(f"{out}/deltas/delta=*/tombstones/*")
    # ONE logical index over base + deltas, corpus-wide stats
    eng = QueryEngine(spark, out)
    assert eng.n_docs == 3
    res = eng.topk([(1, "join")], k=10).collect()
    # doc 1's updated text no longer contains "join" — its old version
    # must be invisible
    assert {r["doc_id"] for r in res} == {0, 2}
    res2 = eng.topk([(2, "rewrite")], k=10).collect()
    assert {r["doc_id"] for r in res2} == {1}


def test_stateful_running_totals(spark, tmp_path):
    from xml_to_es_spark.streaming.stateful import running_source_totals

    src = tmp_path / "st_src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    b1 = pd.DataFrame({"source": ["a", "a", "b"], "n_tokens": [10, 20, 5]})
    spark.createDataFrame(b1, schema).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        running_source_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(tmp_path / "st_ck"))
        .start()
    )
    q.processAllAvailable()
    b2 = pd.DataFrame({"source": ["a"], "n_tokens": [7]})
    spark.createDataFrame(b2, schema).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from totals").collect()
    a_rows = sorted(
        [r for r in rows if r["source"] == "a"], key=lambda r: r["total_docs"]
    )
    # state carried across micro-batches: totals accumulate
    assert a_rows[-1]["total_docs"] == 3 and a_rows[-1]["total_tokens"] == 37
    b_rows = [r for r in rows if r["source"] == "b"]
    assert b_rows[-1]["total_tokens"] == 5


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from xml_to_es_spark.streaming.stateful import streaming_exact_dedup

    src = tmp_path / "dd_src"
    src.mkdir()
    b1 = pd.DataFrame(
        {"doc_id": [10, 11, 12], "text": ["aaa", "bbb", "aaa"]}  # in-batch dup
    )
    spark.createDataFrame(b1, DOCS_SCHEMA).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(str(src))
    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .start()
    )
    q.processAllAvailable()
    # cross-batch dup of "aaa"/"bbb" + one genuinely new text
    b2 = pd.DataFrame({"doc_id": [13, 14], "text": ["aaa", "ccc"]})
    spark.createDataFrame(b2, DOCS_SCHEMA).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from dedup_stream").collect()
    kept = {r["doc_id"] for r in rows}
    # first occurrence per text only: 10 ("aaa", min of 10/12), 11, 14
    assert kept == {10, 11, 14}


def test_crawl_rate_metrics_watermarked(spark, tmp_path):
    src = tmp_path / "ev_src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:30", "2026-01-01 00:01:30", "2026-01-01 00:01:45"]
            ),
            "event_type": ["fetch", "fetch", "parse"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    spark.createDataFrame(pdf, schema).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = crawl_rate_metrics(stream, window="1 minute", slide="1 minute")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("rates")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from rates").collect()
    assert len(rows) >= 2
    fetched = [r for r in rows if r["event_type"] == "fetch"]
    assert sum(r["n"] for r in fetched) == 2
