"""Structured-Streaming incremental indexing.

The reference is a bounded stream with backpressure
(pause()/resume(), xml-to-es.js:523,581,608) — plain batch in Spark.
This module adds the genuinely-streaming capability its ES usage
implies (documents PUT as they arrive, ElasticIndexer.js:68-97):
micro-batches are folded into the index via
:meth:`IndexBuilder.upsert` — the first non-empty batch builds the
base, every later batch becomes a self-contained DELTA index under
``out_dir/deltas/delta=<ord>`` plus tombstones for updated docs.
``QueryEngine(out_dir)`` reads base + deltas + tombstones
transparently with corpus-wide (not per-batch) BM25 statistics, so
streamed and batch-built indexes rank identically
(tests/test_streaming.py, tests/test_upsert.py).

Exactly-once: foreachBatch + content-hash change detection — a
replayed batch finds every doc unchanged and becomes a no-op.

Also: windowed crawl-rate metrics with a watermark, the
orthodox late-data pattern over `events`-shaped streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder


def incremental_index_query(
    spark: SparkSession,
    pages_stream: DataFrame,
    out_dir: str,
    cfg: IndexConfig | None = None,
    checkpoint: str | None = None,
):
    """readStream(pages) → foreachBatch(upsert into one logical index).

    Returns the writeStream builder (caller starts/stops it).

    ``cfg`` shapes the FIRST batch's base build only; every later
    micro-batch inherits the stored mapping (fields, positional
    sidecar, stored source) from the index itself via
    :meth:`IndexBuilder._resolved_cfg` — so streaming into an index
    built elsewhere can never silently drop its sidecar or source."""
    cfg = cfg or IndexConfig(n_groups=1)

    def handle(batch_df: DataFrame, batch_id: int):
        docs = batch_df.select("doc_id", "text")
        if docs.isEmpty():
            return
        IndexBuilder(spark, cfg).upsert(docs, out_dir)

    writer = pages_stream.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def crawl_rate_metrics(events: DataFrame, window: str = "5 minutes", slide: str = "1 minute") -> DataFrame:
    """Watermarked windowed agg over a (ts, event_type, value) stream:
    the progress-callback metrics surface (reference progressCallback,
    xml-to-es.js:452,485) as a streaming table."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
