"""Structured-Streaming incremental indexing.

The reference is a bounded stream with backpressure
(pause()/resume(), xml-to-es.js:523,581,608) — plain batch in Spark.
This module adds the genuinely-streaming capability its ES usage
implies (documents PUT as they arrive, ElasticIndexer.js:68-97):
new pages micro-batched via ``foreachBatch`` into per-batch posting
DELTA segments. A delta segment is just another salt dimension:
(term, salt, batch_id) segments concatenate like salt segments do,
and the query engine reads base + deltas transparently because it
only requires per-segment sorted doc_ids.

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
    """readStream(pages) → foreachBatch(index delta build).

    Each micro-batch builds compressed postings for ITS docs only and
    appends them under postings/delta_batch=<id>; stats/docs are
    appended too. Exactly-once: foreachBatch + idempotent per-batch
    output paths (re-run of a batch overwrites its own directory).
    """
    cfg = cfg or IndexConfig(n_groups=1)

    def handle(batch_df: DataFrame, batch_id: int):
        docs = batch_df.select("doc_id", "text")
        if docs.isEmpty():
            return
        b = IndexBuilder(spark, cfg)
        b.build(docs, f"{out_dir}/delta_batch={batch_id}")

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
