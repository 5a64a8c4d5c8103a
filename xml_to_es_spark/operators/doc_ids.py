"""Deterministic doc_id assignment: doc_id = rank of the document's
key in the global sort order (0-based).

The reference assigns ids serially (missingID counter,
xml-to-es.js:35/276) — order-dependent by construction. At cluster
scale a global window `row_number() OVER (ORDER BY key)` funnels
everything through ONE partition, so the scale path is:

  sort by key (range exchange) → persist → per-partition counts →
  driver-side cumulative offsets (P integers) → broadcast join →
  row_number within partition + offset.

Determinism argument: the global sort order over unique keys is a
total order, so each key's global rank is unique and independent of
where Spark's range partitioner happens to draw boundaries — the
cumulative offsets always add back to the same rank. (The persist
pins one boundary sample so the count job and the final job agree.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from xml_to_es_spark.session import local_rows_df
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def assign_doc_ids(
    df: DataFrame,
    key: str = "url",
    out_col: str = "doc_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = global 0-based rank of ``key``. Keys must be
    unique (doc identity — reference requires non-empty unique id,
    ElasticIndexer.js:69-73) — OR pass ``tiebreak`` (a unique column)
    to extend the sort into a total order: with duplicate keys and no
    tiebreak, equal keys may straddle range-partition boundaries and
    their relative ranks become run-dependent."""
    order = [key] + ([tiebreak] if tiebreak else [])
    sdf = df.sort(*order).withColumn("_pid", F.spark_partition_id()).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in sdf.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    omap = local_rows_df(spark, 
        [(int(p), int(o)) for p, o in offsets.items()], schema="_pid int, _off long"
    )
    w = W.partitionBy("_pid").orderBy(*order)
    out = (
        sdf.join(F.broadcast(omap), "_pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("_off") - 1)
        .drop("_pid", "_off")
    )
    return out
