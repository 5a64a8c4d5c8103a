"""Custom stateful streaming operator via applyInPandasWithState.

The reference's progress accounting is mutable driver state
(outputDocCount/outputFileCount, Generation.js:84-85; missingID
counter, xml-to-es.js:35). In a distributed stream that becomes
keyed state: per-source running totals that survive across
micro-batches — the canonical `applyInPandasWithState` shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, batch_docs long, total_docs long, total_tokens long"
)
STATE_SCHEMA = "total_docs long, total_tokens long"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    batch_docs = 0
    batch_tokens = 0
    for pdf in pdfs:
        batch_docs += len(pdf)
        batch_tokens += int(pdf["n_tokens"].sum())
    if state.exists:
        total_docs, total_tokens = state.get
    else:
        total_docs, total_tokens = 0, 0
    total_docs += batch_docs
    total_tokens += batch_tokens
    state.update((total_docs, total_tokens))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "batch_docs": [batch_docs],
            "total_docs": [total_docs],
            "total_tokens": [total_tokens],
        }
    )


DEDUP_OUTPUT_SCHEMA = "doc_id long, text_md5 string"
DEDUP_STATE_SCHEMA = "keep_id long"


def _dedup_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    ids = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    # a content hash already admitted in an earlier micro-batch means
    # every later arrival is a duplicate — emit nothing
    if not state.exists and ids:
        keep = min(ids)
        state.update((keep,))
        yield pd.DataFrame({"doc_id": [keep], "text_md5": [key[0]]})


def streaming_exact_dedup(docs_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Cross-micro-batch EXACT dedup on arrival: the first document
    with a given text hash is emitted, every later duplicate —
    including ones arriving in a different micro-batch — is dropped.
    State is one tiny (hash → keep_id) entry per distinct text,
    partitioned by Spark's keyed state store (RocksDB-backed on a
    cluster); no driver set. Batch dedup of a static corpus is
    operators.dedup.exact_dedup — this is the crawl-pipeline shape
    (dedup the firehose before paying extraction/indexing for dups).

    State grows with the number of DISTINCT texts; bound it in a real
    deployment by sharding the stream epoch-wise and compacting with
    the batch operator."""
    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("text_md5"), F.col("doc_id")
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_source_totals(docs_stream: DataFrame) -> DataFrame:
    """Streaming input (source string, n_tokens long) → one row per
    (source, micro-batch) with running totals held in keyed state.

    At scale state is per-key and partitioned by Spark's state store
    (RocksDB/HDFS-backed on a real cluster); no driver mutation."""
    return docs_stream.groupBy("source").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
