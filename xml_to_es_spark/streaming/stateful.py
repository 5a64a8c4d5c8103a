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
