"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k per query vector, the
  correctness baseline. JVM-side dot product (zip_with + aggregate);
  broadcast of the (small) query set; TakeOrderedAndProject per query.
- :func:`lsh_buckets` / :func:`ann_topk_lsh` — the scale path: random
  hyperplane (sign) LSH with a deterministic seed; candidates only
  from matching buckets (multi-probe via table count), then exact
  re-rank. At 10^12 vectors the bucket key is the shuffle key and no
  pair of buckets ever cross-joins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm(vec_col: str):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    q_key: str = "query_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus;
    per-query ranking via row_number (TakeOrderedAndProject shape).
    Returns (query_id, rank, vec_id, cosine)."""
    from pyspark.sql import Window as W

    base = emb.select(F.col(key_col), F.col(vec_col), _norm(vec_col).alias("nrm"))
    q = queries.select(
        F.col(q_key), F.col(q_vec), _norm(q_vec).alias("qnrm")
    )
    scored = base.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.round(_dot(F.col(vec_col), F.col(q_vec)) / (F.col("nrm") * F.col("qnrm")), 6),
    )
    w = W.partitionBy(q_key).orderBy(F.desc("cosine"), F.asc(key_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_key, F.col("rank").cast("long").alias("rank"), key_col, "cosine")
    )


def projection_matrix(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (the LSH 'model')."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def lsh_buckets(
    emb: DataFrame,
    planes: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id per vector, computed by a vectorized Arrow
    kernel (one matmul per batch)."""
    from collections.abc import Iterator

    import pandas as pd

    P = planes  # captured; shipped once per task via closure pickle

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy())  # (n, dim)
            signs = (M @ P.T) > 0  # (n, planes)
            bucket = signs @ (1 << np.arange(P.shape[0], dtype=np.int64))
            yield pd.DataFrame({key_col: pdf[key_col], "bucket": bucket.astype(np.int64)})

    return emb.select(key_col, vec_col).mapInPandas(
        run, schema=f"{key_col} long, bucket long"
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
    sample: int = 4096,
    key_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic mini-kmeans for IVF coarse quantization. The
    model is tiny (k × dim floats), so Lloyd iterations run in numpy
    on a deterministic sample — at 10^12 vectors you train on a
    sample anyway; only ASSIGNMENT is distributed. The sample is
    pinned by a key-ordered TakeOrderedAndProject (a bare limit()'s
    row choice is partition-order-dependent on a real cluster)."""
    pdf = emb.orderBy(key_col).limit(sample).select(vec_col).toPandas()
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell id per vector (vectorized Arrow kernel,
    one matmul per batch). The cell id is the IVF shuffle/storage key."""
    from collections.abc import Iterator

    import pandas as pd

    C = centroids
    Cn = (C**2).sum(axis=1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = Cn[None, :] - 2.0 * (M @ C.T)  # ||c||² - 2x·c (+‖x‖² const)
            yield pd.DataFrame(
                {key_col: pdf[key_col], "cell": d.argmin(axis=1).astype(np.int32)}
            )

    return emb.select(key_col, vec_col).mapInPandas(
        run, schema=f"{key_col} long, cell int"
    )


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    q_key: str = "query_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """IVF search: candidates come only from each query's ``nprobe``
    nearest centroid cells, then exact cosine re-rank. At scale the
    corpus is stored partitioned by cell, so a query touches nprobe/k
    of the data; the probe list is computed driver-side (tiny) and
    broadcast."""
    from pyspark.sql import Window as W

    base = ivf_assign(emb, centroids, key_col, vec_col).join(emb, key_col)
    qp = queries.toPandas()
    Q = np.stack(qp[q_vec].to_numpy()).astype(np.float64)
    d = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d, axis=1)[:, :nprobe]
    probe_rows = [
        (int(qp[q_key].iat[i]), int(c)) for i in range(len(qp)) for c in probes[i]
    ]
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probe_rows, schema=f"{q_key} long, cell int")
    q = queries.join(probe_df, q_key)
    cand = base.join(F.broadcast(q), "cell").withColumn(
        "cosine",
        F.round(_dot(F.col(vec_col), F.col(q_vec)) / (_norm(vec_col) * _norm(q_vec)), 6),
    )
    w = W.partitionBy(q_key).orderBy(F.desc("cosine"), F.asc(key_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_key, F.col("rank").cast("long").alias("rank"), key_col, "cosine")
    )


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    q_key: str = "query_id",
    q_vec: str = "q_vec",
    probe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket (or
    any bucket within Hamming distance ``probe_bits`` — multi-probe),
    then exact cosine re-rank. Recall/latency knob = n_planes ×
    probe_bits."""
    from pyspark.sql import Window as W

    n_planes = planes.shape[0]
    base = lsh_buckets(emb, planes, key_col, vec_col).join(emb, key_col)
    qb = lsh_buckets(
        queries.withColumnRenamed(q_vec, vec_col).withColumnRenamed(q_key, key_col),
        planes, key_col, vec_col,
    ).withColumnRenamed(key_col, q_key).withColumnRenamed("bucket", "q_bucket")
    q = queries.join(qb, q_key)
    # multi-probe: expand each query to its bucket + single-bit flips
    probes = [F.col("q_bucket")]
    if probe_bits >= 1:
        probes += [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
    q = q.withColumn("probe", F.explode(F.array(*probes)))
    cand = base.join(
        F.broadcast(q), F.col("bucket") == F.col("probe")
    ).withColumn(
        "cosine",
        F.round(
            _dot(F.col(vec_col), F.col(q_vec))
            / (_norm(vec_col) * _norm(q_vec)),
            6,
        ),
    )
    w = W.partitionBy(q_key).orderBy(F.desc("cosine"), F.asc(key_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_key, F.col("rank").cast("long").alias("rank"), key_col, "cosine")
    )
