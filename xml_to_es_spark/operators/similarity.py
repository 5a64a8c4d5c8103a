"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k per query vector, the
  correctness baseline. JVM-side dot product (zip_with + aggregate);
  broadcast of the (small) query set; TakeOrderedAndProject per query.
- :func:`lsh_buckets` / :func:`ann_topk_lsh` — the scale path: random
  hyperplane (sign) LSH with a deterministic seed; candidates only
  from matching buckets (multi-probe via single-bit flips), then exact
  re-rank. At 10^12 vectors the bucket key is the shuffle key and no
  pair of buckets ever cross-joins.
- :func:`ivf_assign` / :func:`ann_topk_ivf` — IVF coarse quantization:
  nearest-centroid cell per vector; a query probes only its ``nprobe``
  nearest cells.

All model applications (LSH signs, IVF assignment, probe selection)
are pure Catalyst expressions over LITERAL model vectors — whole-stage
codegen'd JVM, no Python in the hot path, and every float is produced
by a left-fold sum so the DuckDB oracle can reproduce it bit-exactly
with an explicit left-associated ``v[1]*p1 + v[2]*p2 + …`` chain
(DuckDB's ``list_inner_product`` uses a different summation order, so
sign tests would not be reproducible through it).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from xml_to_es_spark.session import local_rows_df
from pyspark.sql import functions as F


def _norm(vec_col: str):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _as_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_literal(vec_col, vals) -> Column:
    """Left-fold dot product of a vector column against a LITERAL
    vector: (((0 + v0*p0) + v1*p1) + …). Bit-identical to the same
    left-associated sum chain in any engine — the oracle contract for
    every sign/argmin decision below."""
    lit = F.array(*[F.lit(float(x)) for x in vals])
    return F.aggregate(
        F.zip_with(_as_col(vec_col), lit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_dot_chain(vec_expr: str, vals) -> str:
    """The DuckDB-side twin of :func:`dot_literal`: an explicit
    left-associated product chain (1-based list indexing)."""
    return " + ".join(f"{vec_expr}[{i + 1}]*({float(v)!r})" for i, v in enumerate(vals))


def projection_matrix(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (the LSH 'model')."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def bucket_col(vec_col, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: bit j set iff vec · planes[j] > 0.
    Pure column expression (codegen'd; literal planes ship in the
    plan, not via Python closures)."""
    b = F.lit(0).cast("long")
    for j in range(len(planes)):
        b = b + F.when(
            dot_literal(vec_col, planes[j]) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return b


def lsh_buckets(
    emb: DataFrame,
    planes: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(key, bucket) per vector — see :func:`bucket_col`."""
    return emb.select(F.col(key_col), bucket_col(vec_col, planes).alias("bucket"))


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


# ---------------------------------------------------------------------------
# IVF coarse quantization
# ---------------------------------------------------------------------------


def fixed_centroids(dim: int, k: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic data-independent centroids (seeded gaussians).
    Gives worse cell balance than trained centroids but identical
    search machinery — and, being a pure constant, the whole IVF path
    (assignment, probe ranking, re-rank) is reproducible in the DuckDB
    oracle as literals. Use :func:`kmeans_centroids` when balance
    matters more than oracle-ability."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(k, dim)).astype(np.float64)


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


def cell_col(vec_col, centroids: np.ndarray) -> Column:
    """Nearest-centroid cell id as a column expression: per centroid
    the monotone distance surrogate ||c||² − 2·(v·c) (the +||v||²
    constant cancels in argmin), argmin with ties to the LOWEST index
    (array_position finds the first occurrence — same contract as
    DuckDB's list_position)."""
    dists = F.array(
        *[
            F.lit(float((c * c).sum())) - 2.0 * dot_literal(vec_col, c)
            for c in centroids
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(key, cell) per vector — see :func:`cell_col`. The cell id is
    the IVF shuffle/storage key."""
    return emb.select(F.col(key_col), cell_col(vec_col, centroids).alias("cell"))


def query_probes(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    q_key: str = "query_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """(query_id, cell) rows for each query's ``nprobe`` nearest cells,
    ranked by the same distance surrogate as :func:`cell_col` with
    ties to the lowest cell — computed distributed (no driver
    collect), reproducible in SQL."""
    from pyspark.sql import Window as W

    dists = F.array(
        *[
            F.lit(float((c * c).sum())) - 2.0 * dot_literal(q_vec, c)
            for c in centroids
        ]
    )
    exploded = queries.select(
        F.col(q_key), F.posexplode(dists).alias("cell", "dist")
    )
    w = W.partitionBy(q_key).orderBy(F.asc("dist"), F.asc("cell"))
    return (
        exploded.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= nprobe)
        .select(q_key, F.col("cell").cast("int").alias("cell"))
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
    of the data; the (query, cell) probe table is tiny and broadcast.
    The vector rides through the cell assignment as a column — no
    re-join of the corpus table."""
    from pyspark.sql import Window as W

    base = emb.select(
        F.col(key_col), F.col(vec_col), cell_col(vec_col, centroids).alias("cell")
    )
    probe_df = query_probes(queries, centroids, nprobe, q_key, q_vec)
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


def build_ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus PARTITIONED BY IVF cell (the on-disk
    layout a 10^12-vector corpus should live in): a query then reads
    only its nprobe cell directories — partition-directory pruning,
    ~nprobe/k of the data touched, asserted in test_plans."""
    emb.select(
        F.col(key_col), F.col(vec_col), cell_col(vec_col, centroids).alias("cell")
    ).write.mode("overwrite").partitionBy("cell").parquet(path)


def ann_topk_ivf_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    q_key: str = "query_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """IVF search over a :func:`build_ivf_index` layout. The probe
    cell list (queries × nprobe rows — tiny) is collected and becomes
    a LITERAL ``cell IN (...)`` partition filter, so unprobed cell
    directories are never opened; candidates then join the broadcast
    (query, cell) table and re-rank by exact cosine."""
    from pyspark.sql import Window as W

    probe_df = query_probes(queries, centroids, nprobe, q_key, q_vec)
    probe_rows = probe_df.collect()
    cells = sorted({int(r["cell"]) for r in probe_rows})
    base = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    q = queries.join(
        local_rows_df(spark, probe_rows, schema=f"{q_key} long, cell int"), q_key
    )
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
    probe_bits. The bucket rides through as a column expression — no
    re-join of the corpus table."""
    from pyspark.sql import Window as W

    n_planes = planes.shape[0]
    base = emb.select(
        F.col(key_col), F.col(vec_col), bucket_col(vec_col, planes).alias("bucket")
    )
    q = queries.select(
        F.col(q_key), F.col(q_vec), bucket_col(q_vec, planes).alias("q_bucket")
    )
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
