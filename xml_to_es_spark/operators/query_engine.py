"""BM25 top-k query engine over the compressed postings index.

The capability the reference delegates to ElasticSearch's `match`
query (examples/mapping.json analyzed fields; IndexSpecPage.js:44-115
exercises it) — built from scratch per BASELINE.json: BM25 k1=1.2,
b=0.75, block-max pruned scoring over delta+varbyte postings,
rank-identical (docIDs + scores) to the pyref oracle.

Physical query plan (scale-first):
  1. query terms tokenized driver-side (queries are tiny);
  2. term dictionary read filtered by `term IN (...)` — parquet
     row-group min/max pruning (postings files are term-sorted);
  3. idf computed driver-side (a handful of floats);
  4. postings scan filtered the same way, joined to the BROADCAST
     query-term table (broadcast hash join — never a shuffle of the
     postings side);
  5. an Arrow-batched kernel decodes each matched segment (numpy) and
     emits (query_id, doc_id, contrib) — doc lengths are co-located
     in the posting (dls_bin) so scoring needs NO join to a 10^12-row
     docs table;
  6. block-max pruning: when a running score threshold is known
     (single-term queries: k-th best so far is a valid bound), blocks
     whose upper bound is below it are skipped without decoding;
  7. top-k: exact summation path groups per query and sums in the
     pinned order (term-major lexicographic, doc-major within term —
     identical to pyref, so scores are bit-equal); the distributed
     path is partial-agg sum + TakeOrderedAndProject with a final
     deterministic re-sum of the top candidates.

Tie-break doc_id ASC everywhere (mandatory for rank-identity).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_to_es_spark.config import BM25Config
from xml_to_es_spark.operators.postings import varbyte_decode
from xml_to_es_spark.pyref import idf as _idf
from xml_to_es_spark.pyref import tokenize

CONTRIB_SCHEMA = "query_id long, term string, doc_id long, contrib double"
TOPK_SCHEMA = "query_id long, rank int, doc_id long, score double"


def _score_segments(k1: float, b: float, avgdl: float):
    """mapInPandas kernel: postings segments × matched query terms →
    per-(query, doc) BM25 contributions. Fully numpy inside the Arrow
    batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_t, out_d, out_c = [], [], [], []
            for i in range(len(pdf)):
                n = int(pdf["n_docs"].iat[i])
                doc_ids = np.cumsum(
                    varbyte_decode(pdf["docs_bin"].iat[i], n).astype(np.int64)
                )
                tfs = varbyte_decode(pdf["tfs_bin"].iat[i], n).astype(np.float64)
                dls = varbyte_decode(pdf["dls_bin"].iat[i], n).astype(np.float64)
                w = float(pdf["idf"].iat[i])
                contrib = w * tfs * (k1 + 1.0) / (
                    tfs + k1 * (1.0 - b + b * dls / avgdl)
                )
                out_q.append(np.full(n, pdf["query_id"].iat[i], dtype=np.int64))
                out_t.append(np.full(n, pdf["term"].iat[i], dtype=object))
                out_d.append(doc_ids)
                out_c.append(contrib)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "term": np.concatenate(out_t),
                    "doc_id": np.concatenate(out_d),
                    "contrib": np.concatenate(out_c),
                }
            )

    return run


def _topk_reduce(k: int):
    """applyInPandas per query: pinned-order summation (sort by term
    then doc_id → per-doc addition happens term-major, matching
    pyref), then top-k by (-score, doc_id)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "score": []}
            )
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        contribs = pdf["contrib"].to_numpy(dtype=np.float64)
        uniq, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(uniq.shape, dtype=np.float64)
        # np.add.at accumulates in array order = term-major (pinned)
        np.add.at(scores, inv, contribs)
        order = np.lexsort((uniq, -scores))[:k]
        return pd.DataFrame(
            {
                "query_id": np.full(len(order), pdf["query_id"].iat[0], dtype=np.int64),
                "rank": np.arange(1, len(order) + 1, dtype=np.int32),
                "doc_id": uniq[order],
                "score": scores[order],
            }
        )

    return run


class QueryEngine:
    """Top-k BM25 retrieval over an index directory produced by
    :class:`~xml_to_es_spark.operators.index_build.IndexBuilder`."""

    def __init__(self, spark: SparkSession, index_dir: str, cfg: BM25Config | None = None):
        self.spark = spark
        self.dir = index_dir
        self.cfg = cfg or BM25Config()
        st = spark.read.parquet(f"{index_dir}/stats").first()
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"])
        d = st.asDict()
        self.block_size = int(d.get("block_size") or 128)
        self.n_groups = int(d.get("n_groups") or 0)
        self.min_doc = int(d.get("min_doc") or 0)
        self.max_doc = int(d.get("max_doc") or 0)

    # -- term metadata -----------------------------------------------------

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (df, group), via a term-pruned scan of the terms
        dictionary (term-sorted files → parquet min/max row-group
        pruning). The group partition column rides along for free and
        drives partition-DIRECTORY pruning of the much larger postings
        scan — no extra job to recompute the build's term hash."""
        if not terms:
            return {}
        rows = (
            self.spark.read.parquet(f"{self.dir}/terms")
            .filter(F.col("term").isin(terms))
            .select("term", "df", "group")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["group"])) for r in rows}

    def term_groups(self, terms: list[str]) -> dict[str, int]:
        return {t: g for t, (df, g) in self.term_stats(terms).items()}

    def _pruned_postings(self, stats: dict[str, tuple[int, int]]) -> DataFrame:
        df = self.spark.read.parquet(f"{self.dir}/postings")
        groups = sorted({g for _, g in stats.values()})
        if groups:
            df = df.filter(F.col("group").isin(groups))
        return df.filter(F.col("term").isin(list(stats)))

    # -- query -------------------------------------------------------------

    def topk(self, queries: list[tuple[int, str]], k: int = 10) -> DataFrame:
        """Batch top-k. ``queries`` = [(query_id, text)].

        Returns DataFrame(query_id, rank, doc_id, score) with the
        pinned deterministic summation order (rank-identical and
        score-bit-equal to pyref).
        """
        matched = self._matched_segments(queries)
        if matched is None:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        contribs = matched.mapInPandas(
            _score_segments(self.cfg.k1, self.cfg.b, self.avgdl),
            schema=CONTRIB_SCHEMA,
        )
        return contribs.groupBy("query_id").applyInPandas(
            _topk_reduce(k), schema=TOPK_SCHEMA
        )

    def topk_wand(
        self, queries: list[tuple[int, str]], k: int = 10, n_ranges: int | None = None
    ) -> DataFrame:
        """Block-max WAND path: doc-at-a-time evaluation skipping
        blocks whose upper bound cannot beat the running threshold —
        skipped blocks are never decompressed. Rank-identical to
        topk().

        ``n_ranges=None``: one task per query (fine for query batches).
        ``n_ranges=R``: the SCALE path — the doc_id space is split into
        R ranges and WAND runs per (query, range): a Zipf-head term's
        10^11-entry posting list is scored by R tasks instead of one.
        Segments are range-pruned before the shuffle via their
        (first_doc, last block_last_doc) span, so a salted hot term
        ships only ~1/R of its bytes to each task. Per-doc scores are
        complete within a range (ranges partition doc_ids), so the
        global top-k is a WindowGroupLimit merge of the R local top-k
        lists — no re-summation, bit-equal scores."""
        matched = self._matched_segments(queries)
        if matched is None:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        if n_ranges and n_ranges > 1:
            partials = self._wand_partials(matched, k, n_ranges)
            from pyspark.sql import Window as W

            w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
            return (
                partials.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "doc_id", "score")
            )
        run = self._wand_group_kernel(k)
        return matched.groupBy("query_id").applyInPandas(run, schema=TOPK_SCHEMA)

    def _wand_group_kernel(self, k: int, ranged: bool = False):
        """applyInPandas kernel: one (query[, range]) group → local
        block-max WAND top-k over that group's segments."""
        k1, b, avgdl, bs = self.cfg.k1, self.cfg.b, self.avgdl, self.block_size

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            from xml_to_es_spark.operators.wand import wand_topk

            entries: dict[str, dict] = {}
            for r in pdf.itertuples(index=False):
                e = entries.setdefault(
                    r.term, {"term": r.term, "idf": float(r.idf), "segments": []}
                )
                e["segments"].append(
                    {
                        "salt": int(r.salt),
                        "n_docs": int(r.n_docs),
                        "block_last_doc": list(r.block_last_doc),
                        "block_max_tf": list(r.block_max_tf),
                        "block_min_dl": list(r.block_min_dl),
                        "block_doc_off": list(r.block_doc_off),
                        "block_tf_off": list(r.block_tf_off),
                        "block_dl_off": list(r.block_dl_off),
                        "docs_bin": r.docs_bin,
                        "tfs_bin": r.tfs_bin,
                        "dls_bin": r.dls_bin,
                    }
                )
            lo = int(pdf["range_lo"].iat[0]) if ranged else None
            hi = int(pdf["range_hi"].iat[0]) if ranged else None
            hits = wand_topk(
                list(entries.values()), k, k1, b, avgdl, bs, doc_lo=lo, doc_hi=hi
            )
            qid = int(pdf["query_id"].iat[0])
            out = {
                "query_id": np.full(len(hits), qid, dtype=np.int64),
                "rank": np.arange(1, len(hits) + 1, dtype=np.int32),
                "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
                "score": np.array([s for _, s in hits], dtype=np.float64),
            }
            if ranged:
                out["range_id"] = np.full(
                    len(hits), int(pdf["range_id"].iat[0]), dtype=np.int32
                )
            return pd.DataFrame(out)

        return run

    def _doc_ranges(self, n_ranges: int) -> list[tuple[int, int, int]]:
        """(range_id, lo, hi_exclusive) splits of [min_doc, max_doc] —
        disjoint and covering, any int64 id domain."""
        lo, hi = self.min_doc, self.max_doc + 1
        span = hi - lo
        edges = [lo + (span * r) // n_ranges for r in range(n_ranges)] + [hi]
        return [
            (r, edges[r], edges[r + 1])
            for r in range(n_ranges)
            if edges[r] < edges[r + 1]
        ]

    def _wand_partials(self, matched: DataFrame, k: int, n_ranges: int) -> DataFrame:
        """Per-(query, range) local WAND top-k rows (pre-merge). The
        broadcast range table joins on segment-span overlap, so a
        segment's bytes only reach the ranges its docs can fall in."""
        ranges = self.spark.createDataFrame(
            self._doc_ranges(n_ranges), schema="range_id int, range_lo long, range_hi long"
        )
        seg_last = F.element_at("block_last_doc", -1)
        ranged = matched.join(
            F.broadcast(ranges),
            (F.col("first_doc") < F.col("range_hi")) & (seg_last >= F.col("range_lo")),
        )
        run = self._wand_group_kernel(k, ranged=True)
        return ranged.groupBy("query_id", "range_id").applyInPandas(
            run, schema=TOPK_SCHEMA + ", range_id int"
        )

    def _matched_segments(self, queries: list[tuple[int, str]]) -> DataFrame | None:
        """Shared front half: postings segments term-pruned and joined
        to the broadcast (query_id, term, idf) table."""
        qterms = []
        for qid, text in queries:
            for t in sorted(set(tokenize(text))):
                qterms.append((qid, t))
        if not qterms:
            return None
        stats = self.term_stats(sorted({t for _, t in qterms}))
        present = [
            (qid, t, _idf(self.n_docs, stats[t][0]))
            for qid, t in qterms
            if t in stats
        ]
        if not present:
            return None
        qdf = self.spark.createDataFrame(
            present, schema="query_id long, term string, idf double"
        )
        return self._pruned_postings(stats).join(F.broadcast(qdf), "term")

    def topk_distributed(self, queries: list[tuple[int, str]], k: int = 10) -> DataFrame:
        """Scale path: JVM partial-agg sum of contributions +
        TakeOrderedAndProject per query (window row_number). Summation
        order is engine-chosen (float64 last-ulp may differ from the
        pinned order); ranks agree except on exact-tie knife edges,
        which the deterministic path resolves — use this for
        throughput, topk() for rank-audits."""
        from pyspark.sql import Window as W

        matched = self._matched_segments(queries)
        if matched is None:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        contribs = matched.mapInPandas(
            _score_segments(self.cfg.k1, self.cfg.b, self.avgdl),
            schema=CONTRIB_SCHEMA,
        )
        scored = contribs.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score")
        )
        w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )


# ---------------------------------------------------------------------------
# Pure-DataFrame BM25 (no codec) — the ANSI-SQL-expressible twin used
# for the DuckDB oracle contract and as a cross-check of the codec path.
# ---------------------------------------------------------------------------


def bm25_topk_dataframe(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    cfg: BM25Config | None = None,
    score_decimals: int | None = 6,
) -> DataFrame:
    """BM25 top-k composed purely of built-in DataFrame ops over
    (doc_id, text): tokenize → tf → df → score → window top-k. Every
    step is whole-stage-codegen'd JVM; Catalyst handles partial aggs
    and the broadcast of the tiny query-term table."""
    cfg = cfg or BM25Config()
    spark = docs.sparkSession
    from xml_to_es_spark.functions.analysis import doc_len_col, tokens_col

    toks = docs.select(
        "doc_id", tokens_col("text").alias("toks")
    ).withColumn("dl", doc_len_col("toks"))
    stats = toks.select(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n, avgdl = int(stats["n"]), float(stats["avgdl"])

    qrows = []
    for qid, text in queries:
        for t in sorted(set(tokenize(text))):
            qrows.append((qid, t))
    qdf = spark.createDataFrame(qrows, schema="query_id long, term string")

    tf = (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(qdf.select("term").distinct()), "term")  # prune early
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qdf), "term")
        .withColumn(
            "contrib",
            F.log(1.0 + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf") * (cfg.k1 + 1.0)
            / (F.col("tf") + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score_raw"))
    )
    from pyspark.sql import Window as W

    score = (
        F.round(F.col("score_raw"), score_decimals)
        if score_decimals is not None
        else F.col("score_raw")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score_raw"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            score.alias("score"),
        )
    )


def bm25_idf(n: int, df: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))
