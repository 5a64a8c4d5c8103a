"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Extra keys (informational): index_docs_per_sec, n_docs.
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from xml_to_es_spark.config import IndexConfig
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.operators.query_engine import QueryEngine
    from xml_to_es_spark.session import get_spark

    spark = get_spark(app="bench", cores=CPUS, shuffle_partitions=CPUS)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )
    n_docs = docs.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # 1. full inverted-index build (tokenize → salted varbyte postings)
    idx_dir = tempfile.mkdtemp(prefix="bench_idx_") + "/index"
    cfg = IndexConfig(n_groups=4, salt_threshold=2000, n_salts=8)
    timed("index_build", lambda: IndexBuilder(spark, cfg).build(docs, idx_dir))

    # 2. BM25 top-10 over the compressed postings (batch of 6 queries)
    eng = QueryEngine(spark, idx_dir)
    timed(
        "bm25_codec_topk",
        lambda: eng.topk_distributed(entry.BM25_QUERIES, k=10).collect(),
    )
    # 2b. the flagship scale path: distributed block-max WAND
    # (per doc-range local top-k, global WindowGroupLimit merge)
    timed(
        "bm25_wand_topk",
        lambda: eng.topk_wand(entry.BM25_QUERIES, k=10, n_ranges=8).collect(),
    )
    # p50-ish single-query latency: median of the query set, one at a time
    lat = []
    for q in entry.BM25_QUERIES:
        t0 = time.time()
        eng.topk_distributed([q], k=10).collect()
        lat.append(time.time() - t0)
    timings["bm25_single_query_p50"] = round(sorted(lat)[len(lat) // 2], 3)

    # 3. pure-DataFrame BM25 (the SQL-expressible twin)
    from xml_to_es_spark.operators.query_engine import bm25_topk_dataframe

    timed(
        "bm25_dataframe",
        lambda: bm25_topk_dataframe(docs, entry.BM25_QUERIES, k=10).collect(),
    )

    # 4. HTML extraction throughput (Arrow UDF over synthesized pages)
    from xml_to_es_spark.functions.extract import extract_fields

    pages = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<HTML><head></head><body>"), F.col("text"), F.lit("</body></HTML>")),
            "UTF-8",
        ).alias("html"),
        F.col("lang"),
    )
    timed("extract_fields", lambda: extract_fields(pages).count())

    # 5. dedup: MinHash-LSH candidate pairs
    from xml_to_es_spark.operators.dedup import minhash_lsh_pairs

    # band_size=8: the sf corpus has a ~31-word vocabulary, so docs are
    # genuinely similar — 4-row bands would make candidate pairs explode
    # (that is LSH semantics, not engine cost); 8-row bands keep the
    # candidate set at the intended near-dup level
    full_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(full_docs, n_perm=16, band_size=8).count(),
    )

    # 6. ANN: brute-force cosine top-10 for 5 query vectors
    from xml_to_es_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    timed("ann_cosine_topk", lambda: cosine_topk(emb, q, k=10).collect())

    # 7. text-quality scan (lang id + quality + fingerprint, one pass)
    from xml_to_es_spark.functions.text_quality import (
        fingerprint,
        lang_id,
        quality_score,
    )

    timed(
        "text_quality_scan",
        lambda: full_docs.select(
            "doc_id", lang_id("text").alias("l"), quality_score("text").alias("q"),
            fingerprint("text").alias("f"),
        ).count(),
    )

    # ---- round-3 additions (reported separately: r2_comparable_total
    # excludes them so per-round walls stay comparable) ----
    new_in_r3 = [
        "fielded_index_build", "bm25_title_topk", "multi_match_topk",
        "phrase_stopword_topk", "bm25_page2_topk", "bm25_bool_topk",
    ]

    # 8. fielded + positional index (title = first 4 tokens, the
    # two-analyzed-fields ES mapping) — one build serves 9-11
    fidx_dir = tempfile.mkdtemp(prefix="bench_fidx_") + "/index"
    fdocs = entry._fielded_docs(spark, SF_DIR).persist()
    fdocs.count()
    fcfg = IndexConfig(
        n_groups=4, salt_threshold=2000, n_salts=8,
        indexed_fields=("text", "title"), store_positions=True,
    )
    timed(
        "fielded_index_build", lambda: IndexBuilder(spark, fcfg).build(fdocs, fidx_dir)
    )
    feng = QueryEngine(spark, fidx_dir)
    # 9. per-field match + multi_match best_fields
    timed(
        "bm25_title_topk",
        lambda: feng.topk_wand(
            entry.BM25_QUERIES, k=10, n_ranges=8, field="title"
        ).collect(),
    )
    timed(
        "multi_match_topk",
        lambda: feng.multi_match(
            entry.BM25_QUERIES, k=10, fields=["text", "title"], n_ranges=8
        ).collect(),
    )
    # 10. stopword-heavy phrase: both terms are Zipf-head (massive
    # candidate intersection) — exercises the vectorized
    # shift-and-intersect adjacency kernel, which must stay batch-bound
    timed(
        "phrase_stopword_topk",
        lambda: feng.phrase_topk(
            [(1, "a the"), (2, "the a"), (3, "table value")],
            k=10, n_ranges=8, field="text",
        ).collect(),
    )
    # 11. ES pagination: page 2 (from=10) of the WAND ranking
    timed(
        "bm25_page2_topk",
        lambda: eng.topk_wand(
            entry.BM25_QUERIES, k=10, n_ranges=8, from_=10
        ).collect(),
    )
    # 12. ES bool query: all four occurrence types in one pruned scan
    timed(
        "bm25_bool_topk",
        lambda: eng.bool_topk(entry.BOOL_QUERIES, k=10).collect(),
    )
    # ---- round-4 additions (also excluded from r2_comparable) ----
    new_in_r4 = [
        "bm25_bool_range_topk", "bm25_phrase_slop_topk", "bm25_cursor_topk",
        "bm25_sort_chars_topk", "search_aggs_date_histogram",
        "multi_match_boosted_topk", "bm25_prefix_1char_topk",
    ]
    # doc-values projection passed explicitly so the MAIN index build
    # stays byte-comparable with earlier rounds (no extra stored cols)
    dv = full_docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.timestamp_seconds(
            F.lit(1704067200)
            + (F.col("doc_id") % 37) * 86400
            + (F.col("doc_id") * 7919) % 86400
        ).alias("warc_ts"),
    ).persist()
    dv.count()
    # 13. bool + structured filter context (term/terms/range on doc
    # values; one pushed-filter scan join against the match set)
    timed(
        "bm25_bool_range_topk",
        lambda: eng.bool_topk(entry.BOOL_RANGE_QUERIES, k=10, docs=dv).collect(),
    )
    # 14. sloppy phrase (anchored window intersection, slop=2)
    timed(
        "bm25_phrase_slop_topk",
        lambda: feng.phrase_topk(
            entry.BM25_PHRASE_SLOP_QUERIES, k=10, n_ranges=8,
            field="text", slop=2,
        ).collect(),
    )
    # 15. cursor paging: page 2 via search_after (k-sized heaps inside
    # the WAND kernels — contrast with from_-paging's from_+k heaps)
    p1 = eng.topk_wand(entry.BM25_QUERIES, k=10, n_ranges=8).toPandas()
    cur = {
        int(qid): (float(g.score.iat[-1]), int(g.doc_id.iat[-1]))
        for qid, g in p1.sort_values(["query_id", "rank"]).groupby("query_id")
        if len(g)
    }
    timed(
        "bm25_cursor_topk",
        lambda: eng.topk_wand(
            entry.BM25_QUERIES, k=10, n_ranges=8, search_after=cur
        ).collect(),
    )
    # 16. ES sort-by-field over the full match set
    timed(
        "bm25_sort_chars_topk",
        lambda: eng.sort_topk(
            entry.BM25_QUERIES, by="n_chars", k=10, docs=dv
        ).collect(),
    )
    # 17. date_histogram + terms-agg size (top-5 buckets in-plan)
    timed(
        "search_aggs_date_histogram",
        lambda: eng.search_aggs(
            entry.BM25_QUERIES, group_by=("warc_ts", "day"),
            metrics={"max_chars": ("max", "n_chars")}, size=5, docs=dv,
        ).collect(),
    )
    # 18. boosted dis_max (full-agg tie_breaker path)
    timed(
        "multi_match_boosted_topk",
        lambda: feng.multi_match(
            entry.BM25_QUERIES, k=10, fields=["title^2", "text"],
            tie_breaker=0.3,
        ).collect(),
    )
    # 19. 1-char prefix expansion — the round-3 scale defect scenario:
    # the dictionary slice is huge, but the in-plan cap bounds the
    # driver collect at prefixes×50 rows
    timed(
        "bm25_prefix_1char_topk",
        lambda: eng.prefix_topk([(1, "a"), (2, "s")], k=10, n_ranges=8).collect(),
    )
    # ---- round-5 additions (also excluded from r2_comparable) ----
    new_in_r5 = [
        "bm25_bool_nested_topk", "sqs_mixed_topk",
        "search_aggs_nested_topk", "bm25_phrase_cursor_topk",
        "es_top_hits_topk", "bm25_rescore_topk",
        "es_function_score_topk", "es_mlt_topk", "significant_terms",
        "es_query_string_topk", "es_phrase_suggest",
        "search_aggs_adjacency", "es_completion_suggest",
    ]
    # 20. rich nested bool trees (should-of-musts, per-clause boost,
    # bool-level minimum_should_match, structured filters): one
    # postings scan + one per-clause conditional hash-agg for the
    # whole 5-query batch
    timed(
        "bm25_bool_nested_topk",
        lambda: eng.bool_topk(
            entry.NESTED_BOOL_QUERIES, k=10, docs=dv
        ).collect(),
    )
    # 21. simple_query_string with quoted phrases and (a | b) groups —
    # the whole body list BATCHED through es_msearch into one
    # bool_topk call: one scan + one clause agg + one positional
    # pass, not one job per body
    from xml_to_es_spark.operators.es_query import es_msearch

    timed(
        "sqs_mixed_topk",
        lambda: es_msearch(
            feng,
            [
                {"query": {"simple_query_string": {
                    "query": qs, "fields": ["text"]}}, "size": 10}
                for _qid, qs in entry.SQS_MIXED_QUERIES
            ],
        ).collect(),
    )
    # 22. sub-bucket aggregation (date_histogram → terms, stats
    # metric): composite bucket keys — still the same two shuffles as
    # a flat terms agg
    timed(
        "search_aggs_nested_topk",
        lambda: eng.search_aggs(
            entry.BM25_QUERIES, group_by=[("warc_ts", "day"), "lang"],
            metrics={"st": ("stats", "n_chars")}, size=8, docs=dv,
        ).collect(),
    )
    # 23. cursor paging on the PHRASE path (round-5 generalization of
    # rank-anchored search_after to the positional kernels)
    pp1 = feng.phrase_topk(
        entry.BM25_PHRASE_QUERIES, k=10, n_ranges=8, field="text"
    ).toPandas()
    pcur = {
        int(qid): (float(g.score.iat[-1]), int(g.doc_id.iat[-1]))
        for qid, g in pp1.sort_values(["query_id", "rank"]).groupby("query_id")
        if len(g)
    }
    timed(
        "bm25_phrase_cursor_topk",
        lambda: feng.phrase_topk(
            entry.BM25_PHRASE_QUERIES, k=10, n_ranges=8, field="text",
            search_after=pcur,
        ).collect(),
    )
    # 24. ES top_hits sub-agg: best-3 scored hits per lang bucket over
    # the FULL match set of the 6-query batch — one rank window per
    # (query, bucket), WindowGroupLimit-pruned before the shuffle
    timed(
        "es_top_hits_topk",
        lambda: eng.bool_top_hits(
            [(qid, {"must": t}) for qid, t in entry.BM25_QUERIES],
            group_by="lang", k_hits=3, docs=dv,
        ).collect(),
    )
    # 25. ES rescore: BM25 first pass (window 50) re-ranked by the
    # exact-phrase rescorer over its full match set, broadcast
    # semi-joined down to the window
    timed(
        "bm25_rescore_topk",
        lambda: feng.rescore_topk(
            [(qid, {"must": t}) for qid, t in entry.BM25_PHRASE_QUERIES],
            [(qid, {"must": [{"match_phrase": {"query": t}}]})
             for qid, t in entry.BM25_PHRASE_QUERIES],
            k=10, window_size=50, query_weight=1.0,
            rescore_query_weight=2.0, field="text",
        ).collect(),
    )
    # 26. function_score: the 6-query bool match set re-weighted by
    # doc-value functions (fvf log1p + lang-gated weight + gaussian
    # length decay) — one dv join + pure JVM array expressions
    timed(
        "es_function_score_topk",
        lambda: eng.function_score_topk(
            [(qid, {"must": t}) for qid, t in entry.BM25_QUERIES],
            entry.FS_FUNCS, k=10, score_mode="sum", docs=dv,
        ).collect(),
    )
    # 27. more_like_this: driver-side ES term selection (bounded by
    # the like input) + one dictionary df job + one bool scan for the
    # whole 3-query batch
    timed(
        "es_mlt_topk",
        lambda: eng.more_like_this_topk(
            [(qid, {"like": like, **entry.MLT_CFG})
             for qid, like in entry.MLT_QUERIES],
            k=10,
        ).collect(),
    )
    # 28b. full Lucene query_string: five strings (precedence,
    # ±markers + boost, phrase slop + group, doc-values
    # constant_score atoms, boosted group under AND NOT), parsed
    # driver-side (pure python, zero jobs) and run as ONE batched
    # bool-tree pass — one scan + one clause agg + one positional
    # pass for the whole suite (es_search routes single bodies; the
    # oracle qs variant covers that path)
    # (feng: the phrase-slop atom needs the positional sidecar;
    # field-less leaves resolve to the default "text" field)
    timed(
        "es_query_string_topk",
        lambda: feng.bool_topk(entry._qs_specs(), k=10, docs=dv).collect(),
    )
    # 28c. phrase suggester: one capped dictionary job + one bounded
    # df probe + ONE batched positional bigram count; Viterbi is
    # driver-side and corpus-independent
    timed(
        "es_phrase_suggest",
        lambda: feng.suggest_phrases(
            "hash joln fst", max_errors=2.0, size=5
        ).collect(),
    )
    # 28d. adjacency_matrix agg: singles + pairwise intersection keys
    # generated IN-PLAN from the matched-names array (flatten/
    # transform over the exploded membership — overlap costs rows,
    # never a second scan) for the 6-query batch
    timed(
        "search_aggs_adjacency",
        lambda: eng.search_aggs(
            entry.BM25_QUERIES,
            group_by={"adjacency_matrix": {"filters": entry.AGG_FILTERS}},
            docs=dv,
        ).collect(),
    )
    # 28e. completion suggester: df-ranked prefix completion — the
    # per-prefix top-N window applied in-plan over the prefix-filtered
    # dictionary scan (row-group pruned on the term-sorted files)
    timed(
        "es_completion_suggest",
        lambda: feng.suggest_completions(
            ["a", "s", "th"], field="text", size=10
        ).collect(),
    )
    # 28. significant_terms: the honest full-postings membership scan
    # + match-id join + JLH for the 6-query batch
    timed(
        "significant_terms",
        lambda: eng.significant_terms(
            [(qid, {"must": [{"match": {"query": t, "operator": "or"}}]})
             for qid, t in entry.BM25_QUERIES],
            size=10, min_doc_count=3,
        ).collect(),
    )
    # ---- round-6 additions (also excluded from r2_comparable) ----
    new_in_r6 = [
        "es_nested_topk", "multi_match_cross_topk", "intervals_topk",
        "pipeline_aggs",
    ]
    # 26. ES nested query: per-object scoping as a higher-order array
    # predicate over an array<struct> doc value — costs what a term
    # filter costs (one column-pruned doc-values pass, no explode)
    dv2 = dv.withColumn(
        "spans",
        F.expr(
            "transform(sequence(0, cast(doc_id % 3 as int)), j -> "
            "named_struct('tag', element_at(array('usa','ussr','uk','de'), "
            "cast((doc_id + j) % 4 as int) + 1), "
            "'w', cast((doc_id * 7 + j * 13) % 50 as long)))"
        ),
    )
    timed(
        "es_nested_topk",
        lambda: eng.bool_topk(
            [
                (1, {"must": [{"nested": {
                    "path": "spans", "score_mode": "sum", "query": {
                        "bool": {"must": [
                            {"term": {"spans.tag": "usa"}},
                            {"range": {"spans.w": {"gte": 25}}}]}}}}]}),
                (2, {"must": [{"match": {"query": "hash join"}}],
                     "filter": [{"nested": {
                         "path": "spans",
                         "query": {"term": {"spans.tag": "uk"}}}}]}),
            ],
            k=10, docs=dv2,
        ).collect(),
    )
    # 27. multi_match cross_fields: blended-df term-centric combine —
    # one scan, two hash-aggs over the fielded index
    timed(
        "multi_match_cross_topk",
        lambda: feng.multi_match(
            entry.BM25_QUERIES, k=10, fields=["text", "title"],
            match_type="cross_fields", tie_breaker=0.2,
        ).collect(),
    )
    # 28. ordered intervals with a gap budget: the greedy minimal-chain
    # positional kernel over the same decoded streams as phrase
    timed(
        "intervals_topk",
        lambda: feng.intervals_topk(
            entry.BM25_PHRASE_QUERIES, max_gaps=2, k=10, field="text",
        ).collect(),
    )
    # 29. pipeline aggregations: post-agg window arithmetic over the
    # bucket frame (bucket_script + cumulative_sum + derivative +
    # bucket_sort) — corpus cost identical to the plain histogram agg
    from xml_to_es_spark.operators.query_engine import pipeline_aggs

    timed(
        "pipeline_aggs",
        lambda: pipeline_aggs(
            eng.search_aggs(
                entry.BM25_QUERIES, group_by=("n_chars", 400),
                metrics={"s": ("sum", "n_chars")}, docs=dv,
            ),
            {
                "ratio": {"bucket_script": {
                    "buckets_path": {"a": "s", "b": "_count"},
                    "script": "params.a / params.b"}},
                "cs": {"cumulative_sum": {"buckets_path": "s"}},
                "d": {"derivative": {"buckets_path": "s"}},
                "top": {"bucket_sort": {"sort": [{"s": {"order": "desc"}}],
                                        "size": 4}},
            },
            order_col="n_chars_bucket", bucket_cols=["n_chars_bucket"],
        ).collect(),
    )
    dv.unpersist()
    fdocs.unpersist()

    total = round(sum(timings.values()), 3)
    r2_comparable = round(
        sum(v for k, v in timings.items()
            if k not in new_in_r3 + new_in_r4 + new_in_r5 + new_in_r6), 3
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_docs": n_docs,
                "index_docs_per_sec": round(n_docs / timings["index_build"], 1),
                "r2_comparable_total": r2_comparable,
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
