"""Dump .explain("formatted") for the bench queries to plans/r07/.

Usage: python tools/r07_plans.py <suffix>   (suffix = before|after)
Writes plans/r07/<query>_<suffix>.txt for each query DataFrame the
round touches. Mirrors bench.py's query construction exactly.
"""
import os, sys, tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry
from pyspark.sql import functions as F
from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import (
    QueryEngine, bm25_topk_dataframe, pipeline_aggs,
)
from xml_to_es_spark.operators.es_query import es_msearch
from xml_to_es_spark.session import get_spark

SUFFIX = sys.argv[1]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r07")
os.makedirs(OUT, exist_ok=True)

spark = get_spark(app="r07_plans", cores="32", shuffle_partitions="32")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text").persist()
docs.count()
idx = tempfile.mkdtemp(prefix="plan_idx_") + "/index"
IndexBuilder(spark, IndexConfig(n_groups=4, salt_threshold=2000, n_salts=8)).build(docs, idx)
eng = QueryEngine(spark, idx)
full_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
fidx = tempfile.mkdtemp(prefix="plan_fidx_") + "/index"
fdocs = entry._fielded_docs(spark, SF_DIR).persist()
fdocs.count()
IndexBuilder(spark, IndexConfig(
    n_groups=4, salt_threshold=2000, n_salts=8,
    indexed_fields=("text", "title"), store_positions=True)).build(fdocs, fidx)
feng = QueryEngine(spark, fidx)
dv = full_docs.select(
    "doc_id", "lang", "source", "n_chars",
    F.timestamp_seconds(
        F.lit(1704067200) + (F.col("doc_id") % 37) * 86400
        + (F.col("doc_id") * 7919) % 86400).alias("warc_ts")).persist()
dv.count()
dv2 = dv.withColumn("spans", F.expr(
    "transform(sequence(0, cast(doc_id % 3 as int)), j -> "
    "named_struct('tag', element_at(array('usa','ussr','uk','de'), "
    "cast((doc_id + j) % 4 as int) + 1), "
    "'w', cast((doc_id * 7 + j * 13) % 50 as long)))"))
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
    "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
q = emb.filter(F.col("vec_id") < 5).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))

from xml_to_es_spark.operators.dedup import minhash_lsh_pairs
from xml_to_es_spark.operators.similarity import cosine_topk

QUERIES = {
    "bm25_codec_topk": lambda: eng.topk_distributed(entry.BM25_QUERIES, k=10),
    "bm25_wand_topk": lambda: eng.topk_wand(entry.BM25_QUERIES, k=10, n_ranges=8),
    "bm25_dataframe": lambda: bm25_topk_dataframe(docs, entry.BM25_QUERIES, k=10),
    "minhash_lsh_pairs": lambda: minhash_lsh_pairs(full_docs, n_perm=16, band_size=8),
    "ann_cosine_topk": lambda: cosine_topk(emb, q, k=10),
    "bm25_title_topk": lambda: feng.topk_wand(entry.BM25_QUERIES, k=10, n_ranges=8, field="title"),
    "multi_match_topk": lambda: feng.multi_match(entry.BM25_QUERIES, k=10, fields=["text", "title"], n_ranges=8),
    "phrase_stopword_topk": lambda: feng.phrase_topk([(1, "a the"), (2, "the a"), (3, "table value")], k=10, n_ranges=8, field="text"),
    "bm25_page2_topk": lambda: eng.topk_wand(entry.BM25_QUERIES, k=10, n_ranges=8, from_=10),
    "bm25_bool_topk": lambda: eng.bool_topk(entry.BOOL_QUERIES, k=10),
    "bm25_bool_range_topk": lambda: eng.bool_topk(entry.BOOL_RANGE_QUERIES, k=10, docs=dv),
    "bm25_phrase_slop_topk": lambda: feng.phrase_topk(entry.BM25_PHRASE_SLOP_QUERIES, k=10, n_ranges=8, field="text", slop=2),
    "bm25_sort_chars_topk": lambda: eng.sort_topk(entry.BM25_QUERIES, by="n_chars", k=10, docs=dv),
    "search_aggs_date_histogram": lambda: eng.search_aggs(entry.BM25_QUERIES, group_by=("warc_ts", "day"), metrics={"max_chars": ("max", "n_chars")}, size=5, docs=dv),
    "multi_match_boosted_topk": lambda: feng.multi_match(entry.BM25_QUERIES, k=10, fields=["title^2", "text"], tie_breaker=0.3),
    "bm25_prefix_1char_topk": lambda: eng.prefix_topk([(1, "a"), (2, "s")], k=10, n_ranges=8),
    "bm25_bool_nested_topk": lambda: eng.bool_topk(entry.NESTED_BOOL_QUERIES, k=10, docs=dv),
    "sqs_mixed_topk": lambda: es_msearch(feng, [
        {"query": {"simple_query_string": {"query": qs, "fields": ["text"]}}, "size": 10}
        for _qid, qs in entry.SQS_MIXED_QUERIES]),
    "search_aggs_nested_topk": lambda: eng.search_aggs(entry.BM25_QUERIES, group_by=[("warc_ts", "day"), "lang"], metrics={"st": ("stats", "n_chars")}, size=8, docs=dv),
    "es_top_hits_topk": lambda: eng.bool_top_hits([(qid, {"must": t}) for qid, t in entry.BM25_QUERIES], group_by="lang", k_hits=3, docs=dv),
    "bm25_rescore_topk": lambda: feng.rescore_topk(
        [(qid, {"must": t}) for qid, t in entry.BM25_PHRASE_QUERIES],
        [(qid, {"must": [{"match_phrase": {"query": t}}]}) for qid, t in entry.BM25_PHRASE_QUERIES],
        k=10, window_size=50, query_weight=1.0, rescore_query_weight=2.0, field="text"),
    "es_function_score_topk": lambda: eng.function_score_topk(
        [(qid, {"must": t}) for qid, t in entry.BM25_QUERIES],
        entry.FS_FUNCS, k=10, score_mode="sum", docs=dv),
    "es_mlt_topk": lambda: eng.more_like_this_topk(
        [(qid, {"like": like, **entry.MLT_CFG}) for qid, like in entry.MLT_QUERIES], k=10),
    "es_query_string_topk": lambda: feng.bool_topk(entry._qs_specs(), k=10, docs=dv),
    "es_phrase_suggest": lambda: feng.suggest_phrases("hash joln fst", max_errors=2.0, size=5),
    "search_aggs_adjacency": lambda: eng.search_aggs(entry.BM25_QUERIES, group_by={"adjacency_matrix": {"filters": entry.AGG_FILTERS}}, docs=dv),
    "es_completion_suggest": lambda: feng.suggest_completions(["a", "s", "th"], field="text", size=10),
    "significant_terms": lambda: eng.significant_terms(
        [(qid, {"must": [{"match": {"query": t, "operator": "or"}}]}) for qid, t in entry.BM25_QUERIES],
        size=10, min_doc_count=3),
    "es_nested_topk": lambda: eng.bool_topk([
        (1, {"must": [{"nested": {"path": "spans", "score_mode": "sum", "query": {
            "bool": {"must": [{"term": {"spans.tag": "usa"}},
                              {"range": {"spans.w": {"gte": 25}}}]}}}}]}),
        (2, {"must": [{"match": {"query": "hash join"}}],
             "filter": [{"nested": {"path": "spans", "query": {"term": {"spans.tag": "uk"}}}}]}),
    ], k=10, docs=dv2),
    "multi_match_cross_topk": lambda: feng.multi_match(entry.BM25_QUERIES, k=10, fields=["text", "title"], match_type="cross_fields", tie_breaker=0.2),
    "intervals_topk": lambda: feng.intervals_topk(entry.BM25_PHRASE_QUERIES, max_gaps=2, k=10, field="text"),
    "pipeline_aggs": lambda: pipeline_aggs(
        eng.search_aggs(entry.BM25_QUERIES, group_by=("n_chars", 400),
                        metrics={"s": ("sum", "n_chars")}, docs=dv),
        {"ratio": {"bucket_script": {"buckets_path": {"a": "s", "b": "_count"},
                                     "script": "params.a / params.b"}},
         "cs": {"cumulative_sum": {"buckets_path": "s"}},
         "d": {"derivative": {"buckets_path": "s"}},
         "top": {"bucket_sort": {"sort": [{"s": {"order": "desc"}}], "size": 4}}},
        order_col="n_chars_bucket", bucket_cols=["n_chars_bucket"]),
    "index_build_postings_encode": lambda: IndexBuilder(
        spark, IndexConfig(n_groups=4, salt_threshold=2000, n_salts=8)
    )._encode_postings(
        spark.read.parquet(f"{idx}/tokens")
        if os.path.exists(f"{idx}/tokens")
        else IndexBuilder(spark, IndexConfig(n_groups=4, salt_threshold=2000, n_salts=8)).tokenized(docs),
        0, 4999),
}

only = set(sys.argv[2:])
for name, mk in QUERIES.items():
    if only and name not in only:
        continue
    try:
        df = mk()
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(txt)
        print("ok", name)
    except Exception as e:
        print("FAIL", name, repr(e)[:200])
# The r7 driver-merge paths return LocalRelations, so their "after"
# plans collapse to LocalTableScan; dump the distributed PARTIALS plan
# (scan -> attach -> kernel) separately so the kernel shape stays
# auditable against the before files.
if SUFFIX == "after":
    import pyspark.sql.functions as FF
    m = eng._matched_segments(entry.BM25_QUERIES)
    parts = eng._wand_partials(m, 10, 8, None)
    with open(os.path.join(OUT, "bm25_wand_topk_partials_after.txt"), "w") as f:
        f.write(parts._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print("ok bm25_wand_topk_partials")

spark.stop()
