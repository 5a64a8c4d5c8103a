"""Round-6 configurable analyzer (IndexConfig stopwords/stemmer):
chain parity across python / Spark / DuckDB, end-to-end stemmed+
stopworded retrieval (twin = an index built from PRE-analyzed text),
mapping inheritance on upsert, drift validation, es_analyze report."""

import duckdb
import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.functions.analysis import analyze_col, sql_analyze
from xml_to_es_spark.operators.es_query import es_analyze, es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine
from xml_to_es_spark.pyref import analyze, stem_minimal_english

STOPS = ("the", "a", "of")
WORDS = [
    # (word, minimal_english stem) — the Lucene branch matrix
    ("joins", "join"), ("tests", "test"), ("cases", "case"),
    ("foxes", "foxe"), ("ponies", "pony"), ("dies", "dy"),
    ("aries", "ary"), ("xaies", "xaies"), ("goes", "goes"),
    ("glass", "glass"), ("bus", "bus"), ("is", "is"), ("ies", "ies"),
    ("days", "day"), ("x1s", "x1"), ("classes", "classe"),
]


def test_stemmer_matrix():
    for w, want in WORDS:
        assert stem_minimal_english(w) == want, w


def test_chain_parity_spark_duckdb(spark):
    texts = ["The quick foxes! Jump-s of PONIES a bus",
             "dies goes glasses THE the OF", "", "a of the"]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", analyze_col("text", STOPS, "minimal_english")
                .alias("toks"))
        .toPandas().sort_values("i")
    )
    con = duckdb.connect()
    con.register("t", pdf)
    sql = sql_analyze("text", STOPS, "minimal_english")
    want = con.execute(
        f"SELECT i, {sql} AS toks FROM t ORDER BY i").df()
    for i, txt in enumerate(texts):
        py = analyze(txt, STOPS, "minimal_english")
        assert list(got.toks.iloc[i]) == py, txt
        assert list(want.toks.iloc[i]) == py, txt


N = 30


def _text(i):
    base = ["run the tests daily", "sorts of joins", "a quick case",
            "the ponies jump", "glass of buses"][i % 5]
    return base + f" w{i}"


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    pdf = pd.DataFrame({"doc_id": range(N),
                        "text": [_text(i) for i in range(N)]})
    root = tmp_path_factory.mktemp("analyzer")
    idx = str(root / "idx")
    IndexBuilder(spark, IndexConfig(
        n_groups=2, store_positions=True,
        stopwords=STOPS, stemmer="minimal_english",
    )).build(spark.createDataFrame(pdf), idx)
    # twin: the SAME corpus pre-analyzed, indexed with the default
    # pinned chain — scores must be bit-equal
    pdf2 = pd.DataFrame({
        "doc_id": range(N),
        "text": [" ".join(analyze(_text(i), STOPS, "minimal_english"))
                 for i in range(N)],
    })
    idx2 = str(root / "idx2")
    IndexBuilder(spark, IndexConfig(
        n_groups=2, store_positions=True,
    )).build(spark.createDataFrame(pdf2), idx2)
    return QueryEngine(spark, idx), QueryEngine(spark, idx2), pdf


def test_stemmed_retrieval_bit_equal_to_preanalyzed(engines):
    import numpy as np

    e, twin, _pdf = engines
    for q in ["test", "tests", "join sorts", "pony", "the case"]:
        a = es_search(e, {"query": {"match": {"text": q}},
                          "size": N}).toPandas()
        # the twin index holds pre-analyzed text, so its query must be
        # pre-analyzed too (its own chain is the pinned default)
        qa = " ".join(analyze(q, STOPS, "minimal_english"))
        b = es_search(twin, {"query": {"match": {"text": qa}},
                             "size": N}).toPandas()
        assert list(a.doc_id) == list(b.doc_id), q
        np.testing.assert_allclose(a.score, b.score, rtol=0, atol=0)
    # query-side stemming: "tests" and "test" are the same query
    a1 = es_search(e, {"query": {"match": {"text": "tests"}},
                       "size": N}).toPandas()
    a2 = es_search(e, {"query": {"match": {"text": "test"}},
                       "size": N}).toPandas()
    assert list(a1.doc_id) == list(a2.doc_id) and len(a1) > 0


def test_phrase_across_removed_stopword(engines):
    """Positions are post-filter indices: "run tests" matches
    "run the tests" on the stopworded index (documented deviation
    from ES position-increment gaps)."""
    e, _twin, _pdf = engines
    out = es_search(e, {"query": {"match_phrase": {
        "text": "run tests"}}, "size": N}).toPandas()
    assert len(out) == len([i for i in range(N) if i % 5 == 0])


def test_upsert_inherits_analyzer(engines, spark, tmp_path):
    e, _twin, pdf = engines
    idx = str(tmp_path / "inh")
    IndexBuilder(spark, IndexConfig(
        n_groups=2, stopwords=STOPS, stemmer="minimal_english",
    )).build(spark.createDataFrame(pdf), idx)
    patch = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [N + 1], "text": ["the windows of sorts"]}))
    IndexBuilder(spark).upsert(patch, idx)  # DEFAULT cfg: must inherit
    e2 = QueryEngine(spark, idx)
    assert e2.stopwords == STOPS and e2.stemmer == "minimal_english"
    got = es_search(e2, {"query": {"match": {"text": "window"}},
                         "size": 5}).toPandas()
    assert list(got.doc_id) == [N + 1]
    # drift validation: a different chain raises
    with pytest.raises(ValueError, match="mapping drift"):
        IndexBuilder(spark, IndexConfig(
            n_groups=2, stopwords=("other",), stemmer=None,
        )).validate_mapping(idx)


def test_es_analyze_reports_chain(engines):
    e, _twin, _pdf = engines
    got = es_analyze({"text": "The Tests of ponies"}, engine=e)
    assert [t["token"] for t in got] == ["test", "pony"]
    # offsets index the original surface span; positions compact
    assert got[0]["start_offset"] == 4 and got[0]["end_offset"] == 9
    assert [t["position"] for t in got] == [0, 1]
    # default chain unchanged without an engine
    plain = es_analyze({"text": "The Tests of ponies"})
    assert [t["token"] for t in plain] == ["the", "tests", "of", "ponies"]


def test_analyzer_validation(spark):
    with pytest.raises(ValueError, match="stemmer"):
        IndexBuilder(spark, IndexConfig(stemmer="porter2"))
    with pytest.raises(ValueError, match="stopwords"):
        IndexBuilder(spark, IndexConfig(stopwords=("The",)))
