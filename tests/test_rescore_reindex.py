"""ES rescore (window re-ranking by a second query), _reindex
(query-bounded rebuild under the stored mapping), scroll-style full
match-set export, and index _stats."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import (
    es_reindex,
    es_scroll_hits,
    es_search,
    index_stats,
)
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(
    n_groups=2, salt_threshold=40, n_salts=3, block_size=32,
    store_positions=True, store_source=True, stored_fields=("lang",),
)


def _corpus(n=40):
    rows = []
    for i in range(n):
        toks = ["alpha", f"w{i}"]
        if i % 2 == 0:
            toks += ["quick", "fox"]      # adjacent -> phrase hit
        if i % 3 == 0:
            toks += ["fox", "quick"]      # reversed -> no exact phrase
        rows.append((i, " ".join(toks), "en" if i % 4 else "de"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rescore")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def test_rescore_combines_weights(spark, idx):
    """combined = w1*first + w2*phrase over the window; non-phrase
    window docs keep w1*first."""
    pdf, path = idx
    eng = QueryEngine(spark, path)
    w1, w2, window = 0.7, 2.0, 30
    first = eng.bool_topk([(0, {"must": "alpha"})], k=window).toPandas()
    ph = eng.bool_match_hits(
        [(0, {"must": [{"match_phrase": {"query": "quick fox"}}]})]
    ).toPandas()
    phs = dict(zip(ph.doc_id, ph.score))
    want = {
        d: w1 * s + w2 * phs.get(d, 0.0)
        for d, s in zip(first.doc_id, first.score)
    }
    got = eng.rescore_topk(
        [(0, {"must": "alpha"})],
        [(0, {"must": [{"match_phrase": {"query": "quick fox"}}]})],
        k=10, window_size=window,
        query_weight=w1, rescore_query_weight=w2,
    ).toPandas()
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got.doc_id) == [d for d, _ in order]
    assert list(got.score) == pytest.approx([s for _, s in order], abs=1e-12)


def test_rescore_dsl_body(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    got = es_search(eng, {
        "query": {"match": {"text": "alpha"}},
        "rescore": {"window_size": 20, "query": {
            "rescore_query": {"match_phrase": {"text": "quick fox"}},
            "query_weight": 0.5, "rescore_query_weight": 1.5}},
        "size": 5,
    }).toPandas()
    want = eng.rescore_topk(
        [(0, {"must": [{"match": {"query": "alpha", "operator": "or"}}]})],
        [(0, {"must": [{"match_phrase": {"query": "quick fox",
                                         "slop": 0}}]})],
        k=5, window_size=20, query_weight=0.5, rescore_query_weight=1.5,
    ).toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=0)
    with pytest.raises(ValueError, match="window_size"):
        eng.rescore_topk([(0, {"must": "alpha"})],
                         [(0, {"must": "quick"})], k=30, window_size=10)
    with pytest.raises(ValueError, match="rescore_query"):
        es_search(eng, {"query": {"match": {"text": "a"}},
                        "rescore": {"window_size": 5, "query": {}}})


def test_scroll_hits_is_full_match_set(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    got = es_scroll_hits(
        eng, {"query": {"match": {"text": "quick"}}}
    ).toPandas()
    want_ids = {i for i in range(40) if i % 2 == 0 or i % 3 == 0}
    assert set(got.doc_id) == want_ids
    # scores match the ranked path bit-for-bit
    ranked = eng.bool_topk([(0, {"must": "quick"})], k=100).toPandas()
    r = dict(zip(ranked.doc_id, ranked.score))
    for d, s in zip(got.doc_id, got.score):
        assert s == r[d]


def test_reindex_full_and_query_bounded(spark, idx, tmp_path):
    pdf, path = idx
    b = IndexBuilder(spark, CFG)
    full = str(tmp_path / "full")
    res = es_reindex(b, path, full)
    assert res["n_docs"] == 40
    got = QueryEngine(spark, full).topk_distributed(
        [(0, "alpha quick")], k=50
    ).toPandas()
    want = QueryEngine(spark, path).topk_distributed(
        [(0, "alpha quick")], k=50
    ).toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=0)

    part = str(tmp_path / "part")
    es_reindex(b, path, part, query={"term": {"lang": "de"}})
    peng = QueryEngine(spark, part)
    assert peng.n_docs == len([i for i in range(40) if i % 4 == 0])
    # the dest inherits the source mapping (positions ride along)
    ph = peng.phrase_topk([(0, "quick fox")], k=50).toPandas()
    assert set(ph.doc_id) == {i for i in range(40) if i % 4 == 0 and i % 2 == 0}


def test_index_stats(spark, idx, tmp_path):
    pdf, path = idx
    st = index_stats(spark, path)
    assert st["exists"] and st["n_docs_live"] == 40
    assert st["n_dirs"] == 1 and st["postings_bytes"] > 0
    assert st["mapping"]["store_positions"] is True
    b = IndexBuilder(spark, CFG)
    b.delete_docs([0, 1], path)
    st2 = index_stats(spark, path)
    assert st2["n_docs_live"] == 38 and st2["n_doc_versions_killed"] == 2
    assert index_stats(spark, str(tmp_path / "nope")) == {"exists": False}
