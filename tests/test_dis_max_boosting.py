"""ES dis_max and boosting compound query kinds: score combiners over
the shared bool-tree machinery. Twins are built in pandas from the
engine's own single-clause match scores — max + tie_breaker·Σrest for
dis_max, negative_boost demotion for boosting — so the assertions pin
the COMBINER, not the (already oracle-verified) BM25 leaves."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_count, es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(n_groups=2, salt_threshold=40, n_salts=3, block_size=32)


def _corpus(n=40):
    rows = []
    for i in range(n):
        toks = ["alpha", f"w{i}"]
        if i % 2 == 0:
            toks.append("even")
        if i % 3 == 0:
            toks.append("trip")
        if i % 5 == 0:
            toks.append("penta")
        rows.append((i, " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dismax")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def _clause_scores(eng, text):
    out = eng.topk_distributed([(0, text)], k=100).toPandas()
    return dict(zip(out.doc_id, out.score))


def test_dis_max_is_max_plus_tiebreak(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    tb = 0.35
    spec = {"must": [{"dis_max": {
        "queries": [{"match": {"query": "even"}},
                    {"match": {"query": "trip penta"}}],
        "tie_breaker": tb,
    }}]}
    got = eng.bool_topk([(0, spec)], k=100).toPandas()
    s1 = _clause_scores(eng, "even")
    s2 = _clause_scores(eng, "trip penta")
    want = {}
    for d in set(s1) | set(s2):
        a, b = s1.get(d, 0.0), s2.get(d, 0.0)
        want[d] = max(a, b) + tb * (a + b - max(a, b))
    assert set(got.doc_id) == set(want)
    for d, s in zip(got.doc_id, got.score):
        assert s == pytest.approx(want[d], abs=1e-9)
    # rank order follows the combined score
    assert list(got.score) == sorted(got.score, reverse=True)


def test_dis_max_default_tiebreak_zero_is_pure_max(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {"must": [{"dis_max": {
        "queries": [{"match": {"query": "even"}},
                    {"match": {"query": "trip"}}],
    }}]}
    got = eng.bool_topk([(0, spec)], k=100).toPandas()
    s1 = _clause_scores(eng, "even")
    s2 = _clause_scores(eng, "trip")
    for d, s in zip(got.doc_id, got.score):
        assert s == pytest.approx(
            max(s1.get(d, 0.0), s2.get(d, 0.0)), abs=1e-9
        )


def test_boosting_demotes_not_excludes(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    nb = 0.3
    spec = {"must": [{"boosting": {
        "positive": {"match": {"query": "alpha"}},
        "negative": {"match": {"query": "even"}},
        "negative_boost": nb,
    }}]}
    got = eng.bool_topk([(0, spec)], k=100).toPandas()
    pos = _clause_scores(eng, "alpha")
    # every positive match stays in the set (demoted, NOT excluded)
    assert set(got.doc_id) == set(pos)
    for d, s in zip(got.doc_id, got.score):
        want = pos[d] * (nb if d % 2 == 0 else 1.0)
        assert s == pytest.approx(want, abs=1e-9)


def test_boosting_structured_negative(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {"must": [{"boosting": {
        "positive": {"match": {"query": "trip"}},
        "negative": {"range": {"doc_id": {"lt": 10}}},
        "negative_boost": 0.5,
    }}]}
    got = eng.bool_topk([(0, spec)], k=100).toPandas()
    pos = _clause_scores(eng, "trip")
    for d, s in zip(got.doc_id, got.score):
        assert s == pytest.approx(
            pos[d] * (0.5 if d < 10 else 1.0), abs=1e-9
        )


def test_dis_max_nested_inside_bool(spark, idx):
    """dis_max beside a must_not inside one bool tree."""
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {
        "must": [{"dis_max": {"queries": [
            {"match": {"query": "even"}}, {"match": {"query": "trip"}},
        ]}}],
        "must_not": [{"match": {"query": "penta"}}],
    }
    got = eng.bool_topk([(0, spec)], k=100).toPandas()
    s1 = _clause_scores(eng, "even")
    s2 = _clause_scores(eng, "trip")
    want = {
        d: max(s1.get(d, 0.0), s2.get(d, 0.0))
        for d in (set(s1) | set(s2))
        if d % 5 != 0
    }
    assert set(got.doc_id) == set(want)
    for d, s in zip(got.doc_id, got.score):
        assert s == pytest.approx(want[d], abs=1e-9)


def test_dsl_routes_dis_max_and_boosting(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    body = {"query": {"dis_max": {
        "queries": [{"match": {"text": "even"}},
                    {"match": {"text": "trip"}}],
        "tie_breaker": 0.2,
    }}, "size": 15}
    got = es_search(eng, body).toPandas()
    want = eng.bool_topk([(0, {"must": [{"dis_max": {
        "queries": [{"match": {"query": "even"}},
                    {"match": {"query": "trip"}}],
        "tie_breaker": 0.2,
    }}]})], k=15).toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=0)

    bbody = {"query": {"boosting": {
        "positive": {"match": {"text": "trip"}},
        "negative": {"match": {"text": "even"}},
        "negative_boost": 0.4,
    }}, "size": 15}
    got2 = es_search(eng, bbody).toPandas()
    pos = _clause_scores(eng, "trip")
    for d, s in zip(got2.doc_id, got2.score):
        assert s == pytest.approx(
            pos[d] * (0.4 if d % 2 == 0 else 1.0), abs=1e-9
        )
    # _count routes the same translation
    total = es_count(eng, {"query": bbody["query"]}).toPandas()
    assert int(total.total[0]) == len(pos)


def test_dis_max_rejects_bad_options(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    with pytest.raises(ValueError, match="queries"):
        es_search(eng, {"query": {"dis_max": {"tie_breaker": 0.2}}})
    with pytest.raises(ValueError, match="tie_breaker"):
        eng.bool_topk([(0, {"must": [{"dis_max": {
            "queries": [{"match": {"query": "x"}}], "tie_breaker": 1.5,
        }}]})], k=5)
    with pytest.raises(ValueError, match="positive"):
        es_search(eng, {"query": {"boosting": {
            "negative": {"match": {"text": "x"}}}}})
    with pytest.raises(ValueError, match="search_after"):
        es_search(eng, {"query": {"dis_max": {"queries": [
            {"match": {"text": "x"}}]}}, "search_after": [1.0, 2]})
