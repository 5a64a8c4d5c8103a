"""ES more_like_this (tf·idf term selection → bool should query) and
the _explain score-breakdown API. Twins: the pure-Python pyref BM25
oracle plus a python reimplementation of the ES selection algorithm."""

from collections import Counter

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine
from xml_to_es_spark.pyref import PyRefIndex, idf, saturation, tokenize

CFG = IndexConfig(n_groups=2, salt_threshold=40, block_size=32,
                  store_source=True)


def _corpus(n=40):
    rows = []
    for i in range(n):
        toks = ["alpha"]
        if i % 2 == 0:
            toks += ["beta", "beta"]
        if i % 3 == 0:
            toks += ["gamma"]
        if i % 5 == 0:
            toks += ["delta", "delta", "delta"]
        toks += [f"w{i}", f"w{i}"]
        toks += ["pad"] * (i % 7)
        rows.append((i, " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mlt")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def _select_terms(like_text, pdf, min_tf=2, min_df=5, max_df=None,
                  max_terms=25):
    """The ES selection algorithm, reimplemented independently."""
    n = len(pdf)
    dfs = Counter()
    for t in pdf.text:
        dfs.update(set(tokenize(t)))
    tf = Counter(tokenize(like_text))
    scored = []
    for tok, c in tf.items():
        if c < min_tf or dfs[tok] < min_df:
            continue
        if max_df is not None and dfs[tok] > max_df:
            continue
        if dfs[tok] == 0:
            continue
        scored.append((c * idf(n, dfs[tok]), tok))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [tok for _, tok in scored[:max_terms]]


def _twin_scores(sel, pdf, need, exclude=()):
    """Per-doc BM25 sum over the selected terms with min-match."""
    oracle = PyRefIndex({int(r.doc_id): r.text for r in pdf.itertuples()})
    out = {}
    for r in pdf.itertuples():
        if int(r.doc_id) in exclude:
            continue
        toks = tokenize(r.text)
        tfs = Counter(toks)
        matched = [t for t in sel if tfs[t] > 0]
        if len(matched) < need:
            continue
        s = 0.0
        for t in sorted(matched):
            s += idf(len(pdf), oracle.df(t)) * saturation(
                tfs[t], len(toks), oracle.avgdl, oracle.cfg
            )
        out[int(r.doc_id)] = s
    return out


def test_mlt_free_text_matches_twin(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    like = "beta beta gamma gamma delta delta alpha w3"
    got = eng.more_like_this_topk(
        [(0, {"like": like, "min_term_freq": 2, "min_doc_freq": 3,
              "max_query_terms": 3, "minimum_should_match": 1})],
        k=1000,
    ).toPandas()
    sel = _select_terms(like, pdf, min_tf=2, min_df=3, max_terms=3)
    want = _twin_scores(sel, pdf, need=1)
    assert set(got.doc_id) == set(want)
    for _, r in got.iterrows():
        assert r.score == pytest.approx(want[r.doc_id], rel=1e-9)


def test_mlt_percentage_min_match(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    like = "beta beta gamma gamma delta delta"
    got = eng.more_like_this_topk(
        [(0, {"like": like, "min_term_freq": 2, "min_doc_freq": 2,
              "minimum_should_match": "67%"})],
        k=1000,
    ).toPandas()
    sel = _select_terms(like, pdf, min_tf=2, min_df=2)
    need = max(1, (67 * len(sel)) // 100)
    want = _twin_scores(sel, pdf, need=need)
    assert set(got.doc_id) == set(want)


def test_mlt_by_doc_id_excludes_like(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    like_id = 0  # alpha beta beta gamma delta×3 w0×2
    spec = {"like": like_id, "min_term_freq": 2, "min_doc_freq": 2,
            "minimum_should_match": 1}
    got = eng.more_like_this_topk([(0, spec)], k=1000).toPandas()
    assert like_id not in set(got.doc_id)
    sel = _select_terms(pdf.text.iloc[like_id], pdf, min_tf=2, min_df=2)
    want = _twin_scores(sel, pdf, need=1, exclude={like_id})
    assert set(got.doc_id) == set(want)
    inc = eng.more_like_this_topk(
        [(0, {**spec, "include": True})], k=1000
    ).toPandas()
    assert like_id in set(inc.doc_id)


def test_mlt_mixed_likes_and_empty_selection(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    # doc 0's text plus free text accumulate tf across likes
    got = eng.more_like_this_topk(
        [(1, {"like": [0, "delta delta"], "min_term_freq": 2,
              "min_doc_freq": 2, "minimum_should_match": 1}),
         (2, {"like": "zzz yyy xxx", "min_term_freq": 1})],
        k=1000,
    ).toPandas()
    assert set(got.query_id) == {1}  # query 2 selects nothing → no rows
    combined = pdf.text.iloc[0] + " delta delta"
    sel = _select_terms(combined, pdf, min_tf=2, min_df=2)
    want = _twin_scores(sel, pdf, need=1, exclude={0})
    assert set(got.doc_id) == set(want)


def test_mlt_validation(spark, idx):
    _, path = idx
    eng = QueryEngine(spark, path)
    with pytest.raises(ValueError, match="like"):
        eng.more_like_this_topk([(0, {"min_term_freq": 1})])
    with pytest.raises(ValueError, match="unknown key"):
        eng.more_like_this_topk([(0, {"like": "x", "boost": 2})])
    with pytest.raises(ValueError, match="not found"):
        eng.more_like_this_topk([(0, {"like": 10_000})])
    with pytest.raises(ValueError, match="text or doc_id"):
        eng.more_like_this_topk([(0, {"like": [1.5]})])


def test_dsl_more_like_this(spark, idx):
    from xml_to_es_spark.operators.es_query import es_search

    pdf, path = idx
    eng = QueryEngine(spark, path)
    body = {"query": {"more_like_this": {
        "fields": ["text"],
        "like": [{"_id": 0}, "delta delta"],
        "min_term_freq": 2, "min_doc_freq": 2,
        "minimum_should_match": 1,
    }}, "size": 5}
    got = es_search(eng, body).toPandas()
    want = eng.more_like_this_topk(
        [(0, {"like": [0, "delta delta"], "min_term_freq": 2,
              "min_doc_freq": 2, "minimum_should_match": 1})],
        k=5,
    ).toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == list(want.score)
    with pytest.raises(ValueError, match="_id"):
        es_search(eng, {"query": {"more_like_this": {
            "like": [{"_index": "a"}]}}})


def test_explain_sums_to_score_and_matches_pyref(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    q = "beta delta pad"
    top = eng.topk_distributed([(0, q)], k=5).toPandas()
    ids = [int(d) for d in top.doc_id]
    exp = eng.explain_hits([(0, q)], ids).toPandas()
    oracle = PyRefIndex({int(r.doc_id): r.text for r in pdf.itertuples()})
    for d in ids:
        rows = exp[exp.doc_id == d]
        # Σcontrib = the ranked score bit-for-bat the engine's own sum
        assert rows.contrib.sum() == pytest.approx(
            float(top[top.doc_id == d].score.iloc[0]), rel=1e-12
        )
        for _, r in rows.iterrows():
            assert int(r.df) == oracle.df(r.term)
            assert r.idf == pytest.approx(
                idf(len(pdf), oracle.df(r.term)), rel=1e-12
            )
            toks = tokenize(pdf.text.iloc[d])
            assert r.contrib == pytest.approx(
                r.idf * saturation(
                    Counter(toks)[r.term], len(toks), oracle.avgdl,
                    oracle.cfg,
                ), rel=1e-12,
            )


def test_es_explain_dsl(spark, idx):
    from xml_to_es_spark.operators.es_query import es_explain

    _, path = idx
    eng = QueryEngine(spark, path)
    out = es_explain(eng, 0, {"query": {"match": {"text": "beta delta"}}})
    rows = out.toPandas()
    assert set(rows.doc_id) == {0}
    assert set(rows.term) == {"beta", "delta"}
    with pytest.raises(ValueError, match="match queries"):
        es_explain(eng, 0, {"query": {"match_phrase": {"text": "a b"}}})
    with pytest.raises(ValueError, match="query only"):
        es_explain(eng, 0, {"query": {"match": {"text": "a"}}, "size": 5})
