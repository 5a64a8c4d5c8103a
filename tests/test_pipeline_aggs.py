"""ES pipeline aggregations (bucket_script / bucket_sort / derivative /
cumulative_sum / avg|sum|min|max_bucket): pure post-agg window and
arithmetic transforms over the bucket frame — checked against pandas
twins through the es_search DSL route."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

N = 60


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(N),
        "text": [("alpha beta " if i % 2 == 0 else "alpha gamma ")
                 + f"w{i}" for i in range(N)],
        "lang": [["en", "de", "fr"][i % 3] for i in range(N)],
        "n_chars": [100 + 5 * i for i in range(N)],
    })
    idx = str(tmp_path_factory.mktemp("pipeagg") / "idx")
    IndexBuilder(spark, IndexConfig(
        n_groups=2, stored_fields=("lang", "n_chars"),
    )).build(spark.createDataFrame(pdf), idx)
    return QueryEngine(spark, idx), pdf


def _hist_twin(pdf, interval=100):
    # match set: every doc contains "alpha"
    g = pdf.assign(b=(pdf.n_chars // interval) * interval).groupby("b")
    t = g.agg(doc_count=("doc_id", "size"), s=("n_chars", "sum"))
    t = t.sort_index()
    t["cs"] = t.s.cumsum()
    t["deriv"] = t.s.diff()
    t["ratio"] = t.s / t.doc_count
    t["avg_s"] = t.s.mean()
    return t


def _body(extra_sub=None, extra_top=None):
    sub = {"s": {"sum": {"field": "n_chars"}}}
    sub.update(extra_sub or {})
    aggs = {"h": {"histogram": {"field": "n_chars", "interval": 100},
                  "aggs": sub}}
    aggs.update(extra_top or {})
    return {"query": {"match": {"text": "alpha"}}, "aggs": aggs}


def test_cumulative_sum_derivative_script(eng):
    e, pdf = eng
    body = _body({
        "cs": {"cumulative_sum": {"buckets_path": "s"}},
        "deriv": {"derivative": {"buckets_path": "s"}},
        "ratio": {"bucket_script": {
            "buckets_path": {"a": "s", "b": "_count"},
            "script": "params.a / params.b"}},
    })
    out = (es_search(e, body).toPandas()
           .set_index("n_chars_bucket").sort_index())
    t = _hist_twin(pdf)
    assert list(out.index) == list(t.index)
    assert list(out.cs) == list(t.cs)
    assert pd.isna(out.deriv.iloc[0]) and pd.isna(t.deriv.iloc[0])
    assert list(out.deriv[1:]) == list(t.deriv[1:])
    for a, b in zip(out.ratio, t.ratio):
        assert abs(a - b) < 1e-9


def test_sibling_pipelines(eng):
    e, pdf = eng
    body = _body(extra_top={
        "avg_s": {"avg_bucket": {"buckets_path": "h>s"}},
        "mx_s": {"max_bucket": {"buckets_path": "h>s"}},
        "n_total": {"sum_bucket": {"buckets_path": "h>_count"}},
    })
    out = es_search(e, body).toPandas()
    t = _hist_twin(pdf)
    assert set(round(v, 6) for v in out.avg_s) == {round(t.s.mean(), 6)}
    assert set(out.mx_s) == {t.s.max()}
    assert set(out.n_total) == {N}


def test_bucket_sort_and_order(eng):
    e, pdf = eng
    body = _body({
        "top": {"bucket_sort": {"sort": [{"s": {"order": "desc"}}],
                                "size": 3, "from": 1}},
    })
    out = es_search(e, body).toPandas()
    t = _hist_twin(pdf).sort_values(["s"], ascending=False)
    want = list(t.index[1:4])
    assert list(out.n_chars_bucket) == want
    # bucket_sort may reference a bucket_script column (applied last)
    body2 = _body({
        "ratio": {"bucket_script": {
            "buckets_path": {"a": "s", "b": "_count"},
            "script": "params.a / params.b"}},
        "top": {"bucket_sort": {"sort": [{"ratio": {"order": "asc"}}],
                                "size": 2}},
    })
    out2 = es_search(e, body2).toPandas()
    t2 = _hist_twin(pdf).sort_values("ratio")
    assert list(out2.n_chars_bucket) == list(t2.index[:2])


def test_pipeline_validation(eng):
    e, _pdf = eng
    with pytest.raises(ValueError, match="ordered bucket key|histogram"):
        es_search(e, {"query": {"match": {"text": "alpha"}},
                      "aggs": {"t": {"terms": {"field": "lang"}, "aggs": {
                          "cs": {"cumulative_sum": {
                              "buckets_path": "_count"}}}}}})
    with pytest.raises(ValueError, match="arithmetic"):
        es_search(e, _body({"bad": {"bucket_script": {
            "buckets_path": {"a": "s"},
            "script": "params.a; import os"}}}))
    with pytest.raises(ValueError, match="buckets_path"):
        es_search(e, _body({"bad": {"bucket_script": {
            "buckets_path": {"a": "s"}, "script": "params.zzz + 1"}}}))
    with pytest.raises(ValueError, match="not a metric column"):
        es_search(e, _body({"cs": {"cumulative_sum": {
            "buckets_path": "nope"}}}))
    with pytest.raises(ValueError, match="does not name the bucket agg"):
        es_search(e, _body(extra_top={
            "a": {"avg_bucket": {"buckets_path": "other>s"}}}))
    with pytest.raises(ValueError, match="no sort"):
        es_search(e, _body({"t": {"bucket_sort": {"size": 2}}}))


def test_terms_parent_script_and_sibling(eng):
    """bucket_script and sibling pipelines work on terms parents
    (only the ordered kinds need a histogram)."""
    e, pdf = eng
    out = es_search(e, {"query": {"match": {"text": "alpha"}},
                        "aggs": {"t": {"terms": {"field": "lang"}, "aggs": {
                            "s": {"sum": {"field": "n_chars"}},
                            "r": {"bucket_script": {
                                "buckets_path": {"a": "s", "b": "_count"},
                                "script": "params.a / params.b"}}}},
                            "m": {"min_bucket": {
                                "buckets_path": "t>s"}}}}).toPandas()
    t = pdf.groupby("lang").agg(s=("n_chars", "sum"),
                                n=("doc_id", "size"))
    got = out.set_index("lang").sort_index()
    for lang in t.index:
        assert abs(got.loc[lang, "r"] - t.loc[lang, "s"] / t.loc[lang, "n"]) < 1e-9
    assert set(out.m) == {t.s.min()}


def test_sibling_sees_full_set_despite_bucket_sort(eng):
    """ES computes sibling pipelines over the FULL bucket set; a
    bucket_sort truncation on the parent must not change avg_bucket
    (the drive caught this ordering bug in round 6)."""
    e, pdf = eng
    body = _body(
        {"top": {"bucket_sort": {"sort": [{"s": {"order": "desc"}}],
                                 "size": 2}}},
        {"avg_s": {"avg_bucket": {"buckets_path": "h>s"}}},
    )
    out = es_search(e, body).toPandas()
    t = _hist_twin(pdf)
    assert len(out) == 2
    for v in out.avg_s:
        assert abs(v - t.s.mean()) < 1e-9
