"""ES ``nested`` field type + query: per-nested-object match scoping
over an array-of-struct doc value. The semantics nested exists for —
predicate CO-OCCURRENCE inside one object (the reference's
array-of-object metadata shapes, examples/mapping.json:5-9) — checked
against a pandas twin; the scoring contract is constant-per-object
combined by score_mode (documented deviation from ES's
BM25-over-nested-docs, see _BoolNested)."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_count, es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

N = 40


def _places(i):
    # doc i holds i%3 objects; country cycles, pop grows with ord —
    # the (usa, pop>=50) pair co-occurs in ONE object only for some
    # docs, which is exactly what the scoping tests need
    return [
        {"country": ["usa", "ussr", "uk"][(i + j) % 3],
         "pop": 10 * ((i + j) % 7) + j}
        for j in range(i % 3)
    ]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(N),
        "text": [("alpha beta " if i % 2 == 0 else "alpha gamma ")
                 + f"w{i}" for i in range(N)],
        "n_chars": [100 + 5 * i for i in range(N)],
    })
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    schema = ArrayType(StructType([
        StructField("country", StringType()),
        StructField("pop", LongType()),
    ]))
    pl = spark.createDataFrame(
        [(i, _places(i)) for i in range(N)],
        spark.range(1).select(
            F.lit(0).cast("long").alias("doc_id"),
            F.lit(None).cast(schema).alias("places"),
        ).schema,
    )
    docs = sdf.join(pl, "doc_id")
    idx = str(tmp_path_factory.mktemp("nested") / "idx")
    IndexBuilder(spark, IndexConfig(
        n_groups=2, stored_fields=("n_chars", "places"),
    )).build(docs, idx)
    return QueryEngine(spark, idx), pdf


def _match_one_object(i, fn):
    return [j for j, o in enumerate(_places(i)) if fn(o)]


def test_nested_cooccurrence_scoping(eng):
    """The point of nested: both predicates must hit the SAME object.
    A doc with (usa, pop=3) and (uk, pop=60) objects matches the
    flat pair but NOT the nested query."""
    e, _pdf = eng
    inner = {"bool": {"must": [
        {"term": {"places.country": "usa"}},
        {"range": {"places.pop": {"gte": 30}}},
    ]}}
    out = es_search(e, {"query": {"nested": {
        "path": "places", "query": inner}}, "size": N}).toPandas()
    want = sorted(
        i for i in range(N)
        if _match_one_object(
            i, lambda o: o["country"] == "usa" and o["pop"] >= 30)
    )
    assert sorted(out.doc_id) == want and len(want) > 0
    # the flat (cross-object) pair over exploded predicates matches
    # MORE docs — proves the scoping is real on this corpus
    cross = sorted(
        i for i in range(N)
        if _match_one_object(i, lambda o: o["country"] == "usa")
        and _match_one_object(i, lambda o: o["pop"] >= 30)
    )
    assert set(want) < set(cross)
    # scores: default score_mode avg → the constant 1.0
    assert set(out.score) == {1.0}


def test_nested_score_modes(eng):
    """sum → matching-object count × boost; avg/max → boost;
    none → 0. Twin-checked counts."""
    e, _pdf = eng
    inner = {"range": {"places.pop": {"gte": 10}}}
    n_match = {
        i: len(_match_one_object(i, lambda o: o["pop"] >= 10))
        for i in range(N)
    }
    out = es_search(e, {"query": {"nested": {
        "path": "places", "query": inner, "score_mode": "sum",
        "boost": 2.0}}, "size": N}).toPandas()
    assert sorted(out.doc_id) == sorted(i for i, n in n_match.items() if n)
    for r in out.itertuples():
        assert r.score == 2.0 * n_match[r.doc_id]
    for mode, val in [("avg", 3.0), ("max", 3.0), ("none", 0.0)]:
        got = es_search(e, {"query": {"nested": {
            "path": "places", "query": inner, "score_mode": mode,
            "boost": 3.0}}, "size": N}).toPandas()
        assert set(got.score) == {val}
        assert sorted(got.doc_id) == sorted(out.doc_id)


def test_nested_inside_bool_with_text(eng):
    """A nested should-clause adds its constant to the BM25 text
    score; in filter role it gates without scoring; in must_not it
    excludes."""
    e, _pdf = eng
    base = es_search(e, {"query": {"match": {"text": "beta"}},
                         "size": N}).toPandas().set_index("doc_id")
    nested_cl = {"nested": {"path": "places",
                            "query": {"term": {"places.country": "uk"}},
                            "boost": 5.0}}
    has_uk = {i for i in range(N)
              if _match_one_object(i, lambda o: o["country"] == "uk")}
    out = es_search(e, {"query": {"bool": {
        "must": [{"match": {"text": "beta"}}],
        "should": [nested_cl]}}, "size": N}).toPandas()
    for r in out.itertuples():
        want = base.loc[r.doc_id].score + (5.0 if r.doc_id in has_uk else 0.0)
        assert abs(r.score - want) < 1e-9
    filt = es_search(e, {"query": {"bool": {
        "must": [{"match": {"text": "beta"}}],
        "filter": [nested_cl]}}, "size": N}).toPandas()
    assert set(filt.doc_id) == set(base.index) & has_uk
    for r in filt.itertuples():  # filter context: no score change
        assert abs(r.score - base.loc[r.doc_id].score) < 1e-9
    mnot = es_search(e, {"query": {"bool": {
        "must": [{"match": {"text": "beta"}}],
        "must_not": [nested_cl]}}, "size": N}).toPandas()
    assert set(mnot.doc_id) == set(base.index) - has_uk


def test_nested_inner_bool_msm_and_should(eng):
    """Inner bool trees evaluate per OBJECT: should/minimum_should_match
    count matches within one element."""
    e, _pdf = eng
    inner = {"bool": {"should": [
        {"term": {"places.country": "usa"}},
        {"term": {"places.country": "ussr"}},
        {"range": {"places.pop": {"gte": 40}}},
    ], "minimum_should_match": 2}}
    out = es_search(e, {"query": {"nested": {
        "path": "places", "query": inner}}, "size": N}).toPandas()

    def ok(o):
        return (int(o["country"] == "usa") + int(o["country"] == "ussr")
                + int(o["pop"] >= 40)) >= 2

    want = sorted(i for i in range(N) if _match_one_object(i, ok))
    assert sorted(out.doc_id) == want and want


def test_nested_count_sort_and_bare_subfield(eng):
    """es_count routes nested; sort-by-field takes nested as the
    filter; bare sub-field names (no path prefix) resolve too."""
    e, _pdf = eng
    inner = {"term": {"country": "usa"}}  # bare sub-field
    want = sorted(i for i in range(N)
                  if _match_one_object(i, lambda o: o["country"] == "usa"))
    cnt = es_count(e, {"query": {"nested": {
        "path": "places", "query": inner}}}).toPandas()
    assert int(cnt["total"].iloc[0]) == len(want)
    srt = es_search(e, {"query": {"nested": {
        "path": "places", "query": inner}},
        "sort": [{"n_chars": {"order": "desc"}}], "size": 5}).toPandas()
    assert list(srt.doc_id) == sorted(want, reverse=True)[:5]
    # score-only keys (score_mode/boost/_name) are legal beside sort —
    # scores are unused there, so they strip instead of raising
    # 'nested takes path + query' (round-6 ADVICE)
    srt2 = es_search(e, {"query": {"nested": {
        "path": "places", "query": inner, "score_mode": "sum",
        "boost": 2.0, "_name": "nq"}},
        "sort": [{"n_chars": {"order": "desc"}}], "size": 5}).toPandas()
    assert list(srt2.doc_id) == list(srt.doc_id)


def test_nested_validation(eng):
    e, _pdf = eng
    with pytest.raises(ValueError, match="score_mode"):
        es_search(e, {"query": {"nested": {
            "path": "places", "query": {"term": {"country": "usa"}},
            "score_mode": "min"}}, "size": 3})
    with pytest.raises(ValueError, match="term/terms/range/exists/bool"):
        es_search(e, {"query": {"nested": {
            "path": "places",
            "query": {"match": {"country": "usa"}}}}, "size": 3})
    with pytest.raises(ValueError, match="path \\+ query"):
        es_search(e, {"query": {"nested": {"path": "places"}}, "size": 3})
    with pytest.raises(ValueError, match="path \\+ query"):
        es_search(e, {"query": {"nested": {
            "path": "places", "query": {"term": {"country": "usa"}},
            "ignore_unmapped": True}}, "size": 3})


def test_nested_plan_pure_jvm(eng):
    """The nested predicate/score compiles to higher-order array
    expressions — no Python evaluation in the plan beyond the one
    postings-decode kernel."""
    e, _pdf = eng
    out = es_search(e, {"query": {"bool": {
        "must": [{"match": {"text": "beta"}}],
        "should": [{"nested": {
            "path": "places",
            "query": {"term": {"places.country": "usa"}},
            "score_mode": "sum"}}]}}, "size": 10})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("MapInPandas") <= 1


def test_struct_only_must_not_candidates(eng):
    """Regression (round 6, found via nested q3): a structured-only
    rich tree with a structured must_not clause used to generate NO
    doc-values candidates (the all-leaves-pinned satisfiability test
    declared it unmatchable) and silently returned empty."""
    e, _pdf = eng
    out = es_search(e, {"query": {"bool": {
        "filter": [{"range": {"n_chars": {"gte": 200}}}],
        "must_not": [{"term": {"n_chars": 250}}]}}, "size": N}).toPandas()
    want = sorted(i for i in range(N)
                  if 100 + 5 * i >= 200 and 100 + 5 * i != 250)
    assert sorted(out.doc_id) == want and want
    # and the nested shape that exposed it: must-nested + must_not-nested
    got = es_search(e, {"query": {"bool": {
        "must": [{"nested": {"path": "places", "score_mode": "sum",
                             "query": {"range": {"places.pop": {"gte": 10}}}}}],
        "must_not": [{"nested": {
            "path": "places",
            "query": {"term": {"places.country": "uk"}}}}],
    }}, "size": N}).toPandas()
    want2 = sorted(
        i for i in range(N)
        if _match_one_object(i, lambda o: o["pop"] >= 10)
        and not _match_one_object(i, lambda o: o["country"] == "uk")
    )
    assert sorted(got.doc_id) == want2 and want2
