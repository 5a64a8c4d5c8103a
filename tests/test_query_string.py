"""Full Lucene query_string syntax: the parser compiles to the rich
bool tree (parser unit tests, pure python), the DSL route returns
exactly what the equivalent hand-built bool body returns (translation
identity), expansion atoms match the standalone fuzzy/wildcard kinds,
and the new in-tree constant_score clause scores the documented
constant."""

import numpy as np
import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_count, es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine
from xml_to_es_spark.operators.query_string import parse_query_string


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                f"alpha w{i} " + ("beta " * (i % 3))
                + ("gamma" if i % 5 == 0 else "")
                for i in range(40)
            ],
            "lang": [["en", "de"][i % 2] for i in range(40)],
            "n_chars": [100 + 3 * i for i in range(40)],
        }
    )
    idx = str(tmp_path_factory.mktemp("qs") / "idx")
    IndexBuilder(
        spark,
        IndexConfig(
            n_groups=2, store_positions=True,
            stored_fields=("lang", "n_chars"),
        ),
    ).build(spark.createDataFrame(pdf), idx)
    return QueryEngine(spark, idx)


def _same(a, b, rtol=0.0):
    a = a.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    np.testing.assert_allclose(a["score"], b["score"], rtol=rtol, atol=0)


# -- parser (pure python) -----------------------------------------------------


def test_parser_implicit_and_markers():
    assert parse_query_string("hash join") == {
        "should": [{"match": {"query": "hash"}},
                   {"match": {"query": "join"}}]
    }
    assert parse_query_string("hash join", default_operator="and") == {
        "must": [{"match": {"query": "hash"}},
                 {"match": {"query": "join"}}]
    }
    assert parse_query_string("+a -b c") == {
        "must": [{"match": {"query": "a"}}],
        "must_not": [{"match": {"query": "b"}}],
        "should": [{"match": {"query": "c"}}],
    }


def test_parser_precedence_and_grouping():
    # AND binds tighter than OR
    assert parse_query_string("a OR b AND c") == {
        "should": [
            {"match": {"query": "a"}},
            {"bool": {"must": [{"match": {"query": "b"}},
                               {"match": {"query": "c"}}]}},
        ]
    }
    assert parse_query_string("(a OR b) AND NOT c") == {
        "must": [{"bool": {"should": [{"match": {"query": "a"}},
                                      {"match": {"query": "b"}}]}}],
        "must_not": [{"match": {"query": "c"}}],
    }
    # && / || / ! synonyms
    assert parse_query_string("a && !b") == parse_query_string("a AND NOT b")


def test_parser_atom_options():
    assert parse_query_string('"sort merge"~2^3 fast') == {
        "should": [
            {"match_phrase": {"query": "sort merge", "slop": 2,
                              "boost": 3.0}},
            {"match": {"query": "fast"}},
        ]
    }
    assert parse_query_string("title:hash body:(a AND b)") == {
        "should": [
            {"match": {"query": "hash", "field": "title"}},
            {"bool": {"must": [{"match": {"query": "a", "field": "body"}},
                               {"match": {"query": "b", "field": "body"}}]}},
        ]
    }
    assert parse_query_string("(a b)^2") == {
        "should": [{"match": {"query": "a"}}, {"match": {"query": "b"}}],
        "boost": 2.0,
    }


def test_parser_docvalue_fields():
    spec = parse_query_string(
        "lang:en n_chars:[100 TO 500} alpha",
        docvalue_fields={"lang", "n_chars"},
    )
    assert spec == {
        "should": [
            {"constant_score": {"filter": {"term": {"lang": "en"}}}},
            {"constant_score": {"filter": {"range": {
                "n_chars": {"gte": 100, "lt": 500}}}}},
            {"match": {"query": "alpha"}},
        ]
    }
    # open bound + boost
    spec = parse_query_string(
        "n_chars:[* TO 200]^2 alpha", docvalue_fields={"n_chars"},
    )
    assert spec["should"][0] == {
        "constant_score": {"filter": {"range": {"n_chars": {"lte": 200}}},
                           "boost": 2.0}
    }


def test_parser_rejections():
    for bad in (
        "NOT a",                  # corpus complement
        "-a",                     # same
        "a OR NOT b",             # unbounded OR branch
        "+a AND b",               # marker/operator mix
        "a AND b c",              # adjacency/operator mix
        "a AND",                  # dangling operator
        '"unterminated',          # quote
        "[1 TO 2]",               # field-less range
        "",                       # empty
        "n_chars:[* TO *]",       # matches everything
        "a^x",                    # boost needs a number
    ):
        with pytest.raises(ValueError):
            parse_query_string(bad, docvalue_fields={"n_chars"})
    # expansion atoms need an engine-backed expander
    for needs_engine in ("fuzz~1", "wild*"):
        with pytest.raises(ValueError, match="expander"):
            parse_query_string(needs_engine)


# -- DSL translation identity -------------------------------------------------


def test_qs_translation_identity(eng):
    pairs = [
        (
            "alpha AND beta",
            {"bool": {"must": [{"match": {"text": "alpha"}},
                               {"match": {"text": "beta"}}]}},
        ),
        (
            "+alpha -gamma beta",
            {"bool": {"must": [{"match": {"text": "alpha"}}],
                      "must_not": [{"match": {"text": "gamma"}}],
                      "should": [{"match": {"text": "beta"}}]}},
        ),
        (
            '"alpha w3" OR beta',
            {"bool": {"should": [{"match_phrase": {"text": "alpha w3"}},
                                 {"match": {"text": "beta"}}]}},
        ),
        (
            "alpha^2 beta",
            {"bool": {"should": [
                {"match": {"text": {"query": "alpha", "boost": 2.0}}},
                {"match": {"text": "beta"}},
            ]}},
        ),
    ]
    for qs, body in pairs:
        _same(
            es_search(eng, {"query": {"query_string": {"query": qs}},
                            "size": 10}),
            es_search(eng, {"query": body, "size": 10}),
        )


def test_qs_docvalue_and_range_score_constants(eng):
    # every doc contains alpha; en docs (even ids) get +0.5
    base = es_search(
        eng, {"query": {"match": {"text": "alpha"}}, "size": 40}
    ).toPandas().set_index("doc_id")["score"]
    out = es_search(eng, {
        "query": {"query_string": {"query": 'alpha lang:en^0.5'}},
        "size": 40,
    }).toPandas().set_index("doc_id")["score"]
    for did, s in out.items():
        want = base[did] + (0.5 if did % 2 == 0 else 0.0)
        assert abs(s - want) < 1e-9, (did, s, want)
    # a pure-filter query string: constant scores, ranked by doc_id
    flt = es_search(eng, {
        "query": {"query_string": {
            "query": "lang:en AND n_chars:[100 TO 130]"}},
        "size": 40,
    }).toPandas()
    want_ids = [d for d in range(40)
                if d % 2 == 0 and 100 <= 100 + 3 * d <= 130]
    assert list(flt["doc_id"]) == want_ids
    assert set(flt["score"]) == {2.0}  # two constant_score(1.0) musts


def test_qs_expansion_atoms_match_standalone_kinds(eng):
    # fuzzy atom ≡ the fuzzy query kind (per-variant idf expansion)
    _same(
        es_search(eng, {"query": {"query_string": {"query": "alphq~1"}},
                        "size": 10}),
        es_search(eng, {"query": {"fuzzy": {"text": {
            "value": "alphq", "fuzziness": 1}}}, "size": 10}),
        rtol=1e-9,
    )
    # wildcard atom ≡ the wildcard kind (constant_score rewrite)
    _same(
        es_search(eng, {"query": {"query_string": {"query": "gamm*"}},
                        "size": 10}),
        es_search(eng, {"query": {"wildcard": {"text": {
            "value": "gamm*"}}}, "size": 10}),
    )
    # zero-expansion pattern matches nothing but doesn't fail the query
    out = es_search(eng, {
        "query": {"query_string": {"query": "alpha zzzqqq*"}},
        "size": 5,
    })
    _same(out, es_search(eng, {"query": {"match": {"text": "alpha"}},
                               "size": 5}))


def test_qs_composes_with_count_and_sort(eng):
    total = es_count(eng, {
        "query": {"query_string": {"query": "alpha AND beta"}}
    }).collect()[0]["total"]
    want = sum(1 for i in range(40) if i % 3)  # beta in i%3 != 0 docs
    assert total == want
    out = es_search(eng, {
        "query": {"query_string": {"query": "alpha AND beta"}},
        "sort": [{"n_chars": {"order": "desc"}}], "size": 3,
    }).toPandas()
    want_ids = sorted(
        (i for i in range(40) if i % 3), key=lambda i: -(100 + 3 * i)
    )[:3]
    assert list(out["doc_id"]) == want_ids


def test_qs_rejects_unknown_options(eng):
    with pytest.raises(ValueError, match="query_string supports"):
        es_search(eng, {"query": {"query_string": {
            "query": "a", "fields": ["text"]}}, "size": 5})
    with pytest.raises(ValueError, match="search_after"):
        es_search(eng, {"query": {"query_string": {"query": "alpha"}},
                        "search_after": [1.0, 3], "size": 5})


# -- in-tree constant_score ---------------------------------------------------


def test_constant_score_inside_bool(eng):
    base = es_search(
        eng, {"query": {"match": {"text": "alpha"}}, "size": 40}
    ).toPandas().set_index("doc_id")["score"]
    out = es_search(eng, {
        "query": {"bool": {
            "must": [{"match": {"text": "alpha"}}],
            "should": [{"constant_score": {
                "filter": {"term": {"lang": "en"}}, "boost": 0.25}}],
        }},
        "size": 40,
    }).toPandas().set_index("doc_id")["score"]
    for did, s in out.items():
        want = base[did] + (0.25 if did % 2 == 0 else 0.0)
        assert abs(s - want) < 1e-9, (did, s, want)
    # in filter context the constant pins to 0 (ES filter semantics)
    filt = es_search(eng, {
        "query": {"bool": {
            "must": [{"match": {"text": "alpha"}}],
            "filter": [{"constant_score": {
                "filter": {"term": {"lang": "en"}}, "boost": 9.0}}],
        }},
        "size": 40,
    }).toPandas()
    assert set(filt["doc_id"]) == {d for d in range(40) if d % 2 == 0}
    for _, r in filt.iterrows():
        assert abs(r["score"] - base[r["doc_id"]]) < 1e-9


def test_docvalue_fields_retrieval(eng):
    """ES docvalue_fields: stored columns returned per hit via the
    pushed-id fetch pattern; unknown columns raise; combines with
    any query kind."""
    out = es_search(eng, {
        "query": {"query_string": {"query": "alpha AND beta"}},
        "size": 6, "docvalue_fields": ["lang", "n_chars"],
    }).toPandas()
    assert {"lang", "n_chars"} <= set(out.columns) and len(out) == 6
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        assert r["lang"] == ["en", "de"][d % 2]
        assert int(r["n_chars"]) == 100 + 3 * d
    with pytest.raises(ValueError, match="not stored"):
        es_search(eng, {"query": {"match": {"text": "alpha"}},
                        "size": 2, "docvalue_fields": ["nope"]})
    with pytest.raises(ValueError, match="non-empty list"):
        es_search(eng, {"query": {"match": {"text": "alpha"}},
                        "size": 2, "docvalue_fields": "lang"})


def test_validate_query(eng):
    from xml_to_es_spark.operators.es_query import es_validate_query

    v = es_validate_query(eng, {"query": {"query_string": {
        "query": 'alpha AND (beta OR "alpha w3") AND lang:en'}}})
    assert v["valid"] is True and "alpha" in v["explanation"]
    # non-bool-expressible kinds plan without executing
    v = es_validate_query(eng, {"query": {"multi_match": {
        "query": "alpha beta", "fields": ["text"]}}})
    assert v["valid"] is True and "multi_match" in v["explanation"]
    # bad bodies are INVALID, not raised (the ES _validate contract)
    for bad in (
        {"query": {"query_string": {"query": "NOT alpha"}}},
        {"query": {"match": {"text": "a", "nope": 1}}},
        {"query": {"bool": {"must_not": [{"match": {"text": "a"}}]}}},
        {"query": {"match": {"text": "a"}}, "size": 3},
        {},
    ):
        assert es_validate_query(eng, bad)["valid"] is False


def test_constant_score_top_level_vs_in_tree(eng):
    _same(
        es_search(eng, {"query": {"constant_score": {
            "filter": {"term": {"lang": "de"}}, "boost": 1.5}},
            "size": 40}),
        es_search(eng, {"query": {"bool": {"must": [{"constant_score": {
            "filter": {"term": {"lang": "de"}}, "boost": 1.5}}]}},
            "size": 40}),
    )


def test_source_filtering(eng):
    """ES _source: a column list is the pushed-id retrieval synonym of
    docvalue_fields (the docs table IS the source store here);
    booleans are the ES defaults (no-ops); list beside
    docvalue_fields rejects."""
    out = es_search(eng, {
        "query": {"match": {"text": "alpha"}},
        "size": 4, "_source": ["lang"],
    }).toPandas()
    assert "lang" in out.columns and len(out) == 4
    ok = es_search(eng, {"query": {"match": {"text": "alpha"}},
                         "size": 2, "_source": False}).toPandas()
    assert "lang" not in ok.columns
    with pytest.raises(ValueError, match="pick one"):
        es_search(eng, {"query": {"match": {"text": "alpha"}}, "size": 2,
                        "_source": ["lang"], "docvalue_fields": ["lang"]})
    with pytest.raises(ValueError, match="column list"):
        es_search(eng, {"query": {"match": {"text": "alpha"}}, "size": 2,
                        "_source": "lang"})
