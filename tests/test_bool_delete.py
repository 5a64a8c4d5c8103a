"""ES bool query (must / should / must_not / filter occurrence types)
and the document-delete surface: DELETE by id via the append-only kill
log, resurrection by a later PUT, physical drop at compact, DELETE
/index, GET /index/_mapping."""

import numpy as np
import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder, load_kills
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(n_groups=2, salt_threshold=40, n_salts=3, block_size=32)


def _corpus(n=40):
    rows = []
    for i in range(n):
        toks = ["alpha"]
        if i % 2 == 0:
            toks.append("even")
        if i % 3 == 0:
            toks.append("trip")
        if i % 5 == 0:
            toks.append("penta")
        toks += [f"w{i}", "tail", "words"]
        rows.append((i, " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bool")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return root, pdf, path


def test_bool_must_is_conjunctive_match(spark, idx):
    """must-only bool ≡ match with operator:and — same hit set, same
    scores (both are the sum of the tokens' BM25 contributions)."""
    root, pdf, path = idx
    eng = QueryEngine(spark, path)
    got = eng.bool_topk([(1, {"must": "even trip"})], k=40).toPandas()
    want = eng.topk_distributed([(1, "even trip")], k=40, min_match="all").toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=1e-12)
    assert set(got.doc_id) == {i for i in range(40) if i % 6 == 0}


def test_bool_should_only_is_disjunctive_match(spark, idx):
    root, pdf, path = idx
    eng = QueryEngine(spark, path)
    got = eng.bool_topk([(1, {"should": "even trip"})], k=40).toPandas()
    want = eng.topk_distributed([(1, "even trip")], k=40).toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=1e-12)


def test_bool_must_not_excludes_without_rescoring(spark, idx):
    root, pdf, path = idx
    eng = QueryEngine(spark, path)
    base = eng.bool_topk([(1, {"must": "even"})], k=40).toPandas()
    got = eng.bool_topk([(1, {"must": "even", "must_not": "trip"})], k=40).toPandas()
    assert set(got.doc_id) == {i for i in range(40) if i % 2 == 0 and i % 3 != 0}
    kept = base[base.doc_id.isin(got.doc_id)]
    assert dict(zip(got.doc_id, got.score)) == pytest.approx(
        dict(zip(kept.doc_id, kept.score))
    )


def test_bool_filter_constrains_without_scoring(spark, idx):
    root, pdf, path = idx
    eng = QueryEngine(spark, path)
    # must even + filter trip: hit set = both present, score = even only
    got = eng.bool_topk([(1, {"must": "even", "filter": "trip"})], k=40).toPandas()
    assert set(got.doc_id) == {i for i in range(40) if i % 6 == 0}
    only_even = eng.bool_topk([(1, {"must": "even"})], k=40).toPandas()
    ref = dict(zip(only_even.doc_id, only_even.score))
    for r in got.itertuples():
        assert r.score == pytest.approx(ref[r.doc_id])
    # filter-only bool: ES filter context — matches, score 0
    fo = eng.bool_topk([(1, {"filter": "even trip"})], k=40).toPandas()
    assert set(fo.doc_id) == {i for i in range(40) if i % 6 == 0}
    assert set(fo.score) == {0.0}


def test_bool_edge_semantics(spark, idx):
    root, pdf, path = idx
    eng = QueryEngine(spark, path)
    # a must token absent from the corpus matches nothing (ES)
    assert eng.bool_topk([(1, {"must": "alpha zzz_absent"})], k=5).count() == 0
    # absent must_not token excludes nothing
    got = eng.bool_topk([(1, {"must": "penta", "must_not": "zzz_absent"})], k=40)
    assert got.count() == 8
    # several queries batch independently
    two = eng.bool_topk(
        [(1, {"must": "even"}), (2, {"should": "penta", "must_not": "even"})],
        k=40,
    ).toPandas()
    assert set(two[two.query_id == 2].doc_id) == {5, 15, 25, 35}
    # must_not beside a positive role for the same token is rejected
    # (positive dual roles are ALLOWED — see test_bool_dual_role_tokens)
    with pytest.raises(ValueError, match="must_not AND a positive"):
        eng.bool_topk([(1, {"must": "alpha", "must_not": "alpha"})], k=5)
    with pytest.raises(ValueError, match="unknown bool clause"):
        eng.bool_topk([(1, {"mustnt": "alpha"})], k=5)
    # must_not-only ≙ match_all minus exclusions: explicit error, not
    # a silent empty result
    with pytest.raises(ValueError, match="must_not-only"):
        eng.bool_topk([(1, {"must_not": "even"})], k=5)


def test_delete_matches_rebuild_and_resurrects(spark, tmp_path):
    """DELETE by id: rankings over the survivor set are bit-equal to a
    fresh rebuild without the deleted docs (df/N/avgdl all corrected);
    a later PUT of the same id resurrects it."""
    pdf = _corpus(20)
    path = str(tmp_path / "didx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    res = IndexBuilder(spark).delete_docs([0, 6, 12, 99], path)
    assert res["n_deleted"] == 3 and res["n_not_found"] == 1
    assert set(load_kills(spark, path)) == {0, 6, 12}

    eng = QueryEngine(spark, path)
    assert eng.n_docs == 17
    rebuild = str(tmp_path / "rb")
    IndexBuilder(spark, CFG).build(
        spark.createDataFrame(pdf[~pdf.doc_id.isin([0, 6, 12])]), rebuild
    )
    engr = QueryEngine(spark, rebuild)
    qs = [(1, "even trip"), (2, "alpha"), (3, "penta tail")]
    for q in (qs,):
        a = eng.topk(q, k=20).toPandas()
        b = engr.topk(q, k=20).toPandas()
        assert list(a.doc_id) == list(b.doc_id)
        assert list(a.score) == list(b.score)  # bit-equal

    # resurrection: PUT doc 6 back with new content
    patch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [6], "text": ["resurrected unique zeta"]})
    )
    up = IndexBuilder(spark).upsert(patch, path)
    assert up["mode"] == "delta" and up["n_new"] == 1 and up["n_changed"] == 0
    eng2 = QueryEngine(spark, path)
    assert eng2.n_docs == 18
    hit = eng2.topk([(1, "zeta")], k=5).toPandas()
    assert list(hit.doc_id) == [6]

    # fetch must not return the dead versions
    assert QueryEngine(spark, path).fetch([0, 6, 12]).count() == 1


def test_delete_then_compact_drops_physically(spark, tmp_path):
    pdf = _corpus(15)
    path = str(tmp_path / "didx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    IndexBuilder(spark).delete_docs([1, 2], path)
    out = str(tmp_path / "c")
    res = IndexBuilder(spark).compact(path, out)
    assert res["n_docs"] == 13
    eng = QueryEngine(spark, out, max_tombstones=0)  # no kill state left
    assert eng.n_docs == 13
    assert eng.topk([(1, "w1 w2")], k=5).count() == 0
    # deletes also combine with upsert tombstones in one kill log
    IndexBuilder(spark).upsert(
        spark.createDataFrame(pd.DataFrame({"doc_id": [3], "text": ["patched w3"]})),
        path,
    )
    IndexBuilder(spark).delete_docs([4], path)
    eng2 = QueryEngine(spark, path)
    assert eng2.n_docs == 12
    assert eng2.topk([(1, "w4")], k=5).count() == 0
    assert list(eng2.topk([(1, "patched")], k=5).toPandas().doc_id) == [3]


def test_prefix_topk_match_bool_prefix(spark, tmp_path):
    """ES match_bool_prefix: last token expands against the dictionary
    (term order, capped), others match exactly; expansions score with
    their own idf — equivalent to a regular match over the expanded
    token set."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(12),
            "text": [
                "alpha joint w%d" % i if i % 3 == 0 else
                "alpha join w%d" % i if i % 3 == 1 else
                "alpha jolt w%d" % i
                for i in range(12)
            ],
        }
    )
    path = str(tmp_path / "p_idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    eng = QueryEngine(spark, path)
    assert eng.prefix_variants(["jo"])["jo"] == ["join", "joint", "jolt"]
    assert eng.prefix_variants(["jo"], max_expansions=2)["jo"] == ["join", "joint"]
    got = eng.prefix_topk([(1, "alpha jo")], k=12, n_ranges=2).toPandas()
    want = eng.topk_distributed([(1, "alpha join joint jolt")], k=12).toPandas()
    assert set(got.doc_id) == set(range(12)) == set(want.doc_id)
    assert dict(zip(got.doc_id, got.score)) == pytest.approx(
        dict(zip(want.doc_id, want.score))
    )
    # cap changes the expansion set: only join/joint cursors remain
    capped = eng.prefix_topk([(1, "alpha jo")], k=12, max_expansions=2).toPandas()
    want2 = eng.topk_distributed([(1, "alpha join joint")], k=12).toPandas()
    assert dict(zip(capped.doc_id, capped.score)) == pytest.approx(
        dict(zip(want2.doc_id, want2.score))
    )
    # no expansion → query contributes nothing (ES: prefix matches 0 terms)
    assert eng.prefix_topk([(1, "alpha zzz")], k=12).toPandas().pipe(
        lambda d: set(d.doc_id)
    ) == set(range(12))  # 'alpha' still matches; zzz* adds no cursor
    assert eng.prefix_topk([(1, "zzzq")], k=5).count() == 0


def test_search_aggs_full_match_set(spark, tmp_path):
    """ES aggregations run over EVERY matching doc (not the top-k
    page): terms bucket on a stored doc-value + avg/max sub-aggs,
    verified against a pandas ground truth; doc values survive
    upsert (inherited mapping) and the deleted docs drop out."""
    pdf = _corpus(30)
    pdf["cat"] = ["c" + str(i % 3) for i in range(30)]
    pdf["n_chars"] = [len(t) for t in pdf.text]
    path = str(tmp_path / "agg_idx")
    cfg = IndexConfig(
        n_groups=2, salt_threshold=40, n_salts=3,
        stored_fields=("cat", "n_chars"),
    )
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), path)
    eng = QueryEngine(spark, path)
    got = eng.search_aggs(
        [(1, "even"), (2, "trip penta")],
        group_by="cat",
        metrics={"avg_chars": ("avg", "n_chars"), "max_chars": ("max", "n_chars")},
    ).toPandas()

    def want(mask):
        g = pdf[mask].groupby("cat")
        return {
            c: (len(x), x.n_chars.mean(), x.n_chars.max())
            for c, x in g
        }
    w1 = want(pdf.doc_id % 2 == 0)
    w2 = want((pdf.doc_id % 3 == 0) | (pdf.doc_id % 5 == 0))
    for qid, w in ((1, w1), (2, w2)):
        rows = got[got.query_id == qid]
        assert {
            r.cat: (r.doc_count, r.avg_chars, r.max_chars)
            for r in rows.itertuples()
        } == pytest.approx(w)
    # min_match="all": conjunctive match set
    conj = eng.search_aggs(
        [(1, "trip penta")], group_by="cat", min_match="all"
    ).toPandas()
    w = want((pdf.doc_id % 3 == 0) & (pdf.doc_id % 5 == 0))
    assert {r.cat: r.doc_count for r in conj.itertuples()} == {
        c: n for c, (n, _a, _m) in w.items()
    }
    # an unstored column errors with guidance; docs= override works
    with pytest.raises(ValueError, match="not stored in this index"):
        eng.search_aggs([(1, "even")], group_by="nope")
    ext = eng.search_aggs(
        [(1, "even")], group_by="cat",
        docs=spark.createDataFrame(pdf[["doc_id", "cat"]]),
    ).toPandas()
    assert {r.cat: r.doc_count for r in ext.itertuples()} == {
        c: n for c, (n, _a, _m) in w1.items()
    }
    # mapping records stored_fields; delete removes docs from buckets
    assert IndexBuilder(spark).get_mapping(path)["stored_fields"] == (
        "cat", "n_chars",
    )
    IndexBuilder(spark).delete_docs([0], path)
    after = QueryEngine(spark, path).search_aggs(
        [(1, "even")], group_by="cat"
    ).toPandas()
    w1d = want((pdf.doc_id % 2 == 0) & (pdf.doc_id != 0))
    assert {r.cat: r.doc_count for r in after.itertuples()} == {
        c: n for c, (n, _a, _m) in w1d.items()
    }


def test_search_aggs_histogram_and_cardinality(spark, tmp_path):
    """ES histogram buckets (floor(col/interval)·interval) and the
    cardinality sub-agg (approximate, HLL) / count_distinct (exact)."""
    pdf = _corpus(20)
    pdf["cat"] = ["c" + str(i % 4) for i in range(20)]
    pdf["n_chars"] = [len(t) for t in pdf.text]
    path = str(tmp_path / "h_idx")
    IndexBuilder(
        spark,
        IndexConfig(n_groups=2, stored_fields=("cat", "n_chars")),
    ).build(spark.createDataFrame(pdf), path)
    eng = QueryEngine(spark, path)
    hist = eng.search_aggs(
        [(1, "even")], group_by=("n_chars", 5),
        metrics={"cats": ("count_distinct", "cat")},
    ).toPandas()
    m = pdf[pdf.doc_id % 2 == 0].copy()
    m["bucket"] = (m.n_chars // 5) * 5
    want = {
        int(b): (len(x), x.cat.nunique())
        for b, x in m.groupby("bucket")
    }
    assert {
        int(r.n_chars_bucket): (r.doc_count, r.cats) for r in hist.itertuples()
    } == want
    card = eng.search_aggs(
        [(1, "even")], group_by="cat",
        metrics={"approx": ("cardinality", "n_chars")},
    ).toPandas()
    truth = m.groupby("cat").n_chars.nunique()
    for r in card.itertuples():
        assert 1 <= r.approx <= truth[r.cat] * 2  # HLL estimate, sane range
    with pytest.raises(ValueError, match="unsupported fn"):
        eng.search_aggs([(1, "even")], group_by="cat",
                        metrics={"x": ("median", "n_chars")})


def test_delete_index_and_get_mapping(spark, tmp_path):
    pdf = _corpus(8)
    path = str(tmp_path / "didx")
    cfg = IndexConfig(n_groups=2, store_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), path)
    b = IndexBuilder(spark)
    m = b.get_mapping(path)
    assert m["indexed_fields"] == ("text",)
    assert m["store_positions"] is True and m["store_source"] is False
    assert "token_pattern" in m
    with pytest.raises(ValueError, match="not an index root"):
        b.delete_index(str(tmp_path))
    res = b.delete_index(path)
    assert res["mode"] == "delete_index"
    import os

    assert not os.path.exists(path)


def test_bool_structured_filter_context(spark, tmp_path):
    """ES structured filter context: term/terms/range/exists clauses
    over stored doc values combine with match clauses (score from
    text only), and a structured-only query is match_all+filter with
    score 0. Oracle-style cross-check against a DataFrame twin."""
    from xml_to_es_spark.config import IndexConfig
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.operators.query_engine import QueryEngine

    pdf = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [f"alpha w{i} {'beta' if i % 2 else 'gamma'}" for i in range(30)],
            "lang": [["en", "de", "fr"][i % 3] for i in range(30)],
            "n_chars": [50 + 10 * i for i in range(30)],
        }
    )
    idx = str(tmp_path / "structidx")
    IndexBuilder(
        spark,
        IndexConfig(n_groups=1, stored_fields=("lang", "n_chars")),
    ).build(spark.createDataFrame(pdf), idx)
    eng = QueryEngine(spark, idx)

    out = eng.bool_topk(
        [
            # match + term + range: alpha docs, lang=en, 100<=n_chars<250
            (1, {"must": "alpha",
                 "filter": [{"term": {"lang": "en"}},
                            {"range": {"n_chars": {"gte": 100, "lt": 250}}}]}),
            # structured-only: match_all + filter, score 0
            (2, {"filter": [{"terms": {"lang": ["de", "fr"]}},
                            {"range": {"n_chars": {"lte": 90}}}]}),
            # structured + must_not exclusion
            (3, {"filter": [{"term": {"lang": "en"}}],
                 "must_not": "beta"}),
            # mixed list: match-in-filter + structured
            (4, {"should": "beta",
                 "filter": [{"match": "alpha"},
                            {"exists": {"field": "lang"}},
                            {"range": {"n_chars": {"gt": 300}}}]}),
        ],
        k=30,
    ).toPandas().sort_values(["query_id", "rank"])

    q1 = out[out.query_id == 1]
    want1 = set(
        pdf[(pdf.lang == "en") & (pdf.n_chars >= 100) & (pdf.n_chars < 250)].doc_id
    )
    assert set(q1.doc_id) == want1 and (q1.score > 0).all()

    q2 = out[out.query_id == 2]
    want2 = pdf[(pdf.lang.isin(["de", "fr"])) & (pdf.n_chars <= 90)]
    assert list(q2.doc_id) == sorted(want2.doc_id)  # score-0 ties → doc_id order
    assert (q2.score == 0.0).all()

    q3 = out[out.query_id == 3]
    want3 = pdf[(pdf.lang == "en") & (pdf.doc_id % 2 == 0)]  # beta = odd ids
    assert set(q3.doc_id) == set(want3.doc_id)
    assert (q3.score == 0.0).all()  # filter-only scoring context

    q4 = out[out.query_id == 4]
    want4 = pdf[pdf.n_chars > 300]
    assert set(q4.doc_id) == set(want4.doc_id)
    # should-clause scores only beta (odd) docs; alpha filter scores 0
    assert (q4[q4.doc_id % 2 == 1].score > 0).all()
    assert (q4[q4.doc_id % 2 == 0].score == 0.0).all()

    # unknown structured kind / bad range bound are rejected
    with pytest.raises(ValueError, match="unknown structured"):
        eng.bool_topk([(1, {"filter": [{"regexp": {"lang": "e.*"}}]})])
    with pytest.raises(ValueError, match="unknown bound"):
        eng.bool_topk([(1, {"filter": [{"range": {"n_chars": {"ge": 1}}}]})])
    # must_not-only is still rejected WITHOUT a bounding filter
    with pytest.raises(ValueError, match="must_not-only"):
        eng.bool_topk([(1, {"must_not": "alpha"})])


def test_bool_dual_role_tokens(spark, tmp_path):
    """ES allows one token in several positive roles: must+should
    double-scores it (sum of both clauses), must+filter scores it once
    but requires it in both counts; must_not beside a positive role is
    contradictory and rejected."""
    pdf = pd.DataFrame(
        {"doc_id": range(20), "text": [f"alpha w{i} {'beta' if i % 2 else 'gam'}"
                                        for i in range(20)]}
    )
    idx = str(tmp_path / "dualidx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), idx)
    eng = QueryEngine(spark, idx)

    base = eng.bool_topk([(1, {"must": "alpha"})], k=20).toPandas()
    dbl = eng.bool_topk([(1, {"must": "alpha", "should": "alpha"})], k=20).toPandas()
    assert list(dbl["doc_id"]) == list(base["doc_id"])
    np.testing.assert_allclose(dbl["score"], 2.0 * base["score"], rtol=1e-12)

    mf = eng.bool_topk([(1, {"must": "alpha", "filter": "alpha"})], k=20).toPandas()
    assert list(mf["doc_id"]) == list(base["doc_id"])
    np.testing.assert_allclose(mf["score"], base["score"], rtol=1e-12)

    with pytest.raises(ValueError, match="must_not AND a positive"):
        eng.bool_topk([(1, {"must": "alpha", "must_not": "alpha beta"})])


def test_bool_aggs_filtered_aggregations(spark, tmp_path):
    """ES filtered aggregations: bucket aggs over the FULL match set
    of a bool query (text + structured filter context) — verified
    against a pandas twin of the same semantics."""
    from xml_to_es_spark.config import IndexConfig
    from xml_to_es_spark.operators.es_query import es_search
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.operators.query_engine import QueryEngine

    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"alpha w{i} {'beta' if i % 2 else 'gam'}" for i in range(40)],
            "lang": [["en", "de", "fr", "es"][i % 4] for i in range(40)],
            "n_chars": [100 + i for i in range(40)],
        }
    )
    idx = str(tmp_path / "baggidx")
    IndexBuilder(
        spark, IndexConfig(n_groups=1, stored_fields=("lang", "n_chars"))
    ).build(spark.createDataFrame(pdf), idx)
    eng = QueryEngine(spark, idx)

    clauses = {"must": "alpha", "must_not": "beta",
               "filter": [{"range": {"n_chars": {"gte": 110}}}]}
    got = (
        eng.bool_aggs(
            [(1, clauses)], group_by="lang",
            metrics={"mx": ("max", "n_chars")},
        )
        .toPandas().sort_values("lang").reset_index(drop=True)
    )
    m = pdf[(pdf.doc_id % 2 == 0) & (pdf.n_chars >= 110)]  # beta = odd ids
    want = (
        m.groupby("lang").agg(doc_count=("doc_id", "size"), mx=("n_chars", "max"))
        .reset_index().sort_values("lang").reset_index(drop=True)
    )
    assert list(got["lang"]) == list(want["lang"])
    assert list(got["doc_count"]) == list(want["doc_count"])
    assert list(got["mx"]) == list(want["mx"])

    # DSL routing: same body through es_search (aggs + bool)
    dsl = (
        es_search(eng, {
            "query": {"bool": {
                "must": {"match": {"text": "alpha"}},
                "must_not": {"match": {"text": "beta"}},
                "filter": [{"range": {"n_chars": {"gte": 110}}}]}},
            "aggs": {"langs": {"terms": {"field": "lang"},
                               "aggs": {"mx": {"max": {"field": "n_chars"}}}}},
        })
        .toPandas().sort_values("lang").reset_index(drop=True)
    )
    assert list(dsl["doc_count"]) == list(want["doc_count"])

    # structured-only aggs (match_all + filter analytics)
    s_only = es_search(eng, {
        "query": {"range": {"n_chars": {"lt": 104}}},
        "aggs": {"langs": {"terms": {"field": "lang"}}},
    }).toPandas()
    assert s_only["doc_count"].sum() == 4
