"""ES top_hits sub-aggregation: best-k scored hits per bucket over the
FULL match set, one rank window partitioned by (query, bucket). Twin:
pandas groupby over the engine's own full scored match set."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(
    n_groups=2, salt_threshold=40, n_salts=3, block_size=32,
    stored_fields=("lang", "n_chars"),
)

LANGS = ["en", "de", "fr"]


def _corpus(n=45):
    rows = []
    for i in range(n):
        toks = ["alpha", f"w{i}"]
        if i % 2 == 0:
            toks.append("even")
        if i % 3 == 0:
            toks.append("trip")
        rows.append((i, " ".join(toks), LANGS[i % 3], 50 + 10 * (i % 7)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "n_chars"])


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tophits")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def _full_scored(eng, spec):
    return eng.bool_topk([(0, spec)], k=1000).toPandas()


def _twin(scored, pdf, col, k_hits):
    m = scored.merge(pdf[["doc_id", col]], on="doc_id")
    m = m.sort_values(["score", "doc_id"], ascending=[False, True])
    out = []
    for key, g in m.groupby(col):
        for r, (_, row) in enumerate(g.iterrows(), start=1):
            if r <= k_hits:
                out.append((key, r, row.doc_id, row.score))
    return sorted(out)


def test_top_hits_per_lang(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {"must": "alpha"}
    got = eng.bool_top_hits([(0, spec)], group_by="lang", k_hits=2).toPandas()
    want = _twin(_full_scored(eng, spec), pdf, "lang", 2)
    assert sorted(zip(got.lang, got.hit_rank, got.doc_id)) == [
        (w[0], w[1], w[2]) for w in want
    ]
    for (_, _, d, s) in want:
        assert got[got.doc_id == d].score.iloc[0] == pytest.approx(s, abs=1e-12)


def test_top_hits_histogram_bucket(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {"must": "even"}
    got = eng.bool_top_hits(
        [(0, spec)], group_by=("n_chars", 30.0), k_hits=1
    ).toPandas()
    scored = _full_scored(eng, spec)
    m = scored.merge(pdf[["doc_id", "n_chars"]], on="doc_id")
    m["bucket"] = (m.n_chars // 30) * 30
    best = (
        m.sort_values(["score", "doc_id"], ascending=[False, True])
        .groupby("bucket")
        .head(1)
    )
    assert sorted(zip(got.n_chars_bucket, got.doc_id)) == sorted(
        zip(best.bucket, best.doc_id)
    )


def test_top_hits_bucket_size_cap(spark, idx):
    """size=2 keeps only the two biggest buckets (doc_count desc,
    key asc tiebreak)."""
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {"must": "alpha"}
    got = eng.bool_top_hits(
        [(0, spec)], group_by="lang", k_hits=1, size=2
    ).toPandas()
    scored = _full_scored(eng, spec)
    m = scored.merge(pdf[["doc_id", "lang"]], on="doc_id")
    counts = m.groupby("lang").size().reset_index(name="n")
    counts = counts.sort_values(["n", "lang"], ascending=[False, True])
    keep = set(counts.head(2).lang)
    assert set(got.lang) == keep


def test_top_hits_dsl_body(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    body = {
        "query": {"match": {"text": "trip"}},
        "aggs": {"by_lang": {"terms": {"field": "lang"},
                             "aggs": {"best": {"top_hits": {"size": 2}}}}},
    }
    got = es_search(eng, body).toPandas()
    want = eng.bool_top_hits(
        [(0, {"must": [{"match": {"query": "trip"}}]})],
        group_by="lang", k_hits=2,
    ).toPandas()
    assert sorted(zip(got.lang, got.hit_rank, got.doc_id)) == sorted(
        zip(want.lang, want.hit_rank, want.doc_id)
    )


def test_top_hits_empty_match_set(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    got = eng.bool_top_hits(
        [(0, {"must": "zzzmissing"})], group_by="lang", k_hits=2
    ).toPandas()
    assert got.empty


def test_top_hits_rejects_bad_options(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    with pytest.raises(ValueError, match="top_hits"):
        es_search(eng, {
            "query": {"match": {"text": "trip"}},
            "aggs": {"a": {"terms": {"field": "lang"},
                           "aggs": {"b": {"top_hits": {"from": 2}}}}},
        })
