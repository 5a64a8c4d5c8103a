"""ES 8 ``knn`` search body over a stored vector doc value: exact
cosine default, sign-LSH approximate path via num_candidates,
structured pre-filter, and the hybrid knn+query score-sum combine —
checked against numpy twins and the direct similarity operators."""

import numpy as np
import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_search
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

N = 50
PRIMES = (3, 5, 7, 11)


def _emb(i):
    return [((i * p) % 97 - 48) / 48.0 for p in PRIMES]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(N),
        "text": [("alpha beta " if i % 2 == 0 else "alpha gamma ")
                 + f"w{i}" for i in range(N)],
        "n_chars": [100 + 5 * i for i in range(N)],
        "emb": [_emb(i) for i in range(N)],
    })
    idx = str(tmp_path_factory.mktemp("knn") / "idx")
    IndexBuilder(spark, IndexConfig(
        n_groups=2, stored_fields=("n_chars", "emb"),
    )).build(spark.createDataFrame(pdf), idx)
    return QueryEngine(spark, idx), pdf


QV = [0.9, -0.2, 0.4, 0.1]


def _twin(pdf, qv, k, boost=1.0, pred=None):
    rows = []
    q = np.array(qv)
    for i in range(N):
        if pred and not pred(i):
            continue
        v = np.array(_emb(i))
        cos = round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6)
        rows.append((i, (1 + cos) / 2 * boost))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_knn_exact(eng):
    e, pdf = eng
    out = es_search(e, {"knn": {"field": "emb", "query_vector": QV,
                                "k": 7, "boost": 2.0}, "size": 7}).toPandas()
    want = _twin(pdf, QV, 7, boost=2.0)
    assert list(out.doc_id) == [d for d, _ in want]
    np.testing.assert_allclose(out.score, [s for _, s in want], rtol=1e-9)
    assert list(out["rank"]) == list(range(1, 8))


def test_knn_filter(eng):
    e, pdf = eng
    out = es_search(e, {"knn": {
        "field": "emb", "query_vector": QV, "k": 5,
        "filter": {"range": {"n_chars": {"gte": 200}}}}, "size": 5}
    ).toPandas()
    want = _twin(pdf, QV, 5, pred=lambda i: 100 + 5 * i >= 200)
    assert list(out.doc_id) == [d for d, _ in want]


def test_knn_lsh_path_parity(eng):
    """num_candidates routes to ann_topk_lsh — the DSL result equals
    the direct operator call with the same deterministic planes."""
    from pyspark.sql import functions as F

    from xml_to_es_spark.operators.similarity import (
        ann_topk_lsh,
        projection_matrix,
    )

    e, _pdf = eng
    out = es_search(e, {"knn": {"field": "emb", "query_vector": QV,
                                "k": 5, "num_candidates": 20},
                        "size": 5}).toPandas()
    dv = e._doc_values(["emb"]).filter(F.col("emb").isNotNull())
    qdf = e.spark.createDataFrame(
        [(0, [float(x) for x in QV])],
        schema="query_id long, q_vec array<double>")
    direct = ann_topk_lsh(dv, qdf, projection_matrix(4, n_planes=8),
                          k=5, key_col="doc_id", vec_col="emb").toPandas()
    assert list(out.doc_id) == list(direct.doc_id)
    np.testing.assert_allclose(
        out.score, [(1 + c) / 2 for c in direct.cosine], rtol=1e-9)
    with pytest.raises(ValueError, match="num_candidates must be"):
        es_search(e, {"knn": {"field": "emb", "query_vector": QV,
                              "k": 5, "num_candidates": 3}, "size": 5})


def test_knn_hybrid(eng):
    """knn + query: scores SUM over the union of both pages."""
    e, pdf = eng
    knn_only = es_search(e, {"knn": {"field": "emb", "query_vector": QV,
                                     "k": 10}, "size": 10}).toPandas()
    q_only = es_search(e, {"query": {"match": {"text": "beta"}},
                           "size": 10}).toPandas()
    both = es_search(e, {"knn": {"field": "emb", "query_vector": QV,
                                 "k": 10},
                         "query": {"match": {"text": "beta"}},
                         "size": 10}).toPandas()
    comb = {}
    for r in knn_only.itertuples():
        comb[r.doc_id] = comb.get(r.doc_id, 0.0) + r.score
    for r in q_only.itertuples():
        comb[r.doc_id] = comb.get(r.doc_id, 0.0) + r.score
    want = sorted(comb.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert list(both.doc_id) == [d for d, _ in want]
    np.testing.assert_allclose(both.score, [s for _, s in want], rtol=1e-9)


def test_knn_validation(eng):
    e, _pdf = eng
    with pytest.raises(ValueError, match="dims"):
        es_search(e, {"knn": {"field": "emb", "query_vector": [1.0, 2.0],
                              "k": 3}, "size": 3})
    with pytest.raises(ValueError, match="knn bodies support"):
        es_search(e, {"knn": {"field": "emb", "query_vector": QV, "k": 3},
                      "sort": [{"n_chars": {"order": "asc"}}], "size": 3})
    with pytest.raises(ValueError, match="knn takes"):
        es_search(e, {"knn": {"field": "emb", "query_vector": QV, "k": 3,
                              "similarity": 0.5}, "size": 3})
    with pytest.raises(ValueError, match="not stored"):
        es_search(e, {"knn": {"field": "nope", "query_vector": QV,
                              "k": 3}, "size": 3})
