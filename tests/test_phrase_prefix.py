"""ES match_phrase_prefix: last token expands against the dictionary
(capped), each expansion forms an exact phrase, doc score = max over
matching expansion phrases (dis_max across expansions)."""

import numpy as np
import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(n_groups=2, block_size=32, store_positions=True)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    rows = []
    for i in range(30):
        words = ["alpha", f"suffix{i % 4}"]  # "alpha suffix0..3" phrases
        if i % 3 == 0:
            words += ["alpha", "sun"]        # second expansion family
        rows.append((i, " ".join(words + [f"w{i}"])))
    idx = str(tmp_path_factory.mktemp("pp") / "idx")
    IndexBuilder(spark, CFG).build(
        spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])), idx
    )
    return QueryEngine(spark, idx)


def test_phrase_prefix_matches_and_dis_max(spark, eng):
    out = eng.phrase_prefix_topk([(1, "alpha su")], k=30, n_ranges=2).toPandas()
    # every doc has "alpha suffixN"; all 30 match
    assert len(out) == 30
    # dis_max: docs with BOTH "alpha suffixN" and "alpha sun" score the
    # max of the two expansion phrases, not the sum
    full = {}
    for v in ("suffix0", "suffix1", "suffix2", "suffix3", "sun"):
        ph = eng.phrase_topk([(1, f"alpha {v}")], k=30).toPandas()
        for r in ph.itertuples():
            full[int(r.doc_id)] = max(full.get(int(r.doc_id), -1), r.score)
    got = {int(r.doc_id): r.score for r in out.itertuples()}
    assert got.keys() == full.keys()
    for d in got:
        assert got[d] == full[d]  # bit-equal to the best expansion phrase

    # order sensitivity: the base term must precede the expansion
    rev = eng.phrase_prefix_topk([(1, "su alpha")], k=30, n_ranges=2).toPandas()
    assert rev.empty

    # cap: max_expansions=1 keeps only the term-order-first expansion
    one = eng.phrase_prefix_topk(
        [(1, "alpha su")], k=30, max_expansions=1
    ).toPandas()
    want = eng.phrase_topk([(1, "alpha suffix0")], k=30).toPandas()
    assert list(one.doc_id) == list(want.doc_id)

    # empty expansion set matches nothing
    assert eng.phrase_prefix_topk([(1, "alpha zzzq")], k=5).count() == 0


def test_phrase_prefix_via_dsl(spark, eng):
    from xml_to_es_spark.operators.es_query import es_search

    a = es_search(
        eng, {"query": {"match_phrase_prefix": {"text": "alpha su"}}, "size": 5}
    ).toPandas()
    b = eng.phrase_prefix_topk([(0, "alpha su")], k=5).toPandas()
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.score) == list(b.score)
