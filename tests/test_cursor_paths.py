"""ES search_after on every remaining ranked path — phrase (exact and
slop), match_phrase_prefix, match_bool_prefix, and multi_match
(best_fields, with and without tie_breaker): cursor page 2 must equal
rows k+1..2k of the full ranking (the test_cursor_wand pattern).

Pinned-sum paths (phrase, prefix/WAND) exclude served docs INSIDE the
kernels by exact sort-key comparison; engine-ordered paths
(multi_match best_fields) rank-anchor the cursor doc like
topk_distributed."""

import numpy as np
import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

K = 7


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    rows = []
    for i in range(80):
        body = f"alpha beta w{i} " + ("gamma delta " * (1 + i % 4))
        if i % 3 == 0:
            body += "beta gamma "  # phrase "beta gamma" hits
        title = f"t{i % 9} gamma"
        rows.append((i, body, title))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "title"])
    idx = str(tmp_path_factory.mktemp("cursor") / "idx")
    IndexBuilder(
        spark,
        IndexConfig(
            n_groups=2, store_positions=True,
            indexed_fields=("text", "title"),
        ),
    ).build(spark.createDataFrame(pdf), idx)
    return QueryEngine(spark, idx)


def _pages_equal_full(full_df, page2_df, exact=True):
    full = full_df.toPandas().sort_values("rank").reset_index(drop=True)
    p2 = page2_df.toPandas().sort_values("rank").reset_index(drop=True)
    tail = full.iloc[K:2 * K].reset_index(drop=True)
    assert list(p2.doc_id) == list(tail.doc_id)
    if exact:
        np.testing.assert_array_equal(p2.score.values, tail.score.values)
    else:
        np.testing.assert_allclose(p2.score, tail.score, rtol=1e-12)


def _cursor_of(df):
    p1 = df.toPandas().sort_values("rank")
    return {1: (float(p1.score.iat[K - 1]), int(p1.doc_id.iat[K - 1]))}


def test_phrase_cursor(eng):
    q = [(1, "beta gamma")]
    full = eng.phrase_topk(q, k=2 * K, n_ranges=3)
    cur = _cursor_of(full)
    _pages_equal_full(full, eng.phrase_topk(q, k=K, n_ranges=3,
                                            search_after=cur))


def test_phrase_slop_cursor(eng):
    q = [(1, "gamma beta")]  # transposition: matches at slop=2
    full = eng.phrase_topk(q, k=2 * K, n_ranges=3, slop=2)
    cur = _cursor_of(full)
    _pages_equal_full(full, eng.phrase_topk(q, k=K, n_ranges=3, slop=2,
                                            search_after=cur))


def test_phrase_prefix_cursor(eng):
    q = [(1, "beta gam")]
    full = eng.phrase_prefix_topk(q, k=2 * K, n_ranges=3)
    cur = _cursor_of(full)
    _pages_equal_full(full, eng.phrase_prefix_topk(q, k=K, n_ranges=3,
                                                   search_after=cur))


def test_bool_prefix_cursor(eng):
    q = [(1, "alpha gam")]
    full = eng.prefix_topk(q, k=2 * K, n_ranges=3)
    cur = _cursor_of(full)
    _pages_equal_full(full, eng.prefix_topk(q, k=K, n_ranges=3,
                                            search_after=cur))


def test_multi_match_cursor(eng):
    q = [(1, "gamma")]
    full = eng.multi_match(q, k=2 * K, fields=["text", "title"])
    cur = _cursor_of(full)
    # best_fields cursor routes through the full aggregation; scores
    # are engine-ordered float sums → allclose, ranks exact
    _pages_equal_full(
        full,
        eng.multi_match(q, k=K, fields=["text", "title"], search_after=cur),
        exact=False,
    )


def test_multi_match_tie_breaker_cursor(eng):
    q = [(1, "gamma")]
    full = eng.multi_match(q, k=2 * K, fields=["text", "title"],
                           tie_breaker=0.3)
    cur = _cursor_of(full)
    _pages_equal_full(
        full,
        eng.multi_match(q, k=K, fields=["text", "title"], tie_breaker=0.3,
                        search_after=cur),
        exact=True,  # same job shape both times: identical sums
    )
