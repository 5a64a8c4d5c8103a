"""Dictionary-expansion caps must be applied IN-PLAN: the driver-side
collect is bounded by probes×max_expansions even when a short prefix
matches a large slice of the vocabulary (the round-3 VERDICT scale
defect — an uncapped collect is bounded by vocabulary size)."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(n_groups=1, salt_threshold=1000, n_salts=2)


@pytest.fixture(scope="module")
def wide_vocab_idx(spark, tmp_path_factory):
    # 80 distinct terms sharing prefix "t": t000..t079, plus fillers
    rows = [(i, f"t{i:03d} filler alpha") for i in range(80)]
    idx = str(tmp_path_factory.mktemp("cap") / "idx")
    IndexBuilder(spark, CFG).build(
        spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])), idx
    )
    return idx


def test_prefix_cap_is_in_plan(spark, wide_vocab_idx):
    eng = QueryEngine(spark, wide_vocab_idx)
    # the pre-collect DataFrame itself is capped: 80 vocabulary
    # matches for "t", but ≤ 2 probes × 5 cap rows ever materialize
    df = eng._capped_expansion(
        ["t", "fil"], lambda bare, p: bare.startswith(p), None, 5
    )
    assert df.count() == 5 + 1  # "t"→5 (capped from 80), "fil"→1
    got = eng.prefix_variants(["t"], max_expansions=5)
    assert got["t"] == [f"t{i:03d}" for i in range(5)]  # first-N in term order
    full = eng.prefix_variants(["t"], max_expansions=200)
    assert len(full["t"]) == 80


def test_fuzzy_cap_is_in_plan(spark, wide_vocab_idx):
    eng = QueryEngine(spark, wide_vocab_idx)
    # every t0xx is within distance 2 of "t000" (two digit edits);
    # cap must hold the expansion to first-N in term order
    got = eng.fuzzy_variants(["t000"], fuzziness=2, max_expansions=7)
    assert len(got["t000"]) == 7
    assert got["t000"][0] == "t000"
    uncapped = eng.fuzzy_variants(["t000"], fuzziness=2, max_expansions=500)
    assert len(uncapped["t000"]) > 7


def test_prefix_topk_still_ranks_with_cap(spark, wide_vocab_idx):
    eng = QueryEngine(spark, wide_vocab_idx)
    out = eng.prefix_topk([(1, "alpha t00")], k=5, max_expansions=3).toPandas()
    assert len(out) == 5
