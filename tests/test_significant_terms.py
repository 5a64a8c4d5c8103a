"""ES significant_terms: foreground-vs-background term significance
(JLH) over the full match set. Twin: brute-force python recount over
the corpus."""

from collections import Counter

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine
from xml_to_es_spark.pyref import tokenize

CFG = IndexConfig(n_groups=2, salt_threshold=40, block_size=32)


def _corpus(n=60):
    """Docs about 'fish' disproportionately contain reef/coral/net;
    the rest talk about trains. A couple of shared fillers."""
    rows = []
    for i in range(n):
        if i % 3 == 0:
            toks = ["fish", "reef", "coral"]
            if i % 6 == 0:
                toks.append("net")
        else:
            toks = ["train", "rail", "track"]
            if i % 5 == 0:
                toks.append("net")  # net appears in both worlds
        toks += ["common", f"w{i}"]
        rows.append((i, " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sig")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def _twin(pdf, match_ids, size, min_dc):
    fg: Counter = Counter()
    bg: Counter = Counter()
    for r in pdf.itertuples():
        toks = set(tokenize(r.text))
        bg.update(toks)
        if int(r.doc_id) in match_ids:
            fg.update(toks)
    n, ft = len(pdf), len(match_ids)
    rows = []
    for t, c in fg.items():
        if c < min_dc:
            continue
        fp, bp = c / ft, bg[t] / n
        rows.append(((fp - bp) * (fp / bp), t, c, bg[t]))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(t, c, b, s) for s, t, c, b in rows[:size]]


def test_significant_terms_matches_twin(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    spec = {"must": "fish"}
    got = eng.significant_terms([(0, spec)], size=6,
                                min_doc_count=2).toPandas()
    match = {int(r.doc_id)
             for r in eng.bool_match_ids([(0, spec)]).collect()}
    want = _twin(pdf, match, 6, 2)
    assert list(zip(got.term, got.fg, got.bg)) == [
        (t, c, b) for t, c, b, _ in want
    ]
    for (_, _, _, s), gs in zip(want, got.score):
        assert gs == pytest.approx(s, rel=1e-12)
    # the fish-world terms dominate; 'common' (uniform background)
    # does not outrank them
    assert set(got.term.iloc[:3]) <= {"fish", "reef", "coral", "net"}


def test_significant_terms_batch_and_min_doc_count(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    qs = [(1, {"must": "fish"}), (2, {"must": "train"}),
          (3, {"must": "zzz_absent"})]
    got = eng.significant_terms(qs, size=4, min_doc_count=5).toPandas()
    assert set(got.query_id) <= {1, 2}  # absent query → no rows
    for qid, spec in qs[:2]:
        match = {int(r.doc_id)
                 for r in eng.bool_match_ids([(qid, spec)]).collect()}
        want = _twin(pdf, match, 4, 5)
        sub = got[got.query_id == qid]
        assert list(zip(sub.term, sub.fg, sub.bg)) == [
            (t, c, b) for t, c, b, _ in want
        ]


def test_significant_terms_respects_deletes_in_foreground(spark, idx,
                                                          tmp_path):
    """Deleted docs leave the match set (dead-masked foreground) while
    the background dictionary df stays raw — the ES unmerged-delete
    semantics, both directions asserted."""
    import shutil

    pdf, path = idx
    live = str(tmp_path / "idx_live")
    shutil.copytree(path, live)
    fish_ids = [i for i in range(12) if i % 3 == 0]
    IndexBuilder(spark, CFG).delete_docs(fish_ids[:2], live)
    eng = QueryEngine(spark, live)
    got = eng.significant_terms([(0, {"must": "fish"})], size=6,
                                min_doc_count=1).toPandas()
    match = {int(r.doc_id)
             for r in eng.bool_match_ids([(0, {"must": "fish"})]).collect()}
    assert not (set(fish_ids[:2]) & match)
    fishy = got[got.term == "fish"]
    assert int(fishy.fg.iloc[0]) == len(match)
    # background keeps the raw df (deletes unmerged) — ES parity
    raw_df = sum(1 for r in pdf.itertuples() if "fish" in tokenize(r.text))
    assert int(fishy.bg.iloc[0]) == raw_df


def test_dsl_significant_terms(spark, idx):
    from xml_to_es_spark.operators.es_query import es_search

    _, path = idx
    eng = QueryEngine(spark, path)
    got = es_search(eng, {
        "query": {"match": {"text": "fish"}},
        "aggs": {"sig": {"significant_terms": {
            "size": 4, "min_doc_count": 2}}},
    }).toPandas()
    want = eng.significant_terms(
        [(0, {"must": [{"match": {"query": "fish",
                                  "operator": "or"}}]})],
        size=4, min_doc_count=2,
    ).toPandas()
    assert list(got.term) == list(want.term)
    assert list(got.score) == list(want.score)
    with pytest.raises(ValueError, match="significant_terms"):
        es_search(eng, {"query": {"match": {"text": "fish"}},
                        "aggs": {"sig": {"significant_terms": {
                            "shard_size": 9}}}})


def test_significant_terms_plan_is_kernel_only(spark, idx):
    from xml_to_es_spark.plans import explain_str

    _, path = idx
    eng = QueryEngine(spark, path)
    out = eng.significant_terms([(0, {"must": "fish"})], size=5)
    plan = explain_str(out, "simple")
    assert "BatchEvalPython" not in plan
    # two Arrow kernels total: the match-set decode and the
    # membership decode — the aggregation itself is JVM
    assert plan.count("MapInPandas") == 2
    assert "WindowGroupLimit" in plan or "Window" in plan
