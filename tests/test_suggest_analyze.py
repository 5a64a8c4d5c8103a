"""ES term suggester (did-you-mean over the terms dictionary, capped
in-plan) and the _analyze token-stream API. Suggester twin:
brute-force python levenshtein over the corpus vocabulary with the ES
ranking (distance asc, df desc, term asc)."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import es_analyze, es_suggest
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(n_groups=2, salt_threshold=40, n_salts=3, block_size=32)

WORDS = ["spark", "sparse", "shark", "stark", "spam", "merge", "marge",
         "sort", "fort", "fast"]


def _corpus(n=40):
    rows = []
    for i in range(n):
        toks = [WORDS[j] for j in range(len(WORDS)) if i % (j + 2) == 0]
        toks += [f"w{i}"]
        rows.append((i, " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _vocab_df(pdf):
    from collections import Counter

    c = Counter()
    for t in pdf.text:
        c.update(set(t.split()))
    return dict(c)


def _twin(pdf, token, max_edits=2, size=5, mode="missing"):
    vocab = _vocab_df(pdf)
    if mode == "missing" and vocab.get(token, 0) > 0:
        return []
    cands = [
        (term, _lev(term, token), df)
        for term, df in vocab.items()
        if term != token and _lev(term, token) <= max_edits
    ]
    if mode == "popular":
        own = vocab.get(token, 0)
        cands = [c for c in cands if c[2] > own]
    cands.sort(key=lambda c: (c[1], -c[2], c[0]))
    return [(term, d, df) for term, d, df in cands[:size]]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("suggest")
    pdf = _corpus()
    path = str(root / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def test_suggest_missing_token_ranked_like_es(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    got = eng.suggest_terms(["sparc"], max_edits=2, size=5).toPandas()
    want = _twin(pdf, "sparc")
    assert list(zip(got.suggestion, got.distance, got.df)) == want
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_suggest_missing_mode_skips_present_tokens(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    got = eng.suggest_terms(
        ["spark", "sparc"], max_edits=1, size=3
    ).toPandas()
    # "spark" is in the index -> no suggestions for it
    assert set(got.token) == {"sparc"}
    assert list(zip(got.suggestion, got.distance, got.df)) == _twin(
        pdf, "sparc", max_edits=1, size=3
    )


def test_suggest_always_and_popular_modes(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    alw = eng.suggest_terms(
        ["fort"], max_edits=1, size=5, suggest_mode="always"
    ).toPandas()
    assert list(zip(alw.suggestion, alw.distance, alw.df)) == _twin(
        pdf, "fort", max_edits=1, size=5, mode="always"
    )
    pop = eng.suggest_terms(
        ["fort"], max_edits=1, size=5, suggest_mode="popular"
    ).toPandas()
    assert list(zip(pop.suggestion, pop.distance, pop.df)) == _twin(
        pdf, "fort", max_edits=1, size=5, mode="popular"
    )
    vocab = _vocab_df(pdf)
    for df in pop.df:
        assert df > vocab["fort"]


def test_suggest_dsl_body(spark, idx):
    pdf, path = idx
    eng = QueryEngine(spark, path)
    got = es_suggest(eng, {"suggest": {"dym": {
        "text": "sparc merje",
        "term": {"field": "text", "max_edits": 2, "size": 3},
    }}}).toPandas()
    assert set(got.token) == {"sparc", "merje"}
    sparc = got[got.token == "sparc"]
    assert list(zip(sparc.suggestion, sparc.distance, sparc.df)) == _twin(
        pdf, "sparc", size=3
    )
    with pytest.raises(ValueError, match="suggest only"):
        es_suggest(eng, {"suggest": {"d": {"text": "x", "term": {}}},
                         "query": {"match": {"text": "x"}}})
    with pytest.raises(ValueError, match="max_edits"):
        eng.suggest_terms(["x"], max_edits=3)


def test_suggest_in_plan_cap(spark, idx):
    """The candidate window is capped BEFORE any collect: the plan's
    row count is bounded at tokens x size."""
    pdf, path = idx
    eng = QueryEngine(spark, path)
    out = eng.suggest_terms(["sparc"], max_edits=2, size=2)
    assert out.count() <= 2


def test_analyze_token_stream():
    got = es_analyze({"text": "Hello, World! x2"})
    assert [t["token"] for t in got] == ["hello", "world", "x2"]
    assert got[0] == {"token": "hello", "start_offset": 0,
                      "end_offset": 5, "position": 0}
    assert got[1]["start_offset"] == 7 and got[1]["end_offset"] == 12
    assert got[2]["position"] == 2
    with pytest.raises(ValueError, match="text"):
        es_analyze({"analyzer": "standard"})
    with pytest.raises(ValueError, match="one string"):
        es_analyze({"text": ["a", "b"]})


def test_analyze_matches_engine_tokenizer():
    from xml_to_es_spark.pyref import tokenize

    for s in ["Mixed CASE 123 foo-bar", "", "  ", "a1b2"]:
        assert [t["token"] for t in es_analyze({"text": s})] == tokenize(s)


# -- phrase suggester ---------------------------------------------------------

PCFG = IndexConfig(n_groups=2, block_size=32, store_positions=True)


def _pcorpus(n=60):
    rows = []
    for i in range(n):
        parts = []
        if i % 2 == 0:
            parts.append("hash join fast")
        if i % 3 == 0:
            parts.append("sort merge slow")
        if i % 5 == 0:
            parts.append("hash sort")
        parts.append(f"w{i}")
        rows.append((i, " ".join(parts)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("psuggest")
    pdf = _pcorpus()
    path = str(root / "idx")
    IndexBuilder(spark, PCFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def _phrase_twin(pdf, text, size=5, max_edits=1, candidate_size=5,
                 max_errors=1.0, confidence=1.0, discount=0.4):
    """Independent python twin of the bigram StupidBackoff phrase
    suggester: same candidate generator (closest-first cap, token
    itself included), same doc-frequency statistics, full enumeration
    instead of Viterbi."""
    import itertools
    import math

    toks = text.split()
    uni = _vocab_df(pdf)
    from collections import Counter

    bi = Counter()
    for t in pdf.text:
        ws = t.split()
        bi.update({(a, b) for a, b in zip(ws, ws[1:])})
    n = float(len(pdf))

    def uni_p(w):
        d = uni.get(w, 0)
        return d / n if d > 0 else 1.0 / (2.0 * n)

    def cond_p(a, b):
        bc, da = bi.get((a, b), 0), uni.get(a, 0)
        return bc / da if bc > 0 and da > 0 else discount * uni_p(b)

    def score(ws):
        s = math.log(uni_p(ws[0]))
        for a, b in zip(ws, ws[1:]):
            s += math.log(cond_p(a, b))
        return s

    # ES/Lucene rule: fraction only on [0..1); >= 1 is absolute
    n_err = (int(max_errors) if max_errors >= 1
             else max(1, int(math.floor(max_errors * len(toks)))))
    cands = {}
    for t in toks:
        cs = sorted(
            ((_lev(v, t), v) for v in uni if _lev(v, t) <= max_edits)
        )[:candidate_size]
        cands[t] = sorted({v for _d, v in cs} | {t})
    gate = (score(toks) + math.log(confidence) if confidence > 0
            else -math.inf)
    outs = []
    for combo in itertools.product(*[cands[t] for t in toks]):
        errs = sum(1 for c, t in zip(combo, toks) if c != t)
        if errs > n_err:
            continue
        sug = " ".join(combo)
        if sug == " ".join(toks):
            continue
        sc = score(list(combo))
        if sc <= gate:
            continue
        outs.append((sug, sc))
    outs.sort(key=lambda x: (-x[1], x[0]))
    return outs[:size]


def test_phrase_suggester_matches_twin(spark, pidx):
    import numpy as np

    pdf, path = pidx
    e = QueryEngine(spark, path)
    for text, kw in [
        ("hash joln", {}),                       # 1-edit bigram fix
        ("hsh join", {}),                        # fix the first token
        ("sort merge slow", {"max_errors": 2.0}),
        ("hash sort", {"confidence": 0.0, "max_errors": 2.0}),
    ]:
        got = e.suggest_phrases(text, **kw).toPandas()
        want = _phrase_twin(pdf, text, **kw)
        assert list(got["suggestion"]) == [s for s, _ in want], (text, got)
        np.testing.assert_allclose(
            got["score"], [s for _, s in want], rtol=1e-9
        )
    # the obvious correction ranks first
    top = e.suggest_phrases("hash joln").toPandas()
    assert top["suggestion"].iloc[0] == "hash join"


def test_phrase_suggester_gates_and_validation(spark, pidx):
    _pdf, path = pidx
    e = QueryEngine(spark, path)
    # max_errors=0.5 (fraction): one of two tokens may change, so the
    # two-token fix is out of reach
    got = e.suggest_phrases("hsh joln", max_errors=0.5).toPandas()
    assert "hash join" not in list(got["suggestion"])
    got2 = e.suggest_phrases("hsh joln", max_errors=2.0).toPandas()
    assert got2["suggestion"].iloc[0] == "hash join"
    # confidence=1: suggestions must beat the input's own LM score
    ok = e.suggest_phrases("hash join", confidence=1.0).toPandas()
    assert "hash join" not in list(ok["suggestion"])
    with pytest.raises(ValueError, match="max_edits"):
        e.suggest_phrases("a b", max_edits=3)
    with pytest.raises(ValueError, match="10 tokens"):
        e.suggest_phrases("a " * 11)


def test_phrase_suggester_dsl(spark, pidx):
    _pdf, path = pidx
    e = QueryEngine(spark, path)
    got = es_suggest(e, {"suggest": {"dym": {
        "text": "hash joln",
        "phrase": {"field": "text", "size": 3, "max_errors": 2.0},
    }}}).toPandas()
    assert got["suggestion"].iloc[0] == "hash join"
    with pytest.raises(ValueError, match="ONE of term / phrase"):
        es_suggest(e, {"suggest": {"d": {
            "text": "x", "term": {}, "phrase": {}}}})
    with pytest.raises(ValueError, match="unsupported phrase"):
        es_suggest(e, {"suggest": {"d": {
            "text": "x", "phrase": {"gram_size": 3}}}})


def test_completion_suggester(spark, idx):
    """ES completion suggester: df-ranked prefix completion over the
    dictionary, capped per prefix, twin = brute-force vocab ranking."""
    from xml_to_es_spark.operators.query_engine import QueryEngine as QE

    pdf, path = idx
    eng = QE(spark, path)
    vocab = _vocab_df(pdf)

    def twin(prefix, size=5):
        cands = [(t, df) for t, df in vocab.items() if t.startswith(prefix)]
        cands.sort(key=lambda c: (-c[1], c[0]))
        return cands[:size]

    got = eng.suggest_completions(["s", "sp", "zz"], size=4).toPandas()
    for p in ("s", "sp"):
        g = got[got.prefix == p].sort_values("rank")
        assert list(zip(g.option, g.score.astype(int))) == twin(p, 4)
    assert (got.prefix == "zz").sum() == 0
    # DSL route
    body = {"suggest": {"ac": {"prefix": "sp",
                               "completion": {"field": "text", "size": 3}}}}
    g = es_suggest(eng, body).toPandas().sort_values("rank")
    assert list(zip(g.option, g.score.astype(int))) == twin("sp", 3)
    with pytest.raises(ValueError, match="completion"):
        es_suggest(eng, {"suggest": {"ac": {
            "completion": {"field": "text"}}}})
    with pytest.raises(ValueError, match="single non-empty"):
        eng.suggest_completions(["two words"])


def test_termvectors(spark, idx):
    """ES _termvectors: tf + positions recomputed from the stored
    _source; df from the dictionary when term_statistics is on."""
    from xml_to_es_spark.operators.es_query import es_termvectors
    from xml_to_es_spark.operators.index_build import IndexBuilder as IB
    from xml_to_es_spark.operators.query_engine import QueryEngine as QE

    pdf, _path = idx
    root = str(_path) + "_tvsrc"
    IB(spark, IndexConfig(n_groups=2, store_source=True)).build(
        spark.createDataFrame(pdf), root
    )
    eng = QE(spark, root)
    doc = pdf[pdf.doc_id == 0].text.iloc[0]
    toks = doc.split()
    out = es_termvectors(eng, 0, {"term_statistics": True}).toPandas()
    vocab = _vocab_df(pdf)
    assert sorted(out.term) == sorted(set(toks))
    for _, r in out.iterrows():
        assert r["term_freq"] == toks.count(r["term"])
        assert list(r["positions"]) == [
            i for i, t in enumerate(toks) if t == r["term"]
        ]
        assert r["doc_freq"] == vocab[r["term"]]
        assert r["field"] == "text"
    # without stats: no doc_freq column
    lean = es_termvectors(eng, 0)
    assert "doc_freq" not in lean.columns
    with pytest.raises(ValueError, match="not found"):
        es_termvectors(eng, 10_000)
    with pytest.raises(ValueError, match="unsupported"):
        es_termvectors(eng, 0, {"offsets": True})


def test_phrase_suggester_max_errors_boundary(spark, pidx):
    """Round-6 ADVICE fix: max_errors=1.0 (the ES default) is an
    ABSOLUTE one-error budget (Lucene treats fraction only on
    [0..1)), so the default cannot fix two tokens at once."""
    _pdf, path = pidx
    e = QueryEngine(spark, path)
    got = e.suggest_phrases("hsh joln").toPandas()  # default 1.0
    assert "hash join" not in list(got["suggestion"])
    # a true fraction still scales with length: 0.99 on two tokens → 1
    frac = e.suggest_phrases("hsh joln", max_errors=0.99).toPandas()
    assert "hash join" not in list(frac["suggestion"])


def test_mark_terms_literal_tags(spark):
    """Round-6 ADVICE fix: pre/post tags containing Java-regex
    replacement metacharacters ($, \\) pass through literally."""
    from pyspark.sql import functions as F

    from xml_to_es_spark.functions.analysis import mark_terms_col

    df = spark.createDataFrame([("pay cash now",)], "text string")
    out = df.select(
        mark_terms_col(F.col("text"), ["cash"], "$1$", "\\$").alias("s")
    ).collect()[0]["s"]
    assert out == "pay $1$cash\\$ now"
