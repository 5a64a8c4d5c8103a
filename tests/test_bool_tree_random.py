"""Randomized nested-bool-tree cross-check: 30 seeded random trees
(nested sub-bools, or/and match leaves, match_phrase leaves,
structured term/range clauses, minimum_should_match) run as ONE
batched bool_topk call, and each query's MATCH SET must equal a
brute-force per-doc Python evaluation of the documented ES
semantics. Catches role/msm/nesting/phrase compilation drift that
hand-picked specs miss."""

import random

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

VOCAB = ["alpha", "beta", "gamma", "delta", "sort", "merge", "key", "fast"]
LANGS = ["en", "de", "fr"]
N_DOCS = 36


def _corpus():
    rng = random.Random(7)
    rows = []
    for i in range(N_DOCS):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(3, 9))]
        rows.append({
            "doc_id": i,
            "text": " ".join(words),
            "lang": LANGS[i % 3],
            "n_chars": 100 + 5 * (i % 8),
        })
    return rows


def _gen_leaf(rng, depth):
    kind = rng.choice(
        ["match", "match", "match_and", "phrase", "term", "range"]
        + (["bool"] if depth < 2 else [])
    )
    if kind == "match":
        toks = rng.sample(VOCAB, rng.randint(1, 2))
        return {"match": {"query": " ".join(toks)}}
    if kind == "match_and":
        toks = rng.sample(VOCAB, 2)
        return {"match": {"query": " ".join(toks), "operator": "and"}}
    if kind == "phrase":
        return {"match_phrase": {"query": " ".join(rng.sample(VOCAB, 2))}}
    if kind == "term":
        return {"term": {"lang": rng.choice(LANGS)}}
    if kind == "range":
        return {"range": {"n_chars": {"gte": rng.choice([105, 115, 125])}}}
    return {"bool": _gen_tree(rng, depth + 1)}


def _gen_tree(rng, depth=0):
    tree = {"must": [{"match": {"query": rng.choice(VOCAB)}}]}
    if rng.random() < 0.7:
        tree["must"].append(_gen_leaf(rng, depth))
    if rng.random() < 0.8:
        tree["should"] = [_gen_leaf(rng, depth)
                          for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.4:
            tree["minimum_should_match"] = rng.choice(
                [1, 2, "50%", "75%"])
    if rng.random() < 0.5:
        tree["must_not"] = [_gen_leaf(rng, depth)]
    if rng.random() < 0.4:
        tree["filter"] = [rng.choice(
            [{"term": {"lang": rng.choice(LANGS)}},
             {"range": {"n_chars": {"gte": 110}}}])]
    return tree


def _tokens(text):
    import re

    return re.findall("[a-z0-9]+", text.lower())


def _eval_clause(cl, doc):
    (kind, spec), = cl.items()
    toks = _tokens(doc["text"])
    if kind == "match":
        opts = dict(spec) if isinstance(spec, dict) else {"query": spec}
        q = set(_tokens(opts["query"]))
        if str(opts.get("operator", "or")).lower() == "and":
            return q <= set(toks)
        return bool(q & set(toks))
    if kind == "match_phrase":
        opts = dict(spec) if isinstance(spec, dict) else {"query": spec}
        q = _tokens(opts["query"])
        return any(
            toks[i:i + len(q)] == q for i in range(len(toks) - len(q) + 1)
        )
    if kind == "term":
        (f, v), = spec.items()
        return doc[f] == v
    if kind == "range":
        (f, bounds), = spec.items()
        ok = True
        if "gte" in bounds:
            ok = ok and doc[f] >= bounds["gte"]
        if "lt" in bounds:
            ok = ok and doc[f] < bounds["lt"]
        return ok
    if kind == "bool":
        return _eval_tree(spec, doc)
    raise AssertionError(kind)


def _need(tree, n_should):
    msm = tree.get("minimum_should_match")
    if msm is None:
        return 0 if (tree.get("must") or tree.get("filter")) else 1
    if isinstance(msm, str) and msm.endswith("%"):
        return (int(msm[:-1]) * n_should) // 100
    return int(msm)


def _eval_tree(tree, doc):
    for cl in tree.get("must", []) + tree.get("filter", []):
        if not _eval_clause(cl, doc):
            return False
    for cl in tree.get("must_not", []):
        if _eval_clause(cl, doc):
            return False
    should = tree.get("should", [])
    got = sum(1 for cl in should if _eval_clause(cl, doc))
    return got >= _need(tree, len(should))


def test_random_trees_match_brute_force(spark, tmp_path):
    rows = _corpus()
    idx = str(tmp_path / "rt_idx")
    IndexBuilder(
        spark,
        IndexConfig(n_groups=2, store_positions=True,
                    stored_fields=("lang", "n_chars")),
    ).build(spark.createDataFrame(pd.DataFrame(rows)), idx)
    eng = QueryEngine(spark, idx)

    rng = random.Random(42)
    trees = [(qid, _gen_tree(rng)) for qid in range(30)]
    got = (
        eng.bool_topk(trees, k=N_DOCS)
        .toPandas()
        .groupby("query_id")["doc_id"]
        .apply(set)
        .to_dict()
    )
    for qid, tree in trees:
        expect = {r["doc_id"] for r in rows if _eval_tree(tree, r)}
        assert got.get(qid, set()) == expect, (qid, tree)
