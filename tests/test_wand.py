"""Block-max WAND kernel: rank-identical to exhaustive evaluation on
randomized corpora (property-style, no Spark needed)."""

import numpy as np
import pytest

from xml_to_es_spark.config import BM25Config
from xml_to_es_spark.operators.postings import encode_segment
from xml_to_es_spark.operators.wand import wand_topk
from xml_to_es_spark.pyref import idf as ref_idf


def _make_corpus(rng, n_docs=600, n_terms=12, block_size=32, salted=False):
    """Random postings; returns (term_entries, brute_scores dict)."""
    avgdl = 0.0
    dls = rng.randint(20, 400, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    cfg = BM25Config()
    entries, truth = [], {}
    for t in range(n_terms):
        df = rng.randint(2, n_docs)
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.randint(1, 20, size=df).astype(np.int64)
        term = f"t{t:03d}"
        w = ref_idf(n_docs, df)
        segs = []
        if salted and df > 50:
            bounds = [0, n_docs // 3, 2 * n_docs // 3, n_docs + 1]
            for s in range(3):
                m = (docs >= bounds[s]) & (docs < bounds[s + 1])
                if m.any():
                    seg = encode_segment(docs[m], tfs[m], dls[docs[m]], block_size)
                    seg["salt"] = s
                    segs.append(seg)
        else:
            seg = encode_segment(docs, tfs, dls[docs], block_size)
            seg["salt"] = 0
            segs.append(seg)
        entries.append({"term": term, "idf": w, "segments": segs})
    # brute force, term-major lexicographic order (terms already sorted)
    for e in entries:
        w = e["idf"]
        for seg in e["segments"]:
            from xml_to_es_spark.operators.postings import decode_segment

            d, tf, dl = decode_segment(seg)
            contrib = w * tf * (cfg.k1 + 1) / (
                tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
            )
            for doc, c in zip(d, contrib):
                truth[int(doc)] = truth.get(int(doc), 0.0) + float(c)
    return entries, truth, avgdl


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("salted", [False, True])
def test_wand_matches_bruteforce(seed, salted):
    rng = np.random.RandomState(seed)
    entries, truth, avgdl = _make_corpus(rng, salted=salted)
    cfg = BM25Config()
    for k in (1, 5, 10, 50):
        for q_size in (1, 2, 4):
            qterms = [entries[i] for i in rng.choice(len(entries), q_size, replace=False)]
            t2 = {}
            for e in sorted(qterms, key=lambda e: e["term"]):
                w = e["idf"]
                from xml_to_es_spark.operators.postings import decode_segment

                for seg in e["segments"]:
                    d, tf, dl = decode_segment(seg)
                    contrib = w * tf * (cfg.k1 + 1) / (
                        tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
                    )
                    for doc, c in zip(d, contrib):
                        t2[int(doc)] = t2.get(int(doc), 0.0) + float(c)
            expect = sorted(t2.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            got = wand_topk(qterms, k, cfg.k1, cfg.b, avgdl, block_size=32)
            assert [d for d, _ in got] == [d for d, _ in expect], (seed, k, q_size)
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in expect], atol=1e-9
            )


@pytest.mark.parametrize("seed", [0, 4])
def test_wand_range_partition_merges_to_global(seed):
    """The distributed contract: per-range local top-k lists over a
    doc_id partition merge into exactly the global top-k (ranges
    partition docs, so per-doc scores are complete per range)."""
    rng = np.random.RandomState(seed)
    entries, truth, avgdl = _make_corpus(rng, salted=True)
    cfg = BM25Config()
    k = 10
    q = [e for e in entries if e["term"] in ("t000", "t003", "t007")]
    t2 = {}
    from xml_to_es_spark.operators.postings import decode_segment

    for e in sorted(q, key=lambda e: e["term"]):
        for seg in e["segments"]:
            d, tf, dl = decode_segment(seg)
            contrib = e["idf"] * tf * (cfg.k1 + 1) / (
                tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
            )
            for doc, c in zip(d, contrib):
                t2[int(doc)] = t2.get(int(doc), 0.0) + float(c)
    expect = sorted(t2.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    # 4 half-open ranges over [0, 600)
    edges = [0, 150, 300, 450, 600]
    partials = []
    for lo, hi in zip(edges, edges[1:]):
        partials += wand_topk(
            q, k, cfg.k1, cfg.b, avgdl, block_size=32, doc_lo=lo, doc_hi=hi
        )
    merged = sorted(partials, key=lambda t: (-t[1], t[0]))[:k]
    assert [d for d, _ in merged] == [d for d, _ in expect]
    # scores are bit-equal: same per-doc summation, just located in one range
    assert [s for _, s in merged] == [s for _, s in expect]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    k=st.integers(min_value=1, max_value=20),
    n_dead=st.integers(min_value=0, max_value=40),
    n_ranges=st.integers(min_value=1, max_value=5),
)
def test_wand_property_ranges_and_tombstones(seed, k, n_dead, n_ranges):
    """Property: for any corpus, k, tombstone set, and doc-range
    split, the merged per-range WAND top-k with dead filtering equals
    brute force over the live docs (rank and score)."""
    rng = np.random.RandomState(seed)
    entries, _, avgdl = _make_corpus(rng, n_docs=200, n_terms=6, salted=seed % 2 == 0)
    cfg = BM25Config()
    q = [entries[i] for i in rng.choice(len(entries), 3, replace=False)]
    dead = np.unique(rng.choice(200, size=n_dead)).astype(np.int64) if n_dead else None
    from xml_to_es_spark.operators.postings import decode_segment

    truth = {}
    for e in sorted(q, key=lambda e: e["term"]):
        for seg in e["segments"]:
            d, tf, dl = decode_segment(seg)
            contrib = e["idf"] * tf * (cfg.k1 + 1) / (
                tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
            )
            for doc, c in zip(d, contrib):
                if dead is None or doc not in set(dead.tolist()):
                    truth[int(doc)] = truth.get(int(doc), 0.0) + float(c)
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    edges = [round(200 * r / n_ranges) for r in range(n_ranges)] + [201]
    partials = []
    for lo, hi in zip(edges, edges[1:]):
        partials += wand_topk(
            q, k, cfg.k1, cfg.b, avgdl, block_size=32,
            doc_lo=lo, doc_hi=hi, dead=dead,
        )
    merged = sorted(partials, key=lambda t: (-t[1], t[0]))[:k]
    assert [d for d, _ in merged] == [d for d, _ in expect]
    assert [s for _, s in merged] == [s for _, s in expect]


def test_wand_empty_and_single():
    assert wand_topk([], 10, 1.2, 0.75, 100.0) == []
    seg = encode_segment(
        np.array([5], dtype=np.int64),
        np.array([3], dtype=np.int64),
        np.array([50], dtype=np.int64),
        16,
    )
    seg["salt"] = 0
    got = wand_topk(
        [{"term": "x", "idf": 1.5, "segments": [seg]}], 10, 1.2, 0.75, 100.0, 16
    )
    assert len(got) == 1 and got[0][0] == 5
