"""pyref — the pure-Python single-node oracle.

A tiny reference implementation of the whole engine (extract →
tokenize → index → BM25 top-k) used as the golden oracle in tests
(SURVEY.md §5.2). It shares the extraction kernel and the tokenizer
pin verbatim with the Spark engine, so "byte-identical extracted text
per url" and "rank-identical top-k" are checked against *this*.

Summation order is pinned: score(q, d) = sum over query terms in
term-lexicographic order of idf(t) * saturation(tf, dl) — float64
throughout (FIXTURES.md §4/§5).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from xml_to_es_spark.config import TOKEN_PATTERN, BM25Config
from xml_to_es_spark.functions.extract_core import extract_text  # noqa: F401  (oracle surface)

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Pinned analysis chain: lowercase → all matches of [a-z0-9]+
    (FIXTURES.md §5). No stemming, no stopwords."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def stem_minimal_english(w: str) -> str:
    """The Lucene EnglishMinimalStemmer (ES ``minimal_english`` token
    filter) — plural stripping only, pinned so the Spark column
    expression, this oracle and the DuckDB twins agree bit-for-bit:
    words < 3 chars or not ending in 's' pass through; ``-us``/``-ss``
    pass through; ``-ies`` (len ≥ 4, char before the 'i' not a/e) →
    ``-y``; ``-[iaoe]es`` pass through; otherwise drop the final
    's'. (The exact Lucene branch order, including the len-4 guard.)"""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c = w[-2]
    if c in ("u", "s"):
        return w
    if c == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
    return w[:-1]


def analyze(
    text: str,
    stopwords: tuple[str, ...] = (),
    stemmer: str | None = None,
) -> list[str]:
    """The CONFIGURABLE analysis chain (IndexConfig stopwords/stemmer):
    pinned tokenize → stopword removal → minimal_english stemming.
    With the default empty config this IS :func:`tokenize`."""
    toks = tokenize(text)
    if stopwords:
        stops = set(stopwords)
        toks = [t for t in toks if t not in stops]
    if stemmer == "minimal_english":
        toks = [stem_minimal_english(t) for t in toks]
    elif stemmer is not None:
        raise ValueError(
            f"unsupported stemmer {stemmer!r} (minimal_english is the "
            "pinned chain)"
        )
    return toks


def idf(n_docs: int, df: int) -> float:
    """BM25 idf = ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def saturation(tf: float, dl: float, avgdl: float, cfg: BM25Config) -> float:
    return tf * (cfg.k1 + 1.0) / (tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / avgdl))


class PyRefIndex:
    """In-memory inverted index over (doc_id → text)."""

    def __init__(self, docs: dict[int, str], cfg: BM25Config | None = None):
        self.cfg = cfg or BM25Config()
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(docs)
        total = sum(self.doc_len.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def score(self, query: str) -> dict[int, float]:
        """BM25 scores for all docs matching ≥1 query term. Duplicate
        query terms count once (ES `match` semantics are per unique
        term with query tf ignored for short queries; we pin unique)."""
        terms = sorted(set(tokenize(query)))
        scores: dict[int, float] = {}
        for t in terms:  # term-major, lexicographic — pinned order
            plist = self.postings.get(t)
            if not plist:
                continue
            w = idf(self.n_docs, len(plist))
            for doc_id in sorted(plist):  # doc-major within term
                contrib = w * saturation(
                    plist[doc_id], self.doc_len[doc_id], self.avgdl, self.cfg
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        return scores

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), score desc, doc_id asc tie-break."""
        scores = self.score(query)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
