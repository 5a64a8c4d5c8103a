"""Engine configuration.

The reference carries all run state in a mutable ``config`` object
(xml-to-es.js:701-748 resolveClOptions, deepExtend merge at 643-651).
We use frozen dataclasses: input rules, analysis pins, build knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Pinned analysis chain (FIXTURES.md §5). BM25 rank-identity depends on
# this exact tokenizer; the same regex is used by the Spark engine
# (JVM regexp_extract_all), the pure-Python oracle (re.findall) and the
# DuckDB oracle SQL (regexp_extract_all).
TOKEN_PATTERN = "[a-z0-9]+"


@dataclass(frozen=True)
class BM25Config:
    """BM25 scoring parameters — pinned by BASELINE.json north_star."""

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Inverted-index build knobs.

    ``n_groups``: number of checkpoint units (term-hash groups). Each
    group is one independently-committable Spark job over the
    tokenized intermediate — the resume granularity (north_rule:
    "resumable from checkpoint with per-partition lineage").

    ``salt_threshold``: a term whose document frequency exceeds this is
    "hot" (Zipf head / stopword at Common-Crawl scale) and its posting
    list is built as multiple doc_id-range "salt" segments that encode
    independently and concatenate in salt order (delta chains restart
    per segment). Prevents a single reducer from owning a posting list
    with ~10^11 entries at the 10^12-doc design scale.

    ``block_size``: postings per block-max block (WAND skipping unit).

    ``store_source``: keep each doc's text in the docs table (the ES
    ``_source`` behaviour, ElasticIndexer.js PUT body) so
    :meth:`QueryEngine.fetch`/:meth:`QueryEngine.search` can return
    documents, not just ids. Off by default — at 10^12 docs the source
    column dominates storage and most pipelines keep the corpus table
    as the source of truth.

    ``store_positions``: add the positional sidecar (per-doc
    delta+varbyte position streams) to every posting segment, enabling
    codec-level phrase queries (:meth:`QueryEngine.phrase_topk` — the
    ES ``match_phrase`` scale path). Roughly doubles postings bytes;
    off by default.

    ``indexed_fields``: the analyzed full-text FIELDS of each document
    (the reference's ES mapping declares two — ``body`` and ``title``,
    examples/mapping.json:11-12 — and its tests assert on both,
    test/FileSpecPage.js:71-87). The default single field ``("text",)``
    stores terms bare (zero overhead, the round-1/2 layout). With
    multiple fields every field's tokens are indexed under a
    ``{field}:{token}`` term key with that FIELD's own document
    lengths, so per-field df/idf/avgdl — and therefore ES-style
    per-field BM25 — fall out of the ordinary machinery:
    :meth:`QueryEngine.topk(field=...)` scores one field,
    :meth:`QueryEngine.multi_match` combines several (best_fields /
    most_fields).
    """

    k1: float = 1.2
    b: float = 0.75
    n_groups: int = 8
    salt_threshold: int = 100_000
    n_salts: int = 16
    block_size: int = 128
    shuffle_partitions: int | None = None
    index_langs: tuple[str, ...] = ("en",)
    store_source: bool = False
    store_positions: bool = False
    indexed_fields: tuple[str, ...] = ("text",)
    # ES doc-values: non-analyzed columns of the input docs stored in
    # the index's docs table (ride through deltas and compaction), so
    # search-time aggregations (:meth:`QueryEngine.search_aggs`) and
    # _source hits can use them without an external doc store
    stored_fields: tuple[str, ...] = ()
    # Configurable analyzer (round 6): stopword removal and the pinned
    # minimal_english stemmer (the Lucene EnglishMinimalStemmer),
    # applied build-side (functions.analysis.analyze_col) AND to query
    # text by the engine (the stored mapping carries both, so
    # upsert/compact inherit and drift raises). The empty default is
    # the historical pinned chain, bit-for-bit.
    stopwords: tuple[str, ...] = ()
    stemmer: str | None = None
    extra: dict = field(default_factory=dict)

    @property
    def bm25(self) -> BM25Config:
        return BM25Config(k1=self.k1, b=self.b)

    @property
    def fielded(self) -> bool:
        """True when the index stores field-prefixed terms (any field
        set other than the bare default)."""
        return self.indexed_fields != ("text",)

    @property
    def default_field(self) -> str:
        return "text" if "text" in self.indexed_fields else self.indexed_fields[0]
