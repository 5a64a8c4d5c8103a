"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything here is a pure column expression (JVM, codegen'd) so each
operator has an exact DuckDB-SQL twin for the driver's oracle gate.
At 100 TB these run inside the page scan — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xml_to_es_spark.functions.analysis import tokens_col

# Tiny pinned stopword lists (top function words). The heuristic is
# n-gram/stopword-ratio language ID: argmax over per-language hit
# ratios, 'und' when nothing hits.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "que", "los", "una", "por", "con", "para", "del", "las"],
}


def lang_hit_ratio(text_col: str, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    toks = tokens_col(text_col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(words))
    )
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def lang_id(text_col: str, min_ratio: float = 0.02) -> Column:
    """Heuristic language ID: argmax stopword-hit ratio, 'und' below
    ``min_ratio``. Deterministic tie-break = language list order."""
    langs = list(STOPWORDS)
    best_lang = F.lit("und")
    best_ratio = F.lit(float(min_ratio))
    # fold right-to-left so earlier languages win ties
    for lang in reversed(langs):
        r = lang_hit_ratio(text_col, lang)
        cond = r > best_ratio
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(cond, r).otherwise(best_ratio)
    return best_lang


def token_count(text_col: str) -> Column:
    """Pinned-regex token count (the BPE-ish [a-z0-9]+ splitter)."""
    return F.size(tokens_col(text_col)).cast("long")


def whitespace_token_count(text_col: str) -> Column:
    """Whitespace token count (the cheap pre-tokenizer)."""
    return F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    ).cast("long")


def punct_ratio(text_col: str) -> Column:
    """Punctuation chars / total chars."""
    c = F.col(text_col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?\"']", ""))
    return (n_punct / F.greatest(F.length(c), F.lit(1))).cast("double")


def mean_word_len(text_col: str) -> Column:
    toks = tokens_col(text_col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (total / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(text_col: str) -> Column:
    """Composite quality in [0,1]: length band + stopword ratio +
    punctuation sanity + mean-word-length band. A Gopher-rules-style
    filter (published heuristics), pinned for oracle parity:
      0.25 * (50 <= n_tokens <= 10000)
    + 0.25 * (en stopword ratio >= 0.01)
    + 0.25 * (punct_ratio <= 0.2)
    + 0.25 * (3 <= mean_word_len <= 12)
    """
    n = token_count(text_col)
    s = lang_hit_ratio(text_col, "en")
    p = punct_ratio(text_col)
    m = mean_word_len(text_col)
    band = ((n >= 50) & (n <= 10000)).cast("double") * 0.25
    stop = (s >= 0.01).cast("double") * 0.25
    punct = (p <= 0.2).cast("double") * 0.25
    wl = ((m >= 3.0) & (m <= 12.0)).cast("double") * 0.25
    return F.round(band + stop + punct + wl, 2)


def fingerprint(text_col: str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (canonical 'bag fingerprint' — catches
    shuffled/re-wrapped copies that exact text hashing misses)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(text_col)))))


def rolling_hash(text_col: str, base: int = 257, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over token md5s — a content-defined
    fingerprint with positional sensitivity, via aggregate (fold).
    JVM-side. Modulus is the Mersenne prime 2^31-1 so the fold's
    ``acc*base + x`` stays within int64 under ANSI arithmetic
    (acc < 2^31, base 257, x < 2^32 → < 2^41)."""
    toks = tokens_col(text_col)
    # per-token 32-bit value from md5 hex prefix
    tok_vals = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        tok_vals,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * base + x, F.lit(mod)),
    )
