"""The pinned analysis chain as JVM-side column expressions.

The tokenizer (FIXTURES.md §5) approximates the ES standard analyzer
the reference's mapping delegates to (examples/mapping.json:11-12,
``"analyzed"`` body/title): lowercase → extract all ``[a-z0-9]+``
runs. It is expressed three ways that must agree exactly:

- Spark: ``F.regexp_extract_all(F.lower(col), '[a-z0-9]+', 0)``
  (JVM, whole-stage-codegen'd — never Python);
- Python oracle: ``re.findall('[a-z0-9]+', text.lower())`` (pyref);
- DuckDB oracle SQL: ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xml_to_es_spark.config import TOKEN_PATTERN


def tokens_col(text: Column | str) -> Column:
    """text → array<string> of tokens, entirely JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def stem_minimal_english_col(t: Column) -> Column:
    """JVM twin of :func:`xml_to_es_spark.pyref.stem_minimal_english`
    (the Lucene EnglishMinimalStemmer, exact branch order) as a pure
    CASE/substr expression — whole-stage-codegen'd, no UDF."""
    n = F.length(t)
    c1, c2 = F.substring(t, -1, 1), F.substring(t, -2, 1)
    c3, c4 = F.substring(t, -3, 1), F.substring(t, -4, 1)
    return (
        F.when((n < 3) | (c1 != "s"), t)
        .when(c2.isin("u", "s"), t)
        .when(
            (c2 == "e") & (n > 3) & (c3 == "i") & ~c4.isin("a", "e"),
            F.concat(t.substr(F.lit(1), n - 3), F.lit("y")),
        )
        .when((c2 == "e") & c3.isin("i", "a", "o", "e"), t)
        .otherwise(t.substr(F.lit(1), n - 1))
    )


def analyze_col(
    text: Column | str,
    stopwords: tuple[str, ...] = (),
    stemmer: str | None = None,
) -> Column:
    """The CONFIGURABLE analysis chain as one JVM expression:
    :func:`tokens_col` → stopword removal (array filter over a
    literal set) → minimal_english stemming (per-element CASE).
    Default empty config degenerates to :func:`tokens_col` exactly —
    zero plan change for existing indexes. Positions downstream are
    indices in the FILTERED stream (no ES position-increment gaps —
    documented deviation: a phrase spanning a removed stopword
    matches when its survivors are adjacent)."""
    toks = tokens_col(text)
    if stopwords:
        stops = [str(s) for s in stopwords]
        toks = F.filter(toks, lambda t: ~t.isin(stops))
    if stemmer == "minimal_english":
        toks = F.transform(toks, stem_minimal_english_col)
    elif stemmer is not None:
        raise ValueError(
            f"unsupported stemmer {stemmer!r} (minimal_english is the "
            "pinned chain)"
        )
    return toks


def sql_analyze(
    text_expr: str,
    stopwords: tuple[str, ...] = (),
    stemmer: str | None = None,
) -> str:
    """DuckDB twin of :func:`analyze_col`: the same tokenize →
    stop-filter → minimal_english chain as one SQL expression over
    ``text_expr``."""
    out = f"regexp_extract_all(lower({text_expr}), '[a-z0-9]+')"
    if stopwords:
        lits = ", ".join(f"'{s}'" for s in stopwords)
        out = f"list_filter({out}, t -> t NOT IN ({lits}))"
    if stemmer == "minimal_english":
        stem = (
            "CASE"
            " WHEN len(t) < 3 OR t[-1] != 's' THEN t"
            " WHEN t[-2] IN ('u', 's') THEN t"
            " WHEN t[-2] = 'e' AND len(t) > 3 AND t[-3] = 'i'"
            "  AND t[-4] NOT IN ('a', 'e')"
            "  THEN t[1:len(t)-3] || 'y'"
            " WHEN t[-2] = 'e' AND t[-3] IN ('i', 'a', 'o', 'e') THEN t"
            " ELSE t[1:len(t)-1] END"
        )
        out = f"list_transform({out}, t -> {stem})"
    elif stemmer is not None:
        raise ValueError(f"unsupported stemmer {stemmer!r}")
    return out


def doc_len_col(tokens: Column | str) -> Column:
    """token count as long (cast so Spark's int matches DuckDB bigint)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(c).cast("long")


_ABSENT = 2**31 - 1
# fragment chains ADD to the sentinel (next-window start = absent
# start + fragment_size), so the multi-fragment sentinel must leave
# headroom below int32 max or Spark's ANSI mode throws on the add
_FRAG_ABSENT = 2**30


def snippet_col(text: Column | str, terms: list[str], width: int = 80) -> Column:
    """ES plain-highlighter-style snippet: the ``width``-char window
    starting ``width // 4`` chars before the EARLIEST occurrence of
    any query term (case-insensitive), or the leading ``width`` chars
    when no term occurs. Pure JVM (locate/least/substring) with an
    exact DuckDB twin (:func:`sql_snippet`)."""
    c = F.col(text) if isinstance(text, str) else text
    low = F.lower(c)
    locs = [
        F.when(F.locate(t.lower(), low) > 0, F.locate(t.lower(), low)).otherwise(
            F.lit(_ABSENT)
        )
        for t in terms
    ]
    first = locs[0] if len(locs) == 1 else F.least(*locs)
    first = F.when(first == _ABSENT, F.lit(1)).otherwise(first)
    start = F.greatest(first - F.lit(width // 4), F.lit(1))
    return F.substring(c, start, F.lit(width))


def mark_terms_col(
    snippet: Column,
    terms: list[str],
    pre: str = "<em>",
    post: str = "</em>",
) -> Column:
    """ES highlight term marking: wrap every whole-word,
    case-insensitive occurrence of a query term inside an
    already-built snippet with ``pre``/``post`` tags (the ES
    ``pre_tags``/``post_tags``, default ``<em>``). One JVM
    regexp_replace; tokens are ``[a-z0-9]+`` by the pinned analyzer,
    so the alternation needs no quoting."""
    import re as _re

    toks = sorted({t.lower() for t in terms if t})
    if not toks or any(_re.fullmatch(r"[a-z0-9]+", t) is None
                       for t in toks):
        raise ValueError(
            "mark_terms_col takes analyzer tokens ([a-z0-9]+)"
        )
    pattern = r"(?i)\b(" + "|".join(toks) + r")\b"
    # Java regex replacement treats $ and \ specially — escape both so
    # arbitrary ES pre_tags/post_tags pass through literally.
    esc = {"pre": _re.sub(r"([\\$])", r"\\\1", pre),
           "post": _re.sub(r"([\\$])", r"\\\1", post)}
    return F.regexp_replace(snippet, pattern, f"{esc['pre']}$1{esc['post']}")


def sql_snippet(col: str, terms: list[str], width: int = 80) -> str:
    """DuckDB twin of :func:`snippet_col` (1-based instr/substring,
    same earliest-match and fallback rules)."""
    locs = ", ".join(
        f"(CASE WHEN instr(lower({col}), '{t.lower()}') > 0"
        f" THEN instr(lower({col}), '{t.lower()}') ELSE {_ABSENT} END)"
        for t in terms
    )
    first = f"least({locs})" if len(terms) > 1 else locs
    return (
        f"substring({col}, greatest((CASE WHEN {first} = {_ABSENT}"
        f" THEN 1 ELSE {first} END) - {width // 4}, 1), {width})"
    )


def snippet_fragments_col(
    text: Column | str,
    terms: list[str],
    fragment_size: int = 80,
    number_of_fragments: int = 2,
) -> Column:
    """ES highlight with ``number_of_fragments`` > 1: an ARRAY of up
    to N ``fragment_size``-char windows, each anchored on the earliest
    query-term occurrence AT OR AFTER the previous window's end (so
    fragments advance through the doc and never overlap), empty when
    no term occurs (the ES no-highlight behaviour — unlike the
    single-snippet fallback). Pure JVM, unrolled N times
    (locate-on-substring gives locate-from-position), exact DuckDB
    twin :func:`sql_snippet_fragments`."""
    c = F.col(text) if isinstance(text, str) else text
    low = F.lower(c)
    frags = []
    pos = F.lit(1)
    for _i in range(number_of_fragments):
        rest = F.substring(low, pos, F.length(low))
        locs = [
            F.when(
                F.locate(t.lower(), rest) > 0,
                pos + F.locate(t.lower(), rest) - 1,
            ).otherwise(F.lit(_FRAG_ABSENT))
            for t in terms
        ]
        occ = locs[0] if len(locs) == 1 else F.least(*locs)
        start = F.greatest(occ - F.lit(fragment_size // 4), F.lit(1))
        frags.append(
            F.when(occ < _FRAG_ABSENT, F.substring(c, start, fragment_size))
        )
        pos = start + F.lit(fragment_size)
    return F.array_compact(F.array(*frags))


def sql_snippet_fragments(
    col: str,
    terms: list[str],
    fragment_size: int = 80,
    number_of_fragments: int = 2,
) -> list[str]:
    """DuckDB twin of :func:`snippet_fragments_col` as a list of
    per-fragment SELECT layers: call :func:`sql_snippet_fragments_query`
    to assemble, or use the layers to embed in a larger query. Each
    layer defines occ<i>/start<i>/f<i>/pos<i+1> from pos<i>."""
    layers = []
    for i in range(1, number_of_fragments + 1):
        pos = "1" if i == 1 else f"pos{i}"
        locs = ", ".join(
            f"(CASE WHEN instr(substring(lower({col}), {pos}), '{t.lower()}') > 0"
            f" THEN {pos} + instr(substring(lower({col}), {pos}), '{t.lower()}') - 1"
            f" ELSE {_FRAG_ABSENT} END)"
            for t in terms
        )
        occ = f"least({locs})" if len(terms) > 1 else locs
        layers.append(
            f"SELECT *, {occ} AS occ{i},"
            f" greatest({occ} - {fragment_size // 4}, 1) AS start{i},"
            f" CASE WHEN {occ} < {_FRAG_ABSENT}"
            f" THEN substring({col}, greatest({occ} - {fragment_size // 4}, 1),"
            f" {fragment_size}) END AS f{i},"
            f" greatest({occ} - {fragment_size // 4}, 1) + {fragment_size}"
            f" AS pos{i + 1}"
        )
    return layers


def phrase_match_col(text: Column | str, phrase: str) -> Column:
    """ES ``match_phrase`` predicate: the phrase's tokens occur
    CONSECUTIVELY in the document's token stream. Pure JVM: exists
    over candidate start offsets with element-wise equality — no
    positions index needed for the scan-shaped path (a positional
    postings sidecar is the index-time alternative at scale)."""
    from xml_to_es_spark.pyref import tokenize

    terms = tokenize(phrase)
    if not terms:
        return F.lit(False)
    toks = tokens_col(text)
    m = len(terms)

    def at_offset(i):
        cond = None
        for j, t in enumerate(terms):
            c = F.element_at(toks, i + F.lit(j + 1)) == t
            cond = c if cond is None else cond & c
        return cond

    return F.when(
        F.size(toks) >= m,
        F.exists(F.sequence(F.lit(0), F.size(toks) - F.lit(m)), at_offset),
    ).otherwise(F.lit(False))


def sql_phrase_match(tokens_expr: str, phrase: str) -> str:
    """DuckDB twin of :func:`phrase_match_col`. ``tokens_expr`` names
    an already-computed token-array column (compute it once in a CTE;
    1-based list indexing, exclusive-end range, empty range when the
    doc is shorter than the phrase)."""
    from xml_to_es_spark.pyref import tokenize

    terms = tokenize(phrase)
    m = len(terms)
    conds = " AND ".join(
        f"{tokens_expr}[i + {j}] = '{t}'" for j, t in enumerate(terms)
    )
    return (
        f"(len(list_filter(range(1, len({tokens_expr}) - {m} + 2),"
        f" i -> {conds})) > 0)"
    )


def sql_phrase_slop_match(tokens_expr: str, phrase: str, slop: int) -> str:
    """DuckDB twin of the slop kernel's shifted-position-span
    semantics (see QueryEngine.phrase_topk): anchor a runs over every
    possible window start; slot j matches iff some position in
    [a+j, a+j+slop] holds term j. 1-based list indexing; greatest()
    clamps keep list_slice away from DuckDB's negative-index
    (from-the-end) semantics."""
    from xml_to_es_spark.pyref import tokenize

    terms = tokenize(phrase)
    m = len(terms)
    conds = " AND ".join(
        f"list_contains(list_slice({tokens_expr}, greatest(a + {j}, 1),"
        f" greatest(a + {j} + {slop}, 0)), '{t}')"
        for j, t in enumerate(terms)
    )
    return (
        f"(len(list_filter(range(1 - {m}, len({tokens_expr}) + 1),"
        f" a -> {conds})) > 0)"
    )


# DuckDB-SQL fragment equivalents, used to assemble oracle_sql() strings.
SQL_TOKENS = "regexp_extract_all(lower({col}), '[a-z0-9]+')"
SQL_DOC_LEN = "len(regexp_extract_all(lower({col}), '[a-z0-9]+'))"
