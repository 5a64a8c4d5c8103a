"""ES/Lucene ``query_string`` → the engine's rich nested bool tree.

The classic Lucene query-string syntax (the ES ``query_string`` query
— the power-user sibling of ``simple_query_string``), compiled onto
:meth:`QueryEngine.bool_topk`'s rich spec so the whole query runs as
ONE postings scan + one per-clause hash-agg regardless of nesting
(reference context: its users hit the ES index ElasticIndexer.js:76
builds with Kibana-style query strings — this is that front door).

Supported syntax, all composable::

    hash join                    bare terms (default_operator, OR)
    +must -mustnot bare          sqs-style markers (implicit groups)
    a AND b, a OR b, NOT a       explicit operators (&&, ||, ! too)
    (a OR b) AND c               grouping, any depth
    "sort merge"                 phrase
    "sort merge"~2               phrase with slop
    title:hash                   fielded term (indexed text field)
    lang:en                      doc-values term  → constant_score
    n_chars:[100 TO 500]         doc-values range → constant_score
    n_chars:{100 TO *}           exclusive / open bounds
    term^2, "a b"^3, (a b)^0.5   boosts on terms, phrases, groups
    fuzzy~ fuzzy~2               fuzzy term (dictionary expansion)
    wild* w?ld *card             wildcard term (constant_score)

Deviations from classic Lucene, all raising or documented:

- **Strict precedence** NOT > AND > OR (classic Lucene's
  BooleanQuery operator handling is famously non-boolean; this
  module implements the algebra users mean, like ES's
  newer match/bool compilers do).
- **No mixing** of ``+``/``-`` markers with explicit AND/OR inside
  one group, and no implicit adjacency inside an explicit group —
  both raise (the classic parser silently reinterprets; nothing is
  silently ignored here).
- ``NOT``/``-`` needs a conjunctive context: ``NOT a`` alone or
  ``a OR NOT b`` is an unbounded corpus complement and raises
  (the engine's bool compiler enforces the same invariant).
- Multi-term expansions (fuzzy/wildcard) rewrite exactly like the
  standalone ``fuzzy``/``wildcard`` query kinds: fuzzy scores
  per-variant idf (OR over the capped closest variants), wildcard
  rewrites to constant_score — Lucene's default multi-term rewrite.
  A pattern with zero dictionary matches compiles to a
  never-matching ``{term: {doc_id: -1}}`` filter, i.e. it matches
  nothing without failing the whole query (ES behaviour).
- Doc-values terms/ranges score as constant_score (boost, default
  1.0) — Lucene's ConstantScore(1) for query-context filters; ES
  keyword TermQuery idf-scoring is NOT reproduced (documented).

Pure-python: :func:`parse_query_string` needs no Spark — the DuckDB
oracle twin compiles the same specs (parser identity, the
``sqs_mixed`` pattern). Expansion atoms need an ``expand`` callback
(engine-backed in ``es_query``); without one they raise, so the
parser stays usable at module-import time for twin generation.
"""

from __future__ import annotations

import re
from typing import Callable

__all__ = ["parse_query_string"]

_WORD = re.compile(r"[A-Za-z0-9_.*?]+")
_FIELD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM = re.compile(r"\d+(?:\.\d+)?")


# ---------------------------------------------------------------------------
# tokenizer


class _Tok:
    __slots__ = ("kind", "val", "pos")

    def __init__(self, kind, val, pos):
        self.kind, self.val, self.pos = kind, val, pos

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Tok({self.kind}, {self.val!r})"


def _err(msg: str, pos: int, text: str) -> ValueError:
    return ValueError(f"query_string: {msg} at offset {pos}: {text!r}")


def _scan_boost(text: str, i: int, pos: int) -> tuple[float | None, int]:
    """Optional ``^N`` suffix starting at i."""
    if i < len(text) and text[i] == "^":
        m = _NUM.match(text, i + 1)
        if not m:
            raise _err("'^' needs a number", pos, text)
        return float(m.group()), m.end()
    return None, i


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("LP", None, i))
            i += 1
            continue
        if c == ")":
            toks.append(_Tok("RP", None, i))
            j = i + 1
            boost, j = _scan_boost(text, j, i)
            if boost is not None:
                toks.append(_Tok("BOOST", boost, i + 1))
            i = j
            continue
        if c in "+-" and i + 1 < n and not text[i + 1].isspace() \
                and text[i + 1] != ")":
            toks.append(_Tok("PLUS" if c == "+" else "MINUS", None, i))
            i += 1
            continue
        if c == "!":
            toks.append(_Tok("NOT", None, i))
            i += 1
            continue
        if text.startswith("&&", i):
            toks.append(_Tok("AND", None, i))
            i += 2
            continue
        if text.startswith("||", i):
            toks.append(_Tok("OR", None, i))
            i += 2
            continue
        if c == '"':
            end = text.find('"', i + 1)
            if end < 0:
                raise _err("unterminated quote", i, text)
            body = text[i + 1:end]
            if not body.strip():
                raise _err("empty phrase", i, text)
            j = end + 1
            slop = 0
            if j < n and text[j] == "~":
                m = _NUM.match(text, j + 1)
                if not m:
                    raise _err('"..."~ needs a slop number', j, text)
                slop = int(float(m.group()))
                j = m.end()
            boost, j = _scan_boost(text, j, i)
            toks.append(_Tok("PHRASE", (body, slop, boost), i))
            i = j
            continue
        if c in "[{":
            close = {"[": "]", "{": "}"}
            m = re.compile(r"[\[{]\s*(\S+)\s+TO\s+(\S+)\s*([\]}])").match(
                text, i
            )
            if not m:
                raise _err("range must be [x TO y] / {x TO y}", i, text)
            lo, hi, rbr = m.group(1), m.group(2), m.group(3)
            del close
            j = m.end()
            boost, j = _scan_boost(text, j, i)
            toks.append(
                _Tok("RANGE", (lo, hi, c == "[", rbr == "]", boost), i)
            )
            i = j
            continue
        m = _WORD.match(text, i)
        if not m:
            raise _err(f"unexpected character {c!r}", i, text)
        w = m.group()
        j = m.end()
        if w in ("AND", "OR", "NOT"):
            toks.append(_Tok(w, None, i))
            i = j
            continue
        if j < n and text[j] == ":":
            if not _FIELD.fullmatch(w):
                raise _err(f"bad field name {w!r}", i, text)
            toks.append(_Tok("FIELD", w, i))
            i = j + 1
            continue
        fuzz = None
        if j < n and text[j] == "~":
            m2 = _NUM.match(text, j + 1)
            fuzz = int(float(m2.group())) if m2 else 1
            j = m2.end() if m2 else j + 1
        boost, j = _scan_boost(text, j, i)
        toks.append(_Tok("TERM", (w, fuzz, boost), i))
        i = j
    return toks


# ---------------------------------------------------------------------------
# parser → AST
#
# AST: ("term", text, field, boost, fuzz) | ("wild", pat, field, boost)
#      ("phrase", text, field, slop, boost)
#      ("range", field, lo, hi, incl_lo, incl_hi, boost)
#      ("and", [items]) | ("or", [items]) | ("not", item)
#      ("seq", [(sign, item), ...])  — implicit whitespace group
#      ("boost", item, b)            — (group)^b


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise _err("unexpected end of query", len(self.text), self.text)
        self.i += 1
        return t

    # -- group level ---------------------------------------------------------

    def parse_group(self, inner: bool) -> tuple:
        """One paren level: either an implicit ±sequence or an
        explicit AND/OR expression — never a silent mix."""
        items: list = []  # ("op", tok) | ("sign", s) | ("atom", node)
        depth_guard = self.i
        while True:
            t = self.peek()
            if t is None or (t.kind == "RP" and inner):
                break
            if t.kind == "RP":
                raise _err("unmatched ')'", t.pos, self.text)
            if t.kind in ("AND", "OR"):
                self.take()
                items.append(("op", t.kind, t.pos))
                continue
            if t.kind in ("NOT", "PLUS", "MINUS"):
                self.take()
                nxt = self.parse_operand()
                items.append(
                    ("signed", "-" if t.kind in ("NOT", "MINUS") else "+",
                     t.kind, nxt, t.pos)
                )
                continue
            items.append(("atom", self.parse_operand(), t.pos))
        if self.i == depth_guard:
            raise _err("empty group", depth_guard, self.text)

        has_op = any(it[0] == "op" for it in items)
        if not has_op:
            seq = []
            for it in items:
                if it[0] == "atom":
                    seq.append(("", it[1]))
                else:
                    _sk, sign, _kind, node, _pos = it
                    seq.append((sign, node))
            if len(seq) == 1 and seq[0][0] == "":
                return seq[0][1]
            return ("seq", seq)

        # explicit-operator group: no +/- markers, no implicit
        # adjacency; NOT is the only unary
        expr: list = []  # alternating operand / op
        for it in items:
            if it[0] == "op":
                if not expr or isinstance(expr[-1], str):
                    raise _err(
                        f"{it[1]} needs an operand on both sides",
                        it[2], self.text,
                    )
                expr.append(it[1])
                continue
            if it[0] == "signed":
                _sk, _sign, kind, node, pos = it
                if kind != "NOT":
                    raise _err(
                        "+/- markers cannot mix with explicit AND/OR in "
                        "one group — use NOT / operators throughout",
                        pos, self.text,
                    )
                node = ("not", node)
            else:
                node, pos = it[1], it[2]
            if expr and not isinstance(expr[-1], str):
                raise _err(
                    "implicit adjacency cannot mix with explicit AND/OR "
                    "in one group — add the operator",
                    pos, self.text,
                )
            expr.append(node)
        if isinstance(expr[-1], str):
            raise _err(
                f"dangling {expr[-1]}", len(self.text), self.text
            )
        # precedence: AND binds tighter than OR
        or_items: list = []
        and_run: list = []
        j = 0
        while j < len(expr):
            and_run.append(expr[j])
            if j + 1 < len(expr) and expr[j + 1] == "AND":
                j += 2
                continue
            or_items.append(
                and_run[0] if len(and_run) == 1 else ("and", and_run)
            )
            and_run = []
            j += 2
        node = or_items[0] if len(or_items) == 1 else ("or", or_items)
        return node

    # -- operands --------------------------------------------------------

    def parse_operand(self) -> tuple:
        t = self.take()
        if t.kind == "LP":
            node = self.parse_group(inner=True)
            rp = self.take()
            if rp.kind != "RP":
                raise _err("expected ')'", rp.pos, self.text)
            b = self.peek()
            if b is not None and b.kind == "BOOST":
                self.take()
                node = ("boost", node, b.val)
            return node
        if t.kind == "FIELD":
            nxt = self.peek()
            if nxt is not None and nxt.kind == "RANGE":
                self.take()
                lo, hi, incl_lo, incl_hi, boost = nxt.val
                return ("range", t.val, lo, hi, incl_lo, incl_hi, boost)
            inner = self.parse_operand()
            return self._scope_field(inner, t.val, t.pos)
        if t.kind == "PHRASE":
            body, slop, boost = t.val
            return ("phrase", body, None, slop, boost)
        if t.kind == "RANGE":
            raise _err("a range needs a field: prefix", t.pos, self.text)
        if t.kind == "TERM":
            w, fuzz, boost = t.val
            if "*" in w or "?" in w:
                if fuzz is not None:
                    raise _err(
                        "wildcard and fuzzy cannot combine", t.pos, self.text
                    )
                return ("wild", w.lower(), None, boost)
            return ("term", w, None, boost, fuzz)
        raise _err(f"unexpected {t.kind}", t.pos, self.text)

    def _scope_field(self, node: tuple, field: str, pos: int) -> tuple:
        """Distribute ``field:`` over an operand (term, phrase, group)."""
        kind = node[0]
        if kind == "term":
            _k, w, f, boost, fuzz = node
            return ("term", w, field, boost, fuzz)
        if kind == "wild":
            _k, w, f, boost = node
            return ("wild", w, field, boost)
        if kind == "phrase":
            _k, body, f, slop, boost = node
            return ("phrase", body, field, slop, boost)
        if kind in ("and", "or"):
            return (kind, [self._scope_field(c, field, pos)
                           for c in node[1]])
        if kind == "seq":
            return ("seq", [(s, self._scope_field(c, field, pos))
                            for s, c in node[1]])
        if kind == "not":
            return ("not", self._scope_field(node[1], field, pos))
        if kind == "boost":
            return ("boost", self._scope_field(node[1], field, pos),
                    node[2])
        raise _err(f"{kind} cannot take a field prefix", pos, self.text)

    def parse(self) -> tuple:
        node = self.parse_group(inner=False)
        left = self.peek()
        if left is not None:
            raise _err(f"unexpected {left.kind}", left.pos, self.text)
        return node


# ---------------------------------------------------------------------------
# AST → rich bool spec


def _coerce(v: str):
    if v == "*":
        return None
    if re.fullmatch(r"-?\d+", v):
        return int(v)
    if re.fullmatch(r"-?\d+\.\d+", v):
        return float(v)
    return v


class _Compiler:
    def __init__(self, default_field, default_operator, docvalue_fields,
                 expand, max_expansions):
        self.default_field = default_field
        self.default_op = default_operator
        self.docvalues = set(docvalue_fields or ())
        self.expand = expand
        self.cap = max_expansions

    def _leaf_field(self, field):
        return field if field is not None else self.default_field

    def clause(self, node: tuple) -> dict:
        """One AST node → one rich bool clause dict."""
        kind = node[0]
        if kind == "term":
            _k, w, field, boost, fuzz = node
            f = self._leaf_field(field)
            if f in self.docvalues:
                if fuzz is not None:
                    raise ValueError(
                        f"query_string: fuzzy on doc-values field {f!r}"
                    )
                inner = {"term": {f: _coerce(w)}}
                cs: dict = {"filter": inner}
                if boost is not None:
                    cs["boost"] = boost
                return {"constant_score": cs}
            m: dict = {"query": w}
            if f is not None:
                m["field"] = f
            if fuzz is not None:
                if self.expand is None:
                    raise ValueError(
                        "query_string: fuzzy atoms need an engine-backed "
                        "expander (es_search provides one)"
                    )
                variants = self.expand("fuzzy", w.lower(), f, fuzz, self.cap)
                if not variants:
                    return {"term": {"doc_id": -1}}
                m["query"] = " ".join(variants)
                m["operator"] = "or"
            if boost is not None:
                m["boost"] = boost
            return {"match": m}
        if kind == "wild":
            _k, pat, field, boost = node
            f = self._leaf_field(field)
            if f in self.docvalues:
                raise ValueError(
                    f"query_string: wildcard on doc-values field {f!r}"
                )
            if self.expand is None:
                raise ValueError(
                    "query_string: wildcard atoms need an engine-backed "
                    "expander (es_search provides one)"
                )
            variants = self.expand("wildcard", pat, f, None, self.cap)
            if not variants:
                return {"term": {"doc_id": -1}}
            m = {"query": " ".join(variants), "operator": "or"}
            if f is not None:
                m["field"] = f
            cs = {"filter": {"match": m}}
            if boost is not None:
                cs["boost"] = boost
            return {"constant_score": cs}
        if kind == "phrase":
            _k, body, field, slop, boost = node
            f = self._leaf_field(field)
            if f in self.docvalues:
                raise ValueError(
                    f"query_string: phrase on doc-values field {f!r}"
                )
            p: dict = {"query": body}
            if f is not None:
                p["field"] = f
            if slop:
                p["slop"] = slop
            if boost is not None:
                p["boost"] = boost
            return {"match_phrase": p}
        if kind == "range":
            _k, field, lo, hi, incl_lo, incl_hi, boost = node
            bounds: dict = {}
            lov, hiv = _coerce(lo), _coerce(hi)
            if lov is not None:
                bounds["gte" if incl_lo else "gt"] = lov
            if hiv is not None:
                bounds["lte" if incl_hi else "lt"] = hiv
            if not bounds:
                raise ValueError(
                    "query_string: [* TO *] matches everything — an "
                    "unbounded corpus scan"
                )
            cs = {"filter": {"range": {field: bounds}}}
            if boost is not None:
                cs["boost"] = boost
            return {"constant_score": cs}
        if kind == "boost":
            inner = self.node_spec(node[1])
            inner["boost"] = float(node[2]) * float(inner.get("boost", 1.0))
            return {"bool": inner}
        if kind in ("and", "or", "seq", "not"):
            return {"bool": self.node_spec(node)}
        raise ValueError(f"query_string: unknown AST node {kind!r}")

    def node_spec(self, node: tuple) -> dict:
        """A compound AST node → a bool NODE body dict."""
        kind = node[0]
        if kind == "seq":
            role_of = {"+": "must", "-": "must_not",
                       "": "must" if self.default_op == "and" else "should"}
            out: dict = {}
            for sign, child in node[1]:
                out.setdefault(role_of[sign], []).append(self.clause(child))
            if set(out) == {"must_not"}:
                raise ValueError(
                    "query_string: negative-only query is an unbounded "
                    "corpus complement; add a positive clause"
                )
            return out
        if kind == "and":
            out = {}
            for child in node[1]:
                role = "must"
                if child[0] == "not":
                    role, child = "must_not", child[1]
                out.setdefault(role, []).append(self.clause(child))
            return out
        if kind == "or":
            subs = []
            for child in node[1]:
                if child[0] == "not":
                    raise ValueError(
                        "query_string: NOT under OR is an unbounded "
                        "corpus complement; restructure with AND NOT"
                    )
                subs.append(self.clause(child))
            return {"should": subs}
        if kind == "not":
            raise ValueError(
                "query_string: NOT needs a conjunctive context "
                "(a AND NOT b); a bare NOT matches the corpus complement"
            )
        if kind == "boost":
            inner = self.node_spec(node[1])
            inner["boost"] = float(node[2]) * float(inner.get("boost", 1.0))
            return inner
        # a single leaf at the top level: one required clause
        return {"must": [self.clause(node)]}


def parse_query_string(
    text: str,
    default_field: str | None = None,
    default_operator: str = "or",
    docvalue_fields: set[str] | frozenset[str] | None = None,
    expand: Callable[[str, str, str | None, int | None, int], list[str]]
    | None = None,
    max_expansions: int = 50,
) -> dict:
    """Parse one query string into the engine's rich bool NODE spec
    (the dict :meth:`QueryEngine.bool_topk` takes per query).

    ``expand(kind, pattern, field, fuzziness, cap) -> [bare tokens]``
    resolves fuzzy/wildcard atoms against the index dictionary —
    omit it for expansion-free strings (the pure-python path the
    DuckDB oracle twin uses). ``docvalue_fields`` names the stored
    doc-values columns; ``field:`` prefixes naming one compile to
    structured constant_score filters instead of text matches.
    """
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    if not text or not text.strip():
        raise ValueError("empty query_string")
    ast = _Parser(text).parse()
    comp = _Compiler(
        default_field, default_operator, docvalue_fields, expand,
        max_expansions,
    )
    return comp.node_spec(ast)
