"""Property test for the simple_query_string parser: a rendered atom
list always parses back to exactly the tree the atoms describe —
roles from signs, quoted phrases to match_phrase leaves, groups to
nested bool-of-shoulds — and malformed inputs raise instead of
mis-parsing (pure function, no Spark session)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xml_to_es_spark.operators.es_query import _parse_simple_query

WORDS = ["alpha", "beta", "gamma", "delta", "w1", "w2", "sort", "merge"]

term = st.sampled_from(WORDS).map(lambda w: ("term", w))
phrase = st.tuples(
    st.sampled_from(WORDS), st.sampled_from(WORDS)
).map(lambda p: ("phrase", f"{p[0]} {p[1]}"))
group = st.lists(
    st.one_of(term, phrase), min_size=1, max_size=3
).map(lambda atoms: ("group", atoms))
atom = st.tuples(st.sampled_from(["", "+", "-"]), st.one_of(term, phrase, group))


def _render(sign, kind, val):
    if kind == "term":
        return sign + val
    if kind == "phrase":
        return f'{sign}"{val}"'
    inner = " | ".join(
        f'"{v}"' if k == "phrase" else v for k, v in val
    )
    return f"{sign}({inner})"


def _expected_clause(kind, val):
    if kind == "term":
        return {"match": {"query": val}}
    if kind == "phrase":
        return {"match_phrase": {"query": val}}
    return {"bool": {"should": [_expected_clause(k, v) for k, v in val]}}


@settings(max_examples=300, deadline=None)
@given(st.lists(atom, min_size=1, max_size=6))
def test_parser_tree_matches_atoms(atoms):
    text = " ".join(_render(s, k, v) for s, (k, v) in atoms)
    out = _parse_simple_query(text)
    plain = all(k == "term" for _s, (k, _v) in atoms)
    role_of = {"+": "must", "-": "must_not", "": "should"}
    if plain:
        # legacy flat dict: role → space-joined terms, in input order
        expect: dict = {}
        for s, (_k, v) in atoms:
            r = role_of[s]
            expect[r] = (expect.get(r, "") + " " + v).strip()
        assert out == expect
    else:
        expect = {}
        for s, (k, v) in atoms:
            expect.setdefault(role_of[s], []).append(_expected_clause(k, v))
        assert out == expect


@pytest.mark.parametrize("bad", [
    '"unterminated',
    '(unclosed',
    'top | level',
    '((nested))',
    '(a | (b))',
    '""',
    '( | )',
    '',
    '   ',
])
def test_malformed_inputs_raise(bad):
    with pytest.raises(ValueError):
        _parse_simple_query(bad)
