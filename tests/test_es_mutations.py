"""ES document-mutation APIs over the query DSL: _delete_by_query
(match set → kill log, fully distributed), _update (partial doc merge
re-PUT), _update_by_query (set-field script over the match set), and
the painless-subset script parser. ES parity anchors: rankings after a
mutation are bit-equal to a fresh rebuild of the mutated corpus."""

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.es_query import (
    _script_assignments,
    es_count,
    es_delete_by_query,
    es_update,
    es_update_by_query,
)
from xml_to_es_spark.operators.index_build import IndexBuilder
from xml_to_es_spark.operators.query_engine import QueryEngine

CFG = IndexConfig(
    n_groups=2,
    salt_threshold=40,
    n_salts=3,
    block_size=32,
    store_source=True,
    stored_fields=("lang",),
)


def _corpus(n=30):
    rows = []
    for i in range(n):
        toks = ["alpha", f"w{i}"]
        if i % 2 == 0:
            toks.append("even")
        if i % 3 == 0:
            toks.append("trip")
        rows.append((i, " ".join(toks), "en" if i % 4 else "de"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


@pytest.fixture()
def idx(spark, tmp_path):
    pdf = _corpus()
    path = str(tmp_path / "idx")
    IndexBuilder(spark, CFG).build(spark.createDataFrame(pdf), path)
    return pdf, path


def _ranking(spark, path, q="alpha even"):
    return (
        QueryEngine(spark, path)
        .topk_distributed([(0, q)], k=50)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )


def test_delete_by_query_structured(spark, idx):
    """Deleting by a term filter kills exactly the matching docs and
    leaves the survivors' rankings bit-equal to a rebuild without
    them."""
    pdf, path = idx
    b = IndexBuilder(spark, CFG)
    res = es_delete_by_query(
        b, QueryEngine(spark, path), path,
        {"query": {"term": {"lang": "de"}}},
    )
    want_dead = {i for i in range(30) if i % 4 == 0}
    assert res["deleted"] == len(want_dead)
    eng = QueryEngine(spark, path)
    got = _ranking(spark, path)
    assert not (set(got.doc_id) & want_dead)
    # bit-equal to a rebuild over the survivors
    keep = pdf[~pdf.doc_id.isin(want_dead)]
    import tempfile

    ref_path = tempfile.mkdtemp(prefix="dbq_ref_") + "/idx"
    IndexBuilder(spark, CFG).build(spark.createDataFrame(keep), ref_path)
    want = _ranking(spark, ref_path)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=0)
    # count on a fresh engine agrees
    total = es_count(eng, {"query": {"term": {"lang": "de"}}}).toPandas()
    assert int(total.total[0]) == 0


def test_delete_by_query_text_match(spark, idx):
    pdf, path = idx
    b = IndexBuilder(spark, CFG)
    res = es_delete_by_query(
        b, QueryEngine(spark, path), path, {"query": {"match": {"text": "trip"}}}
    )
    assert res["deleted"] == len({i for i in range(30) if i % 3 == 0})
    got = _ranking(spark, path, "trip")
    assert got.empty


def test_delete_by_query_rejects_paging_keys(spark, idx):
    _, path = idx
    b = IndexBuilder(spark, CFG)
    with pytest.raises(ValueError, match="query"):
        es_delete_by_query(
            b, QueryEngine(spark, path), path,
            {"query": {"match": {"text": "x"}}, "size": 5},
        )


def test_update_stored_field_only_keeps_ranking(spark, idx):
    """A stored-field-only merge lands (new doc values win) while the
    ranking stays bit-equal — unchanged text re-encodes identically."""
    pdf, path = idx
    before = _ranking(spark, path)
    b = IndexBuilder(spark, CFG)
    res = es_update(b, path, 1, {"doc": {"lang": "fr"}})
    assert res["result"] == "updated" and res["n_changed"] == 1
    eng = QueryEngine(spark, path)
    got = eng.fetch([1]).toPandas()
    assert list(got.lang) == ["fr"]
    after = _ranking(spark, path)
    assert list(before.doc_id) == list(after.doc_id)
    assert list(before.score) == pytest.approx(list(after.score), abs=0)


def test_update_text_matches_rebuild(spark, idx):
    pdf, path = idx
    b = IndexBuilder(spark, CFG)
    es_update(b, path, 2, {"doc": {"text": "alpha swapped words"}})
    got = _ranking(spark, path)
    new = pdf.copy()
    new.loc[new.doc_id == 2, "text"] = "alpha swapped words"
    import tempfile

    ref_path = tempfile.mkdtemp(prefix="upd_ref_") + "/idx"
    IndexBuilder(spark, CFG).build(spark.createDataFrame(new), ref_path)
    want = _ranking(spark, ref_path)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score) == pytest.approx(list(want.score), abs=0)


def test_update_missing_doc_404_and_doc_as_upsert(spark, idx):
    pdf, path = idx
    b = IndexBuilder(spark, CFG)
    with pytest.raises(ValueError, match="404"):
        es_update(b, path, 999, {"doc": {"lang": "fr"}})
    res = es_update(
        b, path, 999,
        {"doc": {"text": "alpha newcomer", "lang": "xx"}, "doc_as_upsert": True},
    )
    assert res["result"] == "created" and res["n_new"] == 1
    got = QueryEngine(spark, path).fetch([999]).toPandas()
    assert list(got.lang) == ["xx"]


def test_update_unknown_field_raises(spark, idx):
    _, path = idx
    b = IndexBuilder(spark, CFG)
    with pytest.raises(ValueError, match="schema"):
        es_update(b, path, 1, {"doc": {"nope": 1}})


def test_update_by_query_sets_fields_distributed(spark, idx):
    """Docs matching the query get the script assignment; everyone
    else is untouched; the ranking is bit-equal before/after."""
    pdf, path = idx
    before = _ranking(spark, path)
    b = IndexBuilder(spark, CFG)
    res = es_update_by_query(
        b, QueryEngine(spark, path), path,
        {"query": {"match": {"text": "trip"}},
         "script": {"source": "ctx._source.lang = params.l",
                    "params": {"l": "xx"}}},
    )
    hit = {i for i in range(30) if i % 3 == 0}
    assert res["updated"] == len(hit)
    eng = QueryEngine(spark, path)
    got = eng.fetch(sorted(hit | {1, 2})).toPandas().set_index("doc_id")
    assert set(got.loc[sorted(hit)].lang) == {"xx"}
    assert got.loc[1, "lang"] == "en" and got.loc[2, "lang"] == "en"
    after = _ranking(spark, path)
    assert list(before.doc_id) == list(after.doc_id)
    assert list(before.score) == pytest.approx(list(after.score), abs=0)


def test_update_by_query_rejects_bad_script_fields(spark, idx):
    _, path = idx
    b = IndexBuilder(spark, CFG)
    with pytest.raises(ValueError, match="schema"):
        es_update_by_query(
            b, QueryEngine(spark, path), path,
            {"query": {"match": {"text": "trip"}},
             "script": "ctx._source.nope = 1"},
        )


def test_script_assignment_parser():
    assert _script_assignments("ctx._source.lang = 'en'") == {"lang": "en"}
    assert _script_assignments(
        {"source": "ctx._source.a = 1; ctx._source.b = params.p",
         "params": {"p": [1, 2]}}
    ) == {"a": 1, "b": [1, 2]}
    with pytest.raises(ValueError, match="statement"):
        _script_assignments("ctx._source.a += 1")
    with pytest.raises(ValueError, match="param"):
        _script_assignments("ctx._source.a = params.q")
    with pytest.raises(ValueError, match="literal"):
        _script_assignments("ctx._source.a = foo()")
    with pytest.raises(ValueError, match="assignments"):
        _script_assignments("   ")
    with pytest.raises(ValueError, match="painless"):
        _script_assignments({"source": "x", "lang": "js"})
