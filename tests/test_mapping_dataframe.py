"""DataFrame-level field-mapping algebra (functions.mapping) — the
Catalyst-native twin of the in-kernel modify_json, same fixed order."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from xml_to_es_spark.functions import mapping as M


@pytest.fixture(scope="module")
def nested(spark):
    rows = [
        Row(
            ATTRS=Row(NEWID="7", TOPICS="NO"),
            TEXT=Row(TITLE="T7", BODY="B7", NOISE="x"),
            PLACES=[Row(**{"#": "usa"}), Row(**{"#": "uk"})],
            JUNK="drop me",
        ),
        Row(
            ATTRS=Row(NEWID=None, TOPICS="YES"),
            TEXT=Row(TITLE="T8", BODY="B8", NOISE="y"),
            PLACES=[Row(**{"#": "france"})],
            JUNK="drop me too",
        ),
    ]
    return spark.createDataFrame(rows)


def test_full_algebra(spark, nested):
    out = M.apply_mapping(
        nested,
        promote_spec={
            "attrs": [{"key": "newid", "target": "id"}],
            "text": ["title", "body"],
        },
        delete_spec={".": ["junk"], "text": ["noise"]},
        flatten_cols=["places"],
        rename_spec={"places": "locations"},
        id_key="title",
    )
    rows = {r["title"]: r for r in out.collect()}
    assert rows["T7"]["id"] == "7"
    assert rows["T7"]["locations"] == ["usa", "uk"]
    assert rows["T7"]["body"] == "B7"
    assert "junk" not in out.columns and "text" not in out.columns
    # missing id → deterministic missingID-hash, not an order-dependent counter
    assert rows["T8"]["id"].startswith("missingID-")
    again = M.apply_mapping(
        nested.orderBy(F.desc("JUNK")),  # different order, same ids
        promote_spec={"attrs": [{"key": "newid", "target": "id"}], "text": ["title", "body"]},
        delete_spec={".": ["junk"], "text": ["noise"]},
        flatten_cols=["places"],
        rename_spec={"places": "locations"},
        id_key="title",
    )
    rows2 = {r["title"]: r for r in again.collect()}
    assert rows2["T8"]["id"] == rows["T8"]["id"]


def test_promote_clobbers_last_writer(spark):
    df = spark.createDataFrame([Row(s=Row(a="inner"), a="outer")])
    out = M.promote(df, {"s": ["a"]})
    assert out.select("a").first()["a"] == "inner"  # clobbered
    assert "s" not in out.columns  # emptied parent dropped


def test_lowercase_recurses_into_structs(spark, nested):
    out = M.lowercase_columns(nested)
    assert set(out.columns) == {"attrs", "text", "places", "junk"}
    assert [f.name for f in out.schema["text"].dataType.fields] == [
        "title", "body", "noise",
    ]


def test_mapping_is_pure_projection(spark, nested):
    """The whole algebra must stay a projection — no shuffle."""
    out = M.apply_mapping(nested, promote_spec={"text": ["title"]})
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan
