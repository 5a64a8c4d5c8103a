"""The reference's convert pipeline end-to-end on Spark: raw multi-doc
SGML files on disk → binaryFile source → distributed split/repair/
parse/field-map → JSON sink. Mirrors the reference's directory tests
(FileSpecPage.js:125-165: 3 files → 13 docs)."""

import pandas as pd
from pyspark.sql import functions as F

from xml_to_es_spark import fixtures
from xml_to_es_spark.functions.extract import extract_reuters
from xml_to_es_spark.operators.doc_ids import assign_doc_ids
from xml_to_es_spark.sources import sinks
from xml_to_es_spark.sources.pages import read_raw_files


def test_convert_directory(spark, tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    (d / "single.sgm").write_text(fixtures.sgml_single_doc())
    (d / "good.sgm").write_text(fixtures.sgml_good_file())
    (d / "sub" / "bad.sgm").write_text(fixtures.sgml_bad_file())
    (d / "ignore.txt").write_text("not sgml")

    raw = read_raw_files(spark, f"{d}/**", suffix=".sgm")
    assert raw.count() == 3  # ext predicate pushed via pathGlobFilter
    docs = extract_reuters(raw)
    rows = docs.collect()
    assert len(rows) == 13  # 1 + 6 + 6, the reference's directory golden
    ids = {r["id"] for r in rows}
    assert "10003" in ids
    d10003 = next(r for r in rows if r["id"] == "10003")
    assert "BIOGEN" in d10003["title"] and "Biogen" in d10003["body"]
    assert d10003["date"] is not None  # dd-MMM-yyyy HH:mm:ss.SS parsed
    assert d10003["places"] == ["usa", "uk", "switzerland"]
    # brief variant has no body; anomaly file produced a missingID doc
    assert any(i.startswith("missingID-") for i in ids)

    out = str(tmp_path / "out_json")
    sinks.write(docs.drop("date_raw"), "json", out, n_files=1)
    back = spark.read.json(out)
    assert back.count() == 13


def test_convert_gz_and_zip(spark, tmp_path):
    """Compressed convert inputs (reference corpus goodTagsTest.sgm.gz
    and .sgm.zip, FileSpecPage.js:113-119): each must yield the same
    6 docs as the plain file; a multi-entry zip is rejected/skipped
    (xml-to-es.js:410-416)."""
    import gzip
    import zipfile

    content = fixtures.sgml_good_file()
    d = tmp_path / "comp"
    d.mkdir()
    (d / "good.sgm").write_text(content)
    (d / "good.sgm.gz").write_bytes(gzip.compress(content.encode("utf-8")))
    with zipfile.ZipFile(d / "good.sgm.zip", "w") as zf:
        zf.writestr("good.sgm", content)
    with zipfile.ZipFile(d / "multi.sgm.zip", "w") as zf:
        zf.writestr("a.sgm", content)
        zf.writestr("b.sgm", content)

    plain = extract_reuters(read_raw_files(spark, str(d / "good.sgm"))).collect()
    gz = extract_reuters(read_raw_files(spark, str(d / "good.sgm.gz"))).collect()
    zp = extract_reuters(read_raw_files(spark, str(d / "good.sgm.zip"))).collect()
    assert len(plain) == 6
    key = lambda r: r["id"]  # noqa: E731
    for variant in (gz, zp):
        assert sorted((r["id"], r["title"], r["body"]) for r in variant) == sorted(
            (r["id"], r["title"], r["body"]) for r in plain
        )
    # multi-entry zip: file skipped, no rows, no crash
    multi = read_raw_files(spark, str(d / "multi.sgm.zip"))
    assert multi.count() == 0


def test_assign_doc_ids_deterministic(spark):
    pdf = pd.DataFrame({"url": [f"u{i:03d}" for i in [5, 2, 9, 0, 7, 3, 1]]})
    df = spark.createDataFrame(pdf)
    a = {r["url"]: r["doc_id"] for r in assign_doc_ids(df).collect()}
    # rank in sorted order, 0-based
    expect = {u: i for i, u in enumerate(sorted(pdf["url"]))}
    assert a == expect
    # stable under different initial partitioning
    b = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(df.repartition(7).sortWithinPartitions(F.desc("url"))).collect()
    }
    assert b == expect
