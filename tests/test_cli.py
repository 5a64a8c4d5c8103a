"""CLI surface: build → query → verify → convert through main()."""

import json

from xml_to_es_spark import fixtures
from xml_to_es_spark.cli import main


def test_cli_build_query_verify(spark, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    rc = main(
        [
            "--cores", "8", "build", "--input-format", "docs",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", idx, "--groups", "2",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 500 and out["groups_built"] == 2

    rc = main(["--cores", "8", "query", "--index", idx, "-k", "3", "hash join"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3 and lines[0]["rank"] == 1
    assert lines[0]["score"] >= lines[1]["score"] >= lines[2]["score"]

    rc = main(["query", "--index", idx, "--distributed", "zzz_absent"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""

    rc = main(["verify", "--index", idx])
    assert rc == 0
    v = json.loads(capsys.readouterr().out.strip())
    assert v["n_docs"] == "500" and v["groups_done"] == 2


def test_cli_convert(spark, tmp_path, capsys):
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "a.sgm").write_text(fixtures.sgml_single_doc())
    (src / "b.sgm").write_text(fixtures.sgml_good_file())
    out = str(tmp_path / "out")
    rc = main(
        ["convert", "--input", f"{src}/*", "--ext", ".sgm",
         "--fmt", "json", "--output", out, "--n-files", "1"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs"] == 7
    assert spark.read.json(out).count() == 7
