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


def test_cli_upsert_compact_search(spark, tmp_path, capsys):
    import pandas as pd

    v1 = pd.DataFrame(
        {"doc_id": range(8), "text": [f"alpha w{i} words" for i in range(8)]}
    )
    src1 = str(tmp_path / "v1")
    spark.createDataFrame(v1).write.parquet(src1)
    idx = str(tmp_path / "idx")
    assert main(
        ["--cores", "8", "build", "--input-format", "docs",
         "--input", src1, "--output", idx, "--groups", "2"]
    ) == 0
    capsys.readouterr()

    patch = pd.DataFrame({"doc_id": [3, 9], "text": ["omega replacement", "omega nine"]})
    src2 = str(tmp_path / "v2")
    spark.createDataFrame(patch).write.parquet(src2)
    assert main(["upsert", "--input", src2, "--index", idx, "--groups", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["mode"] == "delta" and res["n_changed"] == 1 and res["n_new"] == 1

    assert main(["query", "--index", idx, "--wand", "--wand-ranges", "2", "omega"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {l["doc_id"] for l in lines} == {3, 9}

    out2 = str(tmp_path / "idx2")
    assert main(["compact", "--index", idx, "--output", out2]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["dirs_merged"] == 2 and res["n_docs"] == 9
    assert main(["query", "--index", out2, "omega"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {l["doc_id"] for l in lines} == {3, 9}


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


def test_cli_search_dsl(spark, tmp_path, capsys):
    idx = str(tmp_path / "dslidx")
    rc = main(
        [
            "--cores", "8", "build", "--input-format", "docs",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", idx, "--groups", "1",
            "--stored-fields", "lang,n_chars",
        ]
    )
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "search", "--index", idx, "--body",
        json.dumps({"query": {"bool": {
            "must": {"match": {"text": "hash"}},
            "filter": [{"term": {"lang": "en"}}]}}, "size": 3}),
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3 and lines[0]["rank"] == 1
    assert all(ln["score"] > 0 for ln in lines)


def test_cli_search_count(spark, tmp_path, capsys):
    import pandas as pd

    docs = pd.DataFrame(
        {"doc_id": range(6), "text": [f"alpha w{i}" for i in range(6)]}
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(docs).write.parquet(src)
    idx = str(tmp_path / "idx")
    assert main(
        ["--cores", "8", "build", "--input-format", "docs",
         "--input", src, "--output", idx, "--groups", "1"]
    ) == 0
    capsys.readouterr()
    assert main(
        ["search", "--index", idx, "--count",
         "--body", '{"query": {"match": {"text": "alpha"}}}']
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total"] == 6
    # ES URI search: --q is a Lucene query_string over the default field
    assert main(["search", "--index", idx, "--q", "alpha AND w3",
                 "--size", "2"]) == 0
    lines = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert [ln["doc_id"] for ln in lines] == [3]
    # _validate/query: compile without running; bad bodies report invalid
    assert main(["search", "--index", idx, "--validate", "--body",
                 '{"query": {"query_string": {"query": "alpha AND w3"}}}'
                 ]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["valid"] is True and "alpha" in v["explanation"]
    assert main(["search", "--index", idx, "--validate", "--body",
                 '{"query": {"query_string": {"query": "NOT alpha"}}}'
                 ]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["valid"] is False and "complement" in v["explanation"]


def test_cli_termvectors(spark, tmp_path, capsys):
    import pandas as pd

    docs = pd.DataFrame(
        {"doc_id": range(4), "text": [f"red red blue w{i}" for i in range(4)]}
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(docs).write.parquet(src)
    idx = str(tmp_path / "idx")
    assert main(
        ["--cores", "8", "build", "--input-format", "docs",
         "--input", src, "--output", idx, "--groups", "1",
         "--store-source"]
    ) == 0
    capsys.readouterr()
    assert main(["termvectors", "--index", idx, "--id", "2",
                 "--term-statistics"]) == 0
    rows = {r["term"]: r for r in (
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines())}
    assert rows["red"]["term_freq"] == 2 and rows["red"]["positions"] == [0, 1]
    assert rows["red"]["doc_freq"] == 4 and rows["w2"]["doc_freq"] == 1
