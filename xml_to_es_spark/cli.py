"""Command-line entry points, launched locally or via
``spark-submit --py-files xml_to_es_spark.zip -m`` (north_rule launch
mode). Mirrors the reference's two executables plus the query surface
it delegates to ES:

    convert.js  → python -m xml_to_es_spark.cli convert ...
    indexFiles.js → python -m xml_to_es_spark.cli build ...
    ES match query → python -m xml_to_es_spark.cli query ...
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from xml_to_es_spark.session import get_spark

    return get_spark(app=f"xml_to_es_spark.{args.cmd}", cores=args.cores)


def cmd_build(args) -> int:
    from pyspark.sql import functions as F

    from xml_to_es_spark.config import IndexConfig
    from xml_to_es_spark.functions.extract import extract_fields
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.sources.pages import read_pages

    spark = _spark(args)
    fields = tuple(args.fields.split(","))
    cfg = IndexConfig(
        n_groups=args.groups,
        salt_threshold=args.salt_threshold,
        n_salts=args.salts,
        store_source=args.store_source,
        store_positions=args.store_positions,
        indexed_fields=fields,
        stored_fields=tuple(f for f in args.stored_fields.split(",") if f),
    )
    if args.input_format == "pages":
        pages = read_pages(spark, args.input, langs=tuple(args.langs.split(",")))
        # full 64-bit hash space (no abs(): halving the space doubles
        # collision odds at 10^12 docs, and abs(Long.MIN_VALUE) is
        # broken under ANSI); the codec round-trips negative ids
        docs = extract_fields(pages).select(
            F.xxhash64("url").alias("doc_id"),
            "text",
            *[f for f in fields if f != "text"],
            "url",
            *[f for f in cfg.stored_fields if f not in ("text", "url", *fields)],
        )
        # cheap collision gate before committing a build: a hash
        # collision would silently merge two urls into one doc
        chk = docs.agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("n_ids"),
        ).first()
        if chk["n"] != chk["n_ids"]:
            print(
                json.dumps(
                    {
                        "error": "doc_id_collision",
                        "n_rows": chk["n"],
                        "n_distinct_ids": chk["n_ids"],
                        "hint": "use operators.doc_ids.assign_doc_ids for collision-free ids",
                    }
                ),
                file=sys.stderr,
            )
            return 2
    else:  # docs: (doc_id, text[, url]) parquet
        docs = spark.read.parquet(args.input)
    res = IndexBuilder(spark, cfg).build(docs, args.output, resume=args.resume)
    print(json.dumps(res))
    return 0


def cmd_query(args) -> int:
    from xml_to_es_spark.operators.query_engine import QueryEngine

    spark = _spark(args)
    eng = QueryEngine(spark, args.index)
    queries = [(i + 1, q) for i, q in enumerate(args.query)]
    mfields = args.multi_match.split(",") if args.multi_match else None
    if args.aggs:
        out = eng.search_aggs(queries, group_by=args.aggs, field=args.field)
        for r in out.orderBy("query_id", args.aggs).collect():
            print(json.dumps({k: r[k] for k in out.columns}))
        return 0
    if args.fetch:
        out = eng.search(
            queries, k=args.k,
            n_ranges=args.wand_ranges if args.wand else None,
            phrase=args.phrase, fuzziness=args.fuzziness,
            field=args.field, fields=mfields, match_type=args.match_type,
            from_=args.from_,
        )
        cols = out.columns
        for r in out.orderBy("query_id", "rank").collect():
            print(json.dumps({k: r[k] for k in cols}))
        return 0
    if mfields:
        out = eng.multi_match(
            queries, k=args.k, fields=mfields, match_type=args.match_type,
            n_ranges=args.wand_ranges if args.wand else None, from_=args.from_,
        )
    elif args.phrase:
        out = eng.phrase_topk(
            queries, k=args.k, n_ranges=args.wand_ranges if args.wand else None,
            field=args.field, from_=args.from_,
        )
    elif args.wand:
        out = eng.topk_wand(
            queries, k=args.k, n_ranges=args.wand_ranges,
            fuzziness=args.fuzziness, field=args.field, from_=args.from_,
        )
    elif args.distributed:
        out = eng.topk_distributed(queries, k=args.k, field=args.field, from_=args.from_)
    else:
        out = eng.topk(
            queries, k=args.k, fuzziness=args.fuzziness,
            field=args.field, from_=args.from_,
        )
    for r in out.orderBy("query_id", "rank").collect():
        print(json.dumps({k: r[k] for k in ("query_id", "rank", "doc_id", "score")}))
    return 0


def cmd_upsert(args) -> int:
    """Re-crawl ingestion: PUT-by-id semantics over an existing index
    (changed/new docs → delta + tombstones; unchanged skipped)."""
    from xml_to_es_spark.config import IndexConfig
    from xml_to_es_spark.operators.index_build import IndexBuilder

    spark = _spark(args)
    # analysis/storage knobs (fields, positions, source) are inherited
    # from the existing index's stored mapping — flags here only shape
    # the INITIAL build when the index does not exist yet
    cfg = IndexConfig(
        n_groups=args.groups,
        store_source=args.store_source,
        store_positions=args.store_positions,
        indexed_fields=tuple(args.fields.split(",")),
        stored_fields=tuple(f for f in args.stored_fields.split(",") if f),
    )
    docs = spark.read.parquet(args.input)
    res = IndexBuilder(spark, cfg).upsert(docs, args.index)
    print(json.dumps({k: v for k, v in res.items() if k != "delta_build"}))
    return 0


def cmd_delete(args) -> int:
    """ES DELETE surface: ``--ids`` removes documents by id (append-
    only kill log, no segment rewrite); ``--drop-index`` removes the
    whole index tree (the reference's deleteIndex,
    ElasticIndexer.js:133)."""
    from xml_to_es_spark.operators.index_build import IndexBuilder

    spark = _spark(args)
    b = IndexBuilder(spark)
    if args.drop_index:
        res = b.delete_index(args.index)
    elif args.ids:
        ids = [int(x) for x in args.ids.split(",")]
        res = b.delete_docs(ids, args.index)
    else:
        raise SystemExit("delete: pass --ids or --drop-index")
    print(json.dumps(res))
    return 0


def cmd_compact(args) -> int:
    """LSM compaction: base + deltas + tombstones → one fresh index.
    The stored mapping (fields, positional sidecar, stored source) is
    inherited from the input index."""
    from xml_to_es_spark.operators.index_build import IndexBuilder

    spark = _spark(args)
    res = IndexBuilder(spark).compact(args.index, args.output)
    print(json.dumps(res))
    return 0


def cmd_convert(args) -> int:
    """Reference convert pipeline: files of 1..N SGML/HTML docs →
    mapped field documents → json/html/text sink."""
    from xml_to_es_spark.functions.extract import extract_reuters
    from xml_to_es_spark.sources import sinks
    from xml_to_es_spark.sources.pages import read_raw_files

    spark = _spark(args)
    raw = read_raw_files(spark, args.input, suffix=args.ext)
    docs = extract_reuters(raw)
    sinks.write(docs.drop("date_raw"), args.fmt, args.output, n_files=args.n_files)
    print(json.dumps({"docs": docs.count(), "output": args.output, "fmt": args.fmt}))
    return 0


def cmd_verify(args) -> int:
    """Reference getDocumentCount parity: recount the index tables."""
    spark = _spark(args)
    stats = spark.read.parquet(f"{args.index}/stats").first().asDict()
    man = spark.read.parquet(f"{args.index}/_manifest")
    done = man.filter("stage = 'postings' and status = 'done'").count()
    print(json.dumps({**{k: str(v) for k, v in stats.items()}, "groups_done": done}))
    return 0


def cmd_bulk(args) -> int:
    """ES _bulk NDJSON (index/create/delete actions) applied to an
    existing index — one upsert + one delete batch, mapping inherited
    from the index."""
    from xml_to_es_spark.operators.es_query import es_bulk
    from xml_to_es_spark.operators.index_build import IndexBuilder

    spark = _spark(args)
    with open(args.file) as f:
        nd = f.read()
    print(json.dumps(es_bulk(IndexBuilder(spark), args.index, nd)))
    return 0


def cmd_search(args) -> int:
    """Run one ES-style JSON search body (the es_query DSL) against an
    index — the spark-submit face of the reference's ES query
    surface."""
    from xml_to_es_spark.operators.es_query import es_count, es_search
    from xml_to_es_spark.operators.query_engine import QueryEngine

    spark = _spark(args)
    if args.q is not None:
        # ES URI search: GET /index/_search?q=... is a query_string
        # query over the default field
        if args.body or args.body_file:
            raise SystemExit("--q and --body/--body-file are exclusive")
        body = {"query": {"query_string": {"query": args.q}},
                "size": args.size}
    elif args.body_file:
        with open(args.body_file) as f:
            body = json.load(f)
    else:
        body = json.loads(args.body)
    eng = QueryEngine(spark, args.index)
    if args.validate:
        from xml_to_es_spark.operators.es_query import es_validate_query

        print(json.dumps(es_validate_query(eng, body)))
        return 0
    run = es_count if args.count else es_search
    for row in run(eng, body).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_stats(args) -> int:
    """ES GET /index/_stats: live/killed counts, per-dir postings
    bytes and term counts, the stored mapping — metadata only."""
    from xml_to_es_spark.operators.es_query import index_stats

    print(json.dumps(index_stats(_spark(args), args.index), default=str))
    return 0


def cmd_delete_by_query(args) -> int:
    """ES _delete_by_query: kill every doc matching a JSON query
    body; the match set never visits the driver."""
    from xml_to_es_spark.operators.es_query import es_delete_by_query
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.operators.query_engine import QueryEngine

    spark = _spark(args)
    body = json.loads(args.body)
    print(json.dumps(es_delete_by_query(
        IndexBuilder(spark), QueryEngine(spark, args.index),
        args.index, body,
    )))
    return 0


def cmd_update_by_query(args) -> int:
    """ES _update_by_query with a set-field script."""
    from xml_to_es_spark.operators.es_query import es_update_by_query
    from xml_to_es_spark.operators.index_build import IndexBuilder
    from xml_to_es_spark.operators.query_engine import QueryEngine

    spark = _spark(args)
    body = json.loads(args.body)
    res = es_update_by_query(
        IndexBuilder(spark), QueryEngine(spark, args.index),
        args.index, body,
    )
    print(json.dumps({k: v for k, v in res.items() if k != "delta_build"}))
    return 0


def cmd_reindex(args) -> int:
    """ES _reindex: src index → fresh dest under the stored mapping,
    optionally bounded by --query."""
    from xml_to_es_spark.operators.es_query import es_reindex
    from xml_to_es_spark.operators.index_build import IndexBuilder

    spark = _spark(args)
    q = json.loads(args.query) if args.query else None
    print(json.dumps(es_reindex(IndexBuilder(spark), args.src, args.dest, q)))
    return 0


def cmd_analyze(args) -> int:
    """ES _analyze: the pinned analysis chain's token stream."""
    from xml_to_es_spark.operators.es_query import es_analyze

    print(json.dumps(es_analyze({"text": args.text})))
    return 0


def cmd_termvectors(args) -> int:
    """ES GET /index/_termvectors/<id>: one doc's term vectors."""
    from xml_to_es_spark.operators.es_query import es_termvectors
    from xml_to_es_spark.operators.query_engine import QueryEngine

    spark = _spark(args)
    body: dict = {}
    if args.fields:
        body["fields"] = args.fields.split(",")
    if args.term_statistics:
        body["term_statistics"] = True
    eng = QueryEngine(spark, args.index)
    for row in es_termvectors(eng, args.id, body).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="xml_to_es_spark")
    p.add_argument("--cores", default="32")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--input-format", choices=["pages", "docs"], default="pages")
    b.add_argument("--output", required=True)
    b.add_argument("--langs", default="en")
    b.add_argument("--groups", type=int, default=8)
    b.add_argument("--salt-threshold", type=int, default=100_000)
    b.add_argument("--salts", type=int, default=16)
    b.add_argument("--store-source", action="store_true",
                   help="keep text in the docs table (ES _source; query --fetch)")
    b.add_argument("--store-positions", action="store_true",
                   help="positional sidecar (enables query --phrase)")
    b.add_argument("--fields", default="text",
                   help="comma-separated analyzed fields, e.g. text,title "
                        "(ES mapping with several analyzed fields)")
    b.add_argument("--stored-fields", default="",
                   help="comma-separated non-analyzed doc-value columns kept "
                        "in the docs table (query --aggs / search_aggs)")
    b.add_argument("--resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k")
    q.add_argument("--index", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--distributed", action="store_true")
    q.add_argument("--wand", action="store_true", help="block-max WAND")
    q.add_argument(
        "--wand-ranges", type=int, default=32,
        help="doc-range parallelism per query (WAND scale path)",
    )
    q.add_argument("--fetch", action="store_true", help="return stored documents (search)")
    q.add_argument("--phrase", action="store_true",
                   help="match_phrase (index needs --store-positions)")
    q.add_argument("--fuzziness", type=int, default=0,
                   help="dictionary levenshtein expansion distance")
    q.add_argument("--field", default=None,
                   help="score one analyzed field (ES match: {field: ...})")
    q.add_argument("--multi-match", default=None,
                   help="comma-separated fields for ES multi_match")
    q.add_argument("--match-type", choices=["best_fields", "most_fields"],
                   default="best_fields")
    q.add_argument("--from", dest="from_", type=int, default=0,
                   help="ES pagination offset (rows from+1..from+k)")
    q.add_argument("--aggs", default=None, metavar="FIELD",
                   help="terms aggregation over a stored doc-value field "
                        "(full match set, not top-k)")
    q.add_argument("query", nargs="+")
    q.set_defaults(fn=cmd_query)

    u = sub.add_parser("upsert", help="PUT-by-id re-crawl into an existing index")
    u.add_argument("--input", required=True, help="(doc_id, text[, url]) parquet")
    u.add_argument("--index", required=True)
    u.add_argument("--groups", type=int, default=8)
    u.add_argument("--store-source", action="store_true",
                   help="initial build only — an existing index's mapping is inherited")
    u.add_argument("--store-positions", action="store_true",
                   help="initial build only — an existing index's mapping is inherited")
    u.add_argument("--fields", default="text",
                   help="initial build only — an existing index's mapping is inherited")
    u.add_argument("--stored-fields", default="",
                   help="initial build only — an existing index's mapping is inherited")
    u.set_defaults(fn=cmd_upsert)

    dl = sub.add_parser("delete", help="delete docs by id, or the whole index")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", default=None, help="comma-separated doc ids")
    dl.add_argument("--drop-index", action="store_true",
                    help="remove the entire index tree (ES DELETE /index)")
    dl.set_defaults(fn=cmd_delete)

    k = sub.add_parser("compact", help="merge base+deltas+tombstones into a fresh index"
                                       " (mapping inherited from the input index)")
    k.add_argument("--index", required=True)
    k.add_argument("--output", required=True)
    k.set_defaults(fn=cmd_compact)

    c = sub.add_parser("convert", help="SGML/HTML files → mapped docs")
    c.add_argument("--input", required=True)
    c.add_argument("--ext", default=None)
    c.add_argument("--fmt", choices=["json", "html", "text"], default="json")
    c.add_argument("--output", required=True)
    c.add_argument("--n-files", type=int, default=None)
    c.set_defaults(fn=cmd_convert)

    d = sub.add_parser(
        "search", help="run an ES-style JSON search body (es_query DSL)"
    )
    d.add_argument("--index", required=True)
    d.add_argument("--body", default=None, help="inline JSON body")
    d.add_argument("--body-file", default=None, help="path to a JSON body file")
    d.add_argument("--q", default=None,
                   help="ES URI search (?q=...): a Lucene query_string "
                        "over the default field, instead of --body")
    d.add_argument("--size", type=int, default=10,
                   help="page size for --q (URI-search default 10)")
    d.add_argument("--count", action="store_true",
                   help="ES _count: print the match-set total instead of hits")
    d.add_argument("--validate", action="store_true",
                   help="ES _validate/query: parse+compile the body "
                        "without running it; print valid + explanation")
    d.set_defaults(fn=cmd_search)

    bk = sub.add_parser("bulk", help="apply an ES _bulk NDJSON action file")
    bk.add_argument("--index", required=True)
    bk.add_argument("--file", required=True, help="NDJSON action/source lines")
    bk.set_defaults(fn=cmd_bulk)

    v = sub.add_parser("verify", help="recount index tables")
    v.add_argument("--index", required=True)
    v.set_defaults(fn=cmd_verify)

    st = sub.add_parser("stats", help="ES GET /index/_stats")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    dbq = sub.add_parser("delete-by-query", help="ES _delete_by_query")
    dbq.add_argument("--index", required=True)
    dbq.add_argument("--body", required=True, help='{"query": {...}}')
    dbq.set_defaults(fn=cmd_delete_by_query)

    ubq = sub.add_parser("update-by-query", help="ES _update_by_query")
    ubq.add_argument("--index", required=True)
    ubq.add_argument("--body", required=True,
                     help='{"query": {...}, "script": {...}}')
    ubq.set_defaults(fn=cmd_update_by_query)

    rx = sub.add_parser("reindex", help="ES _reindex (src → fresh dest)")
    rx.add_argument("--src", required=True)
    rx.add_argument("--dest", required=True)
    rx.add_argument("--query", default=None,
                    help="optional bool-expressible query JSON")
    rx.set_defaults(fn=cmd_reindex)

    an = sub.add_parser("analyze", help="ES _analyze token stream")
    an.add_argument("--text", required=True)
    an.set_defaults(fn=cmd_analyze)

    tv = sub.add_parser("termvectors",
                        help="ES _termvectors/<id> (tf/positions/df)")
    tv.add_argument("--index", required=True)
    tv.add_argument("--id", type=int, required=True)
    tv.add_argument("--fields", default=None,
                    help="comma-separated field names (default: all)")
    tv.add_argument("--term-statistics", action="store_true")
    tv.set_defaults(fn=cmd_termvectors)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
