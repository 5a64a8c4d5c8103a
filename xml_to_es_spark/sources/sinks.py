"""Output generators — the reference's pluggable sink surface
(Generation.js:64-110, Generators.js) re-expressed as DataFrame
writers.

| Reference sink | Here |
|---|---|
| JSON generator (1 line/doc, Generators.js:70-73) | write_json / to_json_lines |
| Aggregate file sink with lead/sep/trail framing (Generation.js:79-110) | write_json with coalesce(n) — framing chars emulated a JSON array; Spark writes real JSON lines |
| HTML generator (<META> per field, Generators.js:15-68) | html_col projection + write.text |
| Text-only generator (title\\n + re-paragraphed body, Generators.js:75-87) | text_only_col + write.text |
| Custom generator setGenerator(type, fn) (Generators.js:98-100) | register_generator / write(df, fmt) |
| 1-doc-per-file (Generation.js:21-25) | anti-pattern at scale — partitionBy(id prefix) instead |
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GENERATORS: dict[str, Callable[[DataFrame, str], None]] = {}


def register_generator(fmt: str, fn: Callable[[DataFrame, str], None]) -> None:
    """Reference extension point setGenerator(type, fn)
    (Generators.js:98-100): plug a custom sink under a format name."""
    _GENERATORS[fmt] = fn


def write(df: DataFrame, fmt: str, path: str, **kw) -> None:
    """Route to a built-in or registered sink (Generation.js:45-62
    routing contract: the generator chosen by output.fmt)."""
    if fmt in _GENERATORS:
        return _GENERATORS[fmt](df, path)
    if fmt == "json":
        return write_json(df, path, **kw)
    if fmt == "text":
        return df.select(text_only_col().alias("value")).write.mode(
            kw.get("mode", "overwrite")
        ).text(path)
    if fmt == "html":
        return df.select(html_col(df.columns).alias("value")).write.mode(
            kw.get("mode", "overwrite")
        ).text(path)
    return df.write.format(fmt).mode(kw.get("mode", "overwrite")).save(path)


def write_json(df: DataFrame, path: str, n_files: int | None = None, mode: str = "overwrite") -> None:
    """JSON-lines sink. ``n_files`` ≙ the reference's aggregate-N
    rotation (Generation.js:79-110) — but chosen for file-size, not
    doc-count, at scale."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode(mode).json(path)


def to_json_lines(df: DataFrame) -> DataFrame:
    """One single-line JSON string per doc (Generators.js:70-73)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))


_NEWLINES = r"[\n\f\r]"


def html_col(fields: list[str], body_key: str = "body", title_key: str = "title") -> Column:
    """Doc → HTML string: <META name content> per field (arrays
    comma-joined, newlines → space — Generators.js:37,52,58), bodyKey
    into <body> (Generators.js:15-68)."""
    metas = []
    for f_ in fields:
        if f_ in (body_key,):
            continue
        val = F.regexp_replace(
            F.when(
                F.col(f_).cast("string").isNotNull(), F.col(f_).cast("string")
            ).otherwise(F.lit("")),
            _NEWLINES,
            " ",
        )
        metas.append(
            F.concat(F.lit(f'<META name="{f_}" content="'), val, F.lit('">\n'))
        )
    head = F.concat(
        F.lit("<HTML>\n<head>"),
        F.concat(F.lit("<title>"), F.coalesce(F.col(title_key).cast("string"), F.lit("")), F.lit("</title>\n"))
        if title_key in fields
        else F.lit(""),
        *metas,
        F.lit("</head>\n<body>\n"),
    )
    body = F.coalesce(F.col(body_key).cast("string"), F.lit("")) if body_key in fields else F.lit("")
    return F.concat(head, body, F.lit("\n</body>\n</HTML>"))


def text_only_col(
    title_key: str = "title",
    body_key: str = "body",
    para_regex: str | None = r"[\n\r]+(\t|[ ]{4,8})",
) -> Column:
    """title\\n + body with paragraphs re-split and whitespace
    normalized (Generators.js:75-87; textParaRegex from
    lewis-input-config.js:36)."""
    body = F.coalesce(F.col(body_key).cast("string"), F.lit(""))
    if para_regex:
        body = F.array_join(
            F.transform(
                F.split(body, para_regex),
                lambda p: F.trim(F.regexp_replace(p, r"\s+", " ")),
            ),
            "\n",
        )
    return F.concat(
        F.coalesce(F.col(title_key).cast("string"), F.lit("")), F.lit("\n"), body
    )
