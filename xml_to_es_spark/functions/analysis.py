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


def doc_len_col(tokens: Column | str) -> Column:
    """token count as long (cast so Spark's int matches DuckDB bigint)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(c).cast("long")


# DuckDB-SQL fragment equivalents, used to assemble oracle_sql() strings.
SQL_TOKENS = "regexp_extract_all(lower({col}), '[a-z0-9]+')"
SQL_DOC_LEN = "len(regexp_extract_all(lower({col}), '[a-z0-9]+'))"
