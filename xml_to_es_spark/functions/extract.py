"""Arrow-batched extraction UDFs: pages → field documents.

The Spark half of the byte-identity contract: these UDFs call the
*same* pure-Python kernel (``extract_core``) as the pyref oracle, one
value at a time **inside** an Arrow batch (batch-granularity
vectorization per BASELINE.json input_hint — JVM↔Python transfer is
columnar Arrow; no per-row Python UDFs).

Reference lifecycle being re-expressed: processFiles → split →
repair → parse → modifyJson (xml-to-es.js:452-639, 234-286), fused
into one vectorized projection over the pre-split pages table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xml_to_es_spark.functions import extract_core as ec

FIELD_DOC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {"url": [], "warc_ts": [], "lang": [], "id": [], "title": [], "text": [], "meta": []}
    htmls = pdf["html"].to_numpy()
    for i in range(len(pdf)):
        raw = htmls[i]
        s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else (raw or "")
        fields = ec.html_to_fields(s)
        body = fields.pop("body", "")
        title = fields.pop("title", None)
        doc_id = fields.pop("id", None)
        out["url"].append(pdf["url"].iat[i])
        out["warc_ts"].append(pdf["warc_ts"].iat[i] if "warc_ts" in pdf else None)
        out["lang"].append(pdf["lang"].iat[i] if "lang" in pdf else None)
        out["id"].append(doc_id)
        out["title"].append(title)
        out["text"].append(body)
        out["meta"].append(fields)
    return pd.DataFrame(out)


def extract_fields(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html binary, text, lang) → field documents.

    The engine always re-extracts from html (input_hint: when ``text``
    is non-null the engine re-extracts and must byte-match anyway).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in pages.columns]
    return pages.select(*cols).mapInPandas(run, schema=FIELD_DOC_SCHEMA)


REUTERS_DOC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), True),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("dateline", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("date_raw", T.StringType(), True),
        T.StructField("places", T.ArrayType(T.StringType()), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def extract_reuters(sgml_df: DataFrame) -> DataFrame:
    """sgml_docs(file, content) → one row per mapped document.

    The reference convert pipeline (§3.1) as a flatMap-style
    mapInPandas: split/repair/parse/field-map each multi-doc SGML
    string. ``missingID-<n>`` counters are deterministic per input
    file (counter restarts at 0 per file — order-independent across
    a distributed run, unlike the reference's global mutable counter
    at xml-to-es.js:35, which is order-dependent by construction).
    Adds a ``date`` timestamp parsed with the mapping's pinned format
    (examples/mapping.json:10, malformed → null).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                docs, _ = ec.extract_reuters_docs(r["content"])
                for j, d in enumerate(docs):
                    places = d.get("places")
                    if isinstance(places, str):
                        places = [places]
                    rows.append(
                        {
                            "file": r["file"],
                            "seq": j,
                            "id": str(d.get("id")),
                            "title": _as_text(d.get("title")),
                            "dateline": _as_text(d.get("dateline")),
                            "body": _as_text(d.get("body")),
                            "date_raw": _as_text(d.get("date")),
                            "places": places,
                            "attrs": {
                                k: str(v) for k, v in (d.get("@") or {}).items()
                            },
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in REUTERS_DOC_SCHEMA.fields]
            )

    out = sgml_df.mapInPandas(run, schema=REUTERS_DOC_SCHEMA)
    return out.withColumn(
        "date", F.to_timestamp("date_raw", "dd-MMM-yyyy HH:mm:ss.SS")
    )


def _as_text(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, dict):
        return v.get("#")
    return str(v)
