"""Deterministic synthetic fixtures (seed=42) per FIXTURES.md.

- ``pages`` corpus: Common-Crawl-style rows (url, warc_ts, html,
  text, lang) with a Zipf(s=1.07) 10,000-term vocabulary (hot-head
  terms exercise skew salting), lognormal doc lengths, some malformed
  HTML rows (numeric entities, comments, unclosed quotes) exercising
  the repair rules.
- ``queries``: 25 reference queries mixing hot / mid / rare / absent
  terms plus tie-prone pairs (doc_id asc tie-break coverage).
- Reuters-shaped SGML corpus mirroring the reference's test corpus
  *shapes* (test/data/test.sgm, goodTagsTest.sgm, badTagsTest.sgm —
  shapes only, our own text): single doc id 10003 with BIOGEN title,
  6-doc well-formed file, 6-doc anomaly file.

No external data; everything derives from the seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from xml_to_es_spark.functions.extract_core import extract_text

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
LANGS = ["en", "en", "en", "en", "en", "en", "en", "de", "fr", "es"]


def make_vocab(n: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pseudo-words: index → base-26 letters, 'w' prefix
    keeps them regex-token-clean ([a-z0-9]+) and collision-free."""
    words = []
    for i in range(n):
        x, s = i, ""
        while True:
            x, r = divmod(x, 26)
            s = chr(ord("a") + r) + s
            if x == 0:
                break
        words.append("w" + s)
    return words


def zipf_probs(n: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def generate_pages(
    n_docs: int, seed: int = SEED, malformed_frac: float = 0.05
) -> pd.DataFrame:
    """Synthetic pages table: (url, warc_ts, html binary, text, lang)."""
    rng = np.random.RandomState(seed)
    vocab = np.array(make_vocab())
    probs = zipf_probs()
    lens = np.clip(rng.lognormal(mean=5.3, sigma=0.6, size=n_docs), 8, 4000).astype(int)
    title_lens = rng.randint(3, 9, size=n_docs)
    langs = np.array(LANGS)[rng.randint(0, len(LANGS), size=n_docs)]
    malformed = rng.rand(n_docs) < malformed_frac
    text_null = rng.rand(n_docs) < 0.3

    # one big vectorized token draw, then split per doc
    total = int(lens.sum() + title_lens.sum())
    draws = rng.choice(vocab, size=total, p=probs)
    offs = np.cumsum(np.concatenate([[0], lens + title_lens]))

    rows = []
    base_ts = pd.Timestamp("2026-01-01T00:00:00Z")
    for i in range(n_docs):
        toks = draws[offs[i] : offs[i + 1]]
        title = " ".join(toks[: title_lens[i]])
        body_toks = toks[title_lens[i] :]
        # paragraphs of ~40 tokens, newline-joined (reference text gen
        # shape: paragraphs, indentation)
        paras = [
            " ".join(body_toks[j : j + 40]) for j in range(0, len(body_toks), 40)
        ]
        body = "\n    ".join(paras)
        noise = ""
        if malformed[i]:
            # reference anomaly shapes: numeric entities (stripped,
            # xml-to-es.js:166), comments (xml-to-es.js:447), an odd quote
            noise = "&#5;&#22;<!-- crawl noise -->"
            body = body + ' said "analyst'
        html = (
            "<HTML>\n<head><title>{title}</title>\n"
            '<META name="id" content="{i}">\n'
            '<META name="source" content="synthetic">\n'
            "</head>\n<body>{noise}{title}\n{body}\n</body>\n</HTML>"
        ).format(title=title, i=i, body=body, noise=noise)
        if text_null[i]:
            text = None  # 30%: text column absent, engine must extract
        else:
            # 70%: text pre-populated with the canonical extraction —
            # the engine re-extracts from html and must byte-match
            # (BASELINE input_hint), covered by test_extract_parity
            text = extract_text(html)
        rows.append(
            {
                "url": f"https://example-{i:08d}.test/p",
                "warc_ts": base_ts + pd.Timedelta(seconds=int(i)),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": langs[i],
            }
        )
    return pd.DataFrame(rows)


def generate_queries(seed: int = SEED) -> pd.DataFrame:
    """25 queries over the Zipf vocab: hot heads, mids, rares, an
    absent term, and multi-term mixes (FIXTURES.md §3)."""
    rng = np.random.RandomState(seed + 1)
    vocab = make_vocab()
    qs: list[str] = []
    hot = vocab[:10]
    mid = vocab[100:1000]
    rare = vocab[9000:]
    qs += [hot[0], hot[3], " ".join(hot[1:3])]  # hot singletons/pair
    for _ in range(6):
        qs.append(" ".join(rng.choice(mid, size=rng.randint(1, 4), replace=False)))
    for _ in range(5):
        qs.append(" ".join(rng.choice(rare, size=rng.randint(1, 3), replace=False)))
    for _ in range(6):  # hot+rare mixes (MaxScore-relevant shapes)
        qs.append(
            rng.choice(hot) + " " + " ".join(rng.choice(mid, size=2, replace=False))
        )
    qs.append("zzzabsentterm")  # absent
    qs.append(hot[0] + " zzzabsentterm")
    qs.append(" ".join(rng.choice(mid, size=4, replace=False)))
    qs.append(rare[0])  # rare singleton → tf/dl ties likely → doc_id tie-break
    qs.append(hot[2])
    assert len(qs) == 25
    return pd.DataFrame({"query_id": range(1, 26), "query_text": qs})


# ---------------------------------------------------------------------------
# Reuters-shaped SGML corpus (shapes from reference test/data, our text)
# ---------------------------------------------------------------------------

_SGML_DOC_TMPL = """<REUTERS TOPICS="{topics}" LEWISSPLIT="TRAIN" CGISPLIT="TRAINING-SET" OLDID="{oldid}" NEWID="{newid}">
<DATE>{date}</DATE>
<TOPICS></TOPICS>
<PLACES>{places}</PLACES>
<PEOPLE></PEOPLE>
<ORGS></ORGS>
<EXCHANGES></EXCHANGES>
<COMPANIES></COMPANIES>
<UNKNOWN>&#5;&#5;&#5;F
&#22;&#22;&#1;f{oldid}&#31;reute
r f BC-DOC-{newid}</UNKNOWN>
<TEXT>&#2;
<TITLE>{title}</TITLE>
<DATELINE>    TESTVILLE, March 26 - </DATELINE><BODY>{body}
 Reuter
&#3;</BODY></TEXT>
</REUTERS>"""


def _places(names: list[str]) -> str:
    return "".join(f"<D>{n}</D>" for n in names)


def sgml_single_doc() -> str:
    """Single well-formed doc, NEWID=10003, BIOGEN title golden
    (shape of reference test/data/test.sgm; goldens
    test/FileSpecPage.js:78-81)."""
    return _SGML_DOC_TMPL.format(
        topics="NO",
        oldid="15524",
        newid="10003",
        date="26-MAR-1987 12:15:35.31",
        places=_places(["usa", "uk", "switzerland"]),
        title="BIOGEN &lt;BGNF> GETS PATENT FROM EUROPEAN OFFICE",
        body=(
            "Biogen Inc said the European patent agency granted it a"
            " patent covering certain proteins used in a vaccine made"
            " through genetic engineering methods.\n    The firm said the"
            " grant lets it exclude rivals from selling the vaccine in"
            " member countries."
        ),
    )


def sgml_good_file(n: int = 6) -> str:
    """n well-formed docs, numeric ids (shape of goodTagsTest.sgm)."""
    docs = []
    for i in range(n):
        docs.append(
            _SGML_DOC_TMPL.format(
                topics="YES" if i % 2 else "NO",
                oldid=str(15000 + i),
                newid=str(20000 + i),
                date=f"{(i % 27) + 1:02d}-MAR-1987 10:0{i}:00.00",
                places=_places(["usa"] if i % 2 else ["uk", "france"]),
                title=f"SYNTH STORY NUMBER {i} ON WIDGET MARKETS",
                body=(
                    f"Widget maker number {i} reported sales rose this"
                    " quarter on strong demand.\n    Analysts said the"
                    " outlook stays firm."
                ),
            )
        )
    return "\n".join(docs)


def sgml_bad_file() -> str:
    """6 docs with the reference's anomaly shapes (badTagsTest.sgm):
    missing close tag, missing/garbled open tag, unclosed quote,
    numeric entities, a BRIEF variant, missing NEWID → missingID-n."""
    d = []
    # 1: fine
    d.append(
        _SGML_DOC_TMPL.format(
            topics="NO", oldid="1", newid="30001", date="01-APR-1987 09:00:00.00",
            places=_places(["usa"]), title="FIRST FINE DOC",
            body="All good here.",
        )
    )
    # 2: missing closing </REUTERS> (repaired by split at next docstart)
    d.append(
        '<REUTERS TOPICS="NO" LEWISSPLIT="TRAIN" CGISPLIT="TRAINING-SET" OLDID="2" NEWID="30002">\n'
        "<DATE>02-APR-1987 09:00:00.00</DATE>\n<TEXT>\n<TITLE>MISSING CLOSE TAG DOC</TITLE>\n"
        "<BODY>This document forgot to close its top element.\n Reuter\n</BODY></TEXT>\n"
    )
    # 3: garbled open tag (fuzzy-repaired head, REUTRS ~ REUTERS)
    d.append(
        '<REUTRS TOPICS="NO" LEWISSPLIT="TRAIN" CGISPLIT="TRAINING-SET" OLDID="3" NEWID="30003">\n'
        "<DATE>03-APR-1987 09:00:00.00</DATE>\n<TEXT>\n<TITLE>GARBLED OPEN TAG DOC</TITLE>\n"
        "<BODY>The head element name lost a letter.\n Reuter\n</BODY></TEXT>\n</REUTERS>"
    )
    # 4: unclosed quote + numeric entities
    d.append(
        _SGML_DOC_TMPL.format(
            topics="NO", oldid="4", newid="30004", date="04-APR-1987 09:00:00.00",
            places=_places(["uk"]), title="UNCLOSED QUOTE DOC",
            body='An analyst said "the outlook is uncertain and left the quote open.',
        )
    )
    # 5: TEXT TYPE="BRIEF" variant (title only, no body element)
    d.append(
        '<REUTERS TOPICS="NO" LEWISSPLIT="TRAIN" CGISPLIT="TRAINING-SET" OLDID="5" NEWID="30005">\n'
        '<DATE>05-APR-1987 09:00:00.00</DATE>\n<TEXT TYPE="BRIEF">\n'
        "<TITLE>BRIEF VARIANT DOC</TITLE>\n</TEXT>\n</REUTERS>"
    )
    # 6: no NEWID attribute → id falls back to missingID-<n>
    d.append(
        '<REUTERS TOPICS="NO" LEWISSPLIT="TRAIN" CGISPLIT="TRAINING-SET" OLDID="6">\n'
        "<DATE>06-APR-1987 09:00:00.00</DATE>\n<TEXT>\n<TITLE>NO ID DOC</TITLE>\n"
        "<BODY>This one has no NEWID attribute.\n Reuter\n</BODY></TEXT>\n</REUTERS>"
    )
    return "\n".join(d)


def html_multi_doc(n: int = 3) -> list[str]:
    """HTML docs with META heads (shape of test/data/multi-doc.html).
    META attribute order/quoting rotates per doc — cheerio accepts all
    of these (xml-to-es.js:292-312), so the parser must too."""
    metas = [
        # canonical double-quoted, name first
        '<META name="id" content="{id}">\n'
        '<META name="title" content="HTML DOC {i} TITLE">\n'
        '<META name="places" content="usa,uk">\n',
        # reversed attribute order
        '<META content="{id}" name="id">\n'
        '<META content="HTML DOC {i} TITLE" name="title">\n'
        '<META content="usa,uk" name="places">\n',
        # single quotes
        "<META name='id' content='{id}'>\n"
        "<META name='title' content='HTML DOC {i} TITLE'>\n"
        "<META name='places' content='usa,uk'>\n",
    ]
    docs = []
    for i in range(n):
        docs.append(
            (
                "<HTML>\n<head><title>{id}</title>\n"
                + metas[i % len(metas)]
                + "</head>\n<body>\nBody text of html document number {i}.\n"
                "With a second line.\n</body>\n</HTML>"
            ).format(id=40000 + i, i=i)
        )
    return docs
