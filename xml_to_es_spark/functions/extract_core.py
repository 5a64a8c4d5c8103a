"""Pure-Python document extraction kernel.

This module defines the engine's text-extraction semantics and is
shared **verbatim** between the pure-Python oracle (``pyref``) and the
Spark Arrow UDFs (``functions.extract``) — that sharing is what makes
"byte-identical extracted text per url" (BASELINE.json input_hint) a
structural guarantee rather than a test-chased property.

Semantics re-expressed (not translated) from the reference:

- numeric character entities ``&#N;`` are removed before parsing
  (reference: xml-to-es.js:166);
- XML/SGML comments ``<!-- ... -->`` are stripped before doc-boundary
  detection (reference: xml-to-es.js:447,517);
- HTML docs: every ``<META name content>`` becomes a field; ``body``
  is the text content of ``<body>`` (reference: xml-to-es.js:292-312,
  cheerio ``$('body').text()``);
- SGML/XML docs: one nested dict per document with xml2js conventions
  — attributes under ``'@'``, text content under ``'#'``, repeated
  children become lists (reference: xml-to-es.js:11, README.md:34);
- repair rules: garbage before docstart discarded (xml-to-es.js:144-151),
  unclosed quotes balanced (handleAnomalies.js:20-36), missing close
  tag inserted before the next docstart (xml-to-es.js:567-576),
  missing/fuzzy head element repaired (handleAnomalies.js:68-85);
- the field-mapping algebra (modifyJson, xml-to-es.js:234-286) in its
  fixed order: lowercase keys → preProcess → promote → delete →
  flatten → rename → empty-cleanup → id default ``missingID-<n>``.

No Spark imports here: this file must be importable on executors and
by plain pytest without a JVM.
"""

from __future__ import annotations

import html as _htmllib
import re
import xml.etree.ElementTree as ET
from difflib import SequenceMatcher
from typing import Any

NUMERIC_ENTITY_RE = re.compile(r"&#[0-9]+;")
COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
PROLOG_RE = re.compile(r"^\s*<\?xml[^>]*>\s*|^\s*<!DOCTYPE[^>]*>\s*", re.IGNORECASE)
TAG_RE = re.compile(r"<[^>]*>")
# META tags parsed in two steps (tag, then attributes) so attribute
# ORDER and QUOTING are both free, matching cheerio's attr() semantics
# (reference xml-to-es.js:292-312): <meta content='x' name=id> is as
# valid as <meta name="id" content="x">.
META_TAG_RE = re.compile(r"<meta\b([^>]*)>", re.IGNORECASE)
ATTR_RE = re.compile(
    r"([a-zA-Z_][\w:.-]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'<>`]+)"
)
TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
BODY_RE = re.compile(r"<body[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)


def strip_numeric_entities(s: str) -> str:
    """Remove ``&#N;`` control entities (reference: xml-to-es.js:166)."""
    return NUMERIC_ENTITY_RE.sub("", s)


def strip_comments(s: str) -> str:
    """Remove ``<!-- ... -->`` comments (reference: xml-to-es.js:447,517)."""
    return COMMENT_RE.sub("", s)


def strip_prolog(s: str) -> str:
    """Drop ``<?xml?>`` / ``<!DOCTYPE>`` prologs (reference: xml-to-es.js:529-541)."""
    prev = None
    while prev != s:
        prev = s
        s = PROLOG_RE.sub("", s, count=1)
    return s


def balance_unclosed_quotes(s: str) -> str:
    """If a doc has an odd number of double quotes, balance it.

    Reference: handleAnomalies.js:20-36 appends a quote to the
    offending indented paragraph; we pin the simpler, deterministic
    rule of appending the missing quote at end-of-string (same
    token-stream effect: the quote is punctuation, a token separator).
    """
    if s.count('"') % 2 == 1:
        # insert before the trailing close tag so the doc stays
        # well-formed (the reference patches the offending paragraph;
        # token-stream effect is identical — quotes are separators)
        m = re.search(r"</[^<>]+>\s*$", s)
        if m:
            s = s[: m.start()] + '"' + s[m.start() :]
        else:
            s = s + '"'
    return s


def _fuzzy(a: str, b: str) -> float:
    """Similarity score in [0,1] (reference uses string_score>0.5,
    handleAnomalies.js:43,74)."""
    return SequenceMatcher(None, a.lower(), b.lower()).ratio()


def split_documents(content: str, doctype: str | None = None) -> list[str]:
    """Split a raw string holding 1..N SGML/XML docs into single docs.

    Re-expression of the reference's streaming splitter
    (checkStart/getOneXmlDoc, xml-to-es.js:535-613) for in-memory
    strings: the doctype is sniffed from the first top-level element
    (headrx, xml-to-es.js:437), docs end at ``</doctype>``; a missing
    close tag is repaired by splitting at the next docstart
    (xml-to-es.js:567-576); a missing/garbled head element is fuzzy
    repaired or synthesized (handleAnomalies.js:68-85).
    """
    s = strip_prolog(strip_comments(content))
    m = re.search(r"<([A-Za-z][\w.-]*)", s)
    if not m:
        return []
    dt = doctype or m.group(1)
    # pre-repair garbled head elements (supplyMissingHeadElement,
    # handleAnomalies.js:68-85): a start-of-line open tag that fuzzy
    # matches the doctype is corrected to it
    def _fix_head(mm: re.Match) -> str:
        tag = mm.group(1)
        if tag.lower() != dt.lower() and _fuzzy(tag, dt) > 0.7:
            return "<" + dt + mm.group(2)
        return mm.group(0)

    s = re.sub(r"(?m)^<([A-Za-z][\w.-]*)([\s>])", _fix_head, s)
    open_re = re.compile(r"<" + re.escape(dt) + r"(?=[\s>])", re.IGNORECASE)
    close_re = re.compile(r"</" + re.escape(dt) + r"\s*>", re.IGNORECASE)

    starts = [mm.start() for mm in open_re.finditer(s)]
    docs: list[str] = []
    if not starts:
        return []
    # leading garbage / doc with missing head element
    lead = s[: starts[0]].strip()
    if lead:
        # try to repair a fuzzy-matched head element (supplyMissingHeadElement)
        lm = re.match(r"\s*<([^-\s!>]+)", s[: starts[0]])
        if lm and _fuzzy(lm.group(1), dt) > 0.5:
            repaired = re.sub(re.escape(lm.group(1)), dt, s[: starts[0]], count=1)
        else:
            repaired = "<" + dt + ">\n" + s[: starts[0]]
        docs.append(_close_one(repaired, dt, close_re))
    for i, st in enumerate(starts):
        end = starts[i + 1] if i + 1 < len(starts) else len(s)
        docs.append(_close_one(s[st:end], dt, close_re))
    return [d for d in docs if d.strip()]


def _close_one(piece: str, dt: str, close_re: re.Pattern) -> str:
    """Trim one doc at its close tag, or repair a missing/bogus one."""
    m = close_re.search(piece)
    if m:
        return piece[: m.end()]
    # strip a fuzzy bogus close element (clearElementClose,
    # handleAnomalies.js:38-49), then append the canonical close
    tail = piece.rstrip()
    lt = re.search(r"</(\S+)>\s*$", tail)
    if lt and _fuzzy(lt.group(1), dt) > 0.5:
        tail = tail[: lt.start()]
    return tail + "</" + dt + ">"


# ---------------------------------------------------------------------------
# SGML/XML doc → nested dict (xml2js conventions)
# ---------------------------------------------------------------------------


def _element_to_obj(el: ET.Element) -> Any:
    """xml2js {explicitArray:false, attrkey:'@', charkey:'#'} shape."""
    children: dict[str, Any] = {}
    for child in el:
        v = _element_to_obj(child)
        k = child.tag
        if k in children:
            if not isinstance(children[k], list):
                children[k] = [children[k]]
            children[k].append(v)
        else:
            children[k] = v
    text = (el.text or "") + "".join((c.tail or "") for c in el)
    text = text.strip()
    obj: dict[str, Any] = {}
    if el.attrib:
        obj["@"] = dict(el.attrib)
    obj.update(children)
    if text:
        if obj:
            obj["#"] = text
        else:
            return text
    return obj if obj else ""


_AMP_FIX_RE = re.compile(r"&(?!lt;|gt;|amp;|apos;|quot;|#)")


def parse_sgml_doc(doc: str) -> dict | None:
    """Parse one repaired SGML/XML document string into a nested dict.

    Pipeline per the reference's processPossibleGoodDoc
    (xml-to-es.js:139-177): discard garbage before docstart, balance
    quotes, strip numeric entities, then parse (xmlToJson,
    xml-to-es.js:380-392).
    """
    m = re.search(r"<([A-Za-z][\w.-]*)[\s>]", doc)
    if not m:
        return None
    if m.start() > 0:
        doc = doc[m.start() :]
    doc = balance_unclosed_quotes(doc)
    doc = strip_numeric_entities(doc)
    # SGML allows bare '&' and '<' in text; escape for the XML parser.
    doc = _AMP_FIX_RE.sub("&amp;", doc)
    try:
        root = ET.fromstring(doc)
    except ET.ParseError:
        # lenient retry: escape stray '<' that do not open a tag
        doc2 = re.sub(r"<(?![A-Za-z/!?])", "&lt;", doc)
        try:
            root = ET.fromstring(doc2)
        except ET.ParseError:
            return None
    obj = _element_to_obj(root)
    if isinstance(obj, str):
        obj = {"#": obj}
    return {root.tag: obj}


# ---------------------------------------------------------------------------
# HTML doc → field dict (reference htmlToJson, xml-to-es.js:292-312)
# ---------------------------------------------------------------------------


def _unescape(s: str) -> str:
    return _htmllib.unescape(s)


def _meta_attrs(attr_text: str) -> dict[str, str]:
    """Attribute dict of one META tag: any order, double/single/no
    quotes (cheerio-equivalent leniency)."""
    out: dict[str, str] = {}
    for key, val in ATTR_RE.findall(attr_text):
        if val[:1] in ("'", '"') and val[-1:] == val[:1]:
            val = val[1:-1]
        out[key.lower()] = val
    return out


def html_to_fields(doc: str) -> dict:
    """Every ``<META name content>`` becomes a field; ``body`` = text
    content of ``<body>`` with tags stripped and entities decoded,
    numeric entities removed first, whitespace preserved."""
    doc = strip_comments(doc)
    doc = strip_numeric_entities(doc)
    j: dict[str, Any] = {}
    for m in META_TAG_RE.finditer(doc):
        attrs = _meta_attrs(m.group(1))
        if "name" in attrs and "content" in attrs:
            j[attrs["name"]] = _unescape(attrs["content"])
    bm = BODY_RE.search(doc)
    body_html = bm.group(1) if bm else ""
    j["body"] = _unescape(TAG_RE.sub("", body_html))
    if "title" not in j:
        tm = TITLE_RE.search(doc)
        if tm:
            j["title"] = _unescape(TAG_RE.sub("", tm.group(1)).strip())
    return j


def extract_text(html_doc: str) -> str:
    """The engine's canonical page→text extraction: the ``body`` field
    of :func:`html_to_fields`. This single function is the
    byte-identity contract surface."""
    return html_to_fields(html_doc)["body"]


# ---------------------------------------------------------------------------
# Field-mapping algebra (modifyJson, xml-to-es.js:234-286)
# ---------------------------------------------------------------------------


def _is_empty_object(v: Any) -> bool:
    return isinstance(v, dict) and not v


def lower_case_keys(o: Any) -> Any:
    """Recursive key lowercase; drops empty-object values
    (xml-to-es.js:62-78)."""
    if isinstance(o, list):
        return [lower_case_keys(e) for e in o]
    if not isinstance(o, dict):
        return o
    out = {}
    for k, v in o.items():
        if _is_empty_object(v):
            continue
        out[k.lower()] = lower_case_keys(v)
    return out


def promote_fields(result: dict, promote: dict) -> dict:
    """Hoist ``parent.key`` → top-level ``target`` (promoteOne,
    xml-to-es.js:196-232). ``promote`` maps parent → list of either a
    key string or ``{'key': k, 'target': t}``. Collisions clobber
    (last writer wins, xml-to-es.js:218-222); emptied parents are
    deleted."""
    for parent, spec in promote.items():
        val = result.get(parent)
        if not isinstance(val, dict):
            continue
        for pkey in spec:
            if isinstance(pkey, dict):
                key, target = pkey["key"], pkey["target"]
            else:
                key = target = pkey
            value = val.get(key)
            if not value:
                continue
            result[target] = value
            del val[key]
        if _is_empty_object(result.get(parent)):
            del result[parent]
    return result


def delete_fields(data: Any, del_spec: dict) -> Any:
    """Recursive deletion by ``{parentKey: [childKeys]}``; ``'.'`` is
    top level; prunes emptied parents (xml-to-es.js:108-126)."""
    if isinstance(data, list):
        return [delete_fields(e, del_spec) for e in data]
    if not isinstance(data, dict):
        return data
    for rm in del_spec.get(".", []):
        data.pop(rm, None)
    for key in list(data.keys()):
        if key in del_spec:
            for rm in del_spec[key]:
                if isinstance(data[key], dict):
                    data[key].pop(rm, None)
            if _is_empty_object(data[key]):
                del data[key]
        else:
            data[key] = delete_fields(data[key], del_spec)
    return data


def flatten_vacuous(data: Any, vacuous: list) -> Any:
    """Remove wrapper keys: ``{places: {d: [{'#': 'usa'}, ...]}}`` →
    ``places: ['usa', ...]`` (flattenObjectHandler, xml-to-es.js:98-106;
    ``'#'`` auto-added, xml-to-es.js:738-739)."""
    if isinstance(data, list):
        return [flatten_vacuous(e, vacuous) for e in data]
    if not isinstance(data, dict):
        return data
    keys = list(data.keys())
    if len(keys) == 1 and keys[0] in vacuous:
        return flatten_vacuous(data[keys[0]], vacuous)
    return {k: flatten_vacuous(v, vacuous) for k, v in data.items()}


def rename_fields(data: Any, renames: dict) -> Any:
    """Recursive key rename (renameObjectHandler, xml-to-es.js:128-137)."""
    if isinstance(data, list):
        return [rename_fields(e, renames) for e in data]
    if not isinstance(data, dict):
        return data
    out = {}
    for k, v in data.items():
        out[renames.get(k, k)] = rename_fields(v, renames)
    return out


def modify_json(
    result: dict,
    *,
    promote: dict | None = None,
    delete: dict | None = None,
    flatten: list | None = None,
    rename: dict | None = None,
    pre_process=None,
    missing_id: int = 0,
) -> tuple[dict, int]:
    """The full algebra in the reference's fixed order
    (xml-to-es.js:234-286). Returns (mapped_doc, next_missing_id)."""
    result = lower_case_keys(result)
    if pre_process is not None:
        result = pre_process(result)
    if promote:
        result = promote_fields(result, promote)
    if delete:
        result = delete_fields(result, delete)
    vac = list(flatten or [])
    if "#" not in vac:  # '#' is always flattened (xml-to-es.js:738-739)
        vac.append("#")
    result = flatten_vacuous(result, vac)
    if rename:
        result = rename_fields(result, rename)
    for key in list(result.keys()):
        if _is_empty_object(result[key]):
            del result[key]
    if "id" not in result:
        result["id"] = f"missingID-{missing_id}"
        missing_id += 1
    return result, missing_id


# Reuters/lewis mapping config (examples/lewis-input-config.js:21-37):
# unwrap single 'reuters' root, promote text.{title,dateline,author,
# body} and @.newid→id, flatten 'd' wrappers.
REUTERS_PROMOTE = {
    "text": ["title", "dateline", "author", "body"],
    "@": [{"key": "newid", "target": "id"}],
}
REUTERS_FLATTEN = ["d"]


def reuters_pre_process(j: dict) -> dict:
    if "reuters" in j and len(j) == 1:
        return j["reuters"]
    return j


def extract_reuters_docs(content: str, missing_id: int = 0) -> tuple[list[dict], int]:
    """Full reference convert pipeline for a Reuters-shaped SGML string:
    split → repair → parse → field-map. Returns (docs, next_missing_id)."""
    docs = []
    for piece in split_documents(content):
        parsed = parse_sgml_doc(piece)
        if parsed is None:
            continue
        mapped, missing_id = modify_json(
            parsed,
            promote=REUTERS_PROMOTE,
            flatten=REUTERS_FLATTEN,
            pre_process=reuters_pre_process,
            missing_id=missing_id,
        )
        mapped = {k: v for k, v in mapped.items() if v != ""}
        docs.append(mapped)
    return docs, missing_id
