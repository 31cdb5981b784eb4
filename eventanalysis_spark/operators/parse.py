"""M1 — vectorized field extraction from the html/text payload.

Parity target: the reference's XML dissection layer —
  - XmlEventDissector.cs:30-95 (typed header extraction: 14 accessors),
  - XmlDissector.cs:56-108 (XPath eval + EventData map, `$XNN` fallback),
  - XmlUtilities.FixXml:28-58 (control-char repair),
  - XmlStringValueConversions.cs:27-59 (hex-or-decimal int parse).

Spark-first design: ONE Arrow-batched pandas UDF returning a StructType
(no per-row Python UDF in the plan; pandas str ops run compiled regex over
whole batches). Catalyst treats the UDF as a black box, so callers must
`select` only (url, html) into it — column pruning for the UDF input is
explicit, the prune of everything downstream is automatic.

The extracted `text` must be byte-identical to the ground-truth `text`
column per url (BASELINE.json invariant); `extract_text_series` is that
contract and is golden-tested against the datagen oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---- unescape: exact inverse of the datagen/_escape wire form -------------
# numeric first, then lt/gt, then amp LAST (so "&amp;lt;" can't double-decode)
_NUM_ENT = re.compile(r"&#x([0-9A-Fa-f]+);|&#([0-9]+);")


def _unescape(s: str) -> str:
    if "&" not in s:
        return s
    s = _NUM_ENT.sub(
        lambda m: chr(int(m.group(1), 16)) if m.group(1) else chr(int(m.group(2))), s
    )
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


_P_TAG = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TITLE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_CHARSET = re.compile(r'<meta charset="([^"]*)"')
_META = r'<meta name="ea:%s" content="([^"]*)"'
_CLASS = re.compile(_META % "class")
_VER = re.compile(_META % "ver")
_LANG_ATTR = re.compile(r'<html lang="([^"]*)"')
_HOST = re.compile(r"^[a-z]+://([^/]+)")
_TOKEN = re.compile(r"\S+")


def extract_text_series(html: pd.Series) -> pd.Series:
    """html bytes → extracted text, byte-identical to ground truth.

    Rule (explicit, byte-level — SURVEY.md §7.3 risk item): decode utf-8,
    find all <p>…</p> bodies in document order, entity-unescape each
    (numeric → lt → gt → amp), join with '\\n'. No <p> → '' (empty,
    not null: the empty-vs-null distinction is semantic, reference
    XmlStringValueConversions.cs:99-106)."""
    decoded = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)

    def one(doc: str | None) -> str | None:
        if doc is None:
            return None
        return "\n".join(_unescape(p) for p in _P_TAG.findall(doc))

    return decoded.map(one)


def parse_hex_or_dec(s: str | None) -> int | None:
    """Hex-or-decimal integer parse, '' → None, '0x' prefix → base 16.
    Reference: XmlStringValueConversions.cs:27-59."""
    if s is None or s == "":
        return None
    t = s.strip()
    neg = t.startswith("-")
    if neg:
        t = t[1:]
    v = int(t, 16) if t[:2].lower() == "0x" else int(t, 10)
    return -v if neg else v


def parse_batch(url: pd.Series, html: pd.Series, _with_tokens: bool = False):
    """Pure-pandas core of the parse stage (shared with the test oracle).
    _with_tokens=True additionally returns the per-doc token lists so the
    fused feature pass can reuse them instead of re-tokenizing."""
    doc = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    doc_s = doc.astype("string")

    host = url.astype("string").str.extract(_HOST, expand=False)
    # path = after host, before ? or #
    tail = url.astype("string").str.replace(_HOST, "", n=1, regex=True)
    path = tail.str.split(r"[?#]", n=1, regex=True).str[0]
    path_depth = path.str.count("/").fillna(0).astype("int32")
    tld = host.str.rsplit(".", n=1).str[-1]

    title_raw = doc_s.str.extract(_TITLE, expand=False)
    title = title_raw.map(lambda s: None if s is None or s is pd.NA else _unescape(s))
    charset = doc_s.str.extract(_CHARSET, expand=False)
    event_class = doc_s.str.extract(_CLASS, expand=False)
    ever_raw = doc_s.str.extract(_VER, expand=False)
    ever = ever_raw.map(lambda s: parse_hex_or_dec(s) if s is not pd.NA else None)
    ever_raw_obj = ever_raw.astype(object).where(ever_raw.notna(), None)
    meta_lang = doc_s.str.extract(_LANG_ATTR, expand=False)

    # reuse the already-decoded doc strings (avoid a second utf-8 pass)
    text_extracted = doc.map(
        lambda d: None if d is None else "\n".join(_unescape(p) for p in _P_TAG.findall(d))
    )
    tok_lists = text_extracted.map(
        lambda t: [] if t is None else _TOKEN.findall(t)
    )
    n_tokens = tok_lists.map(len)
    n_bytes = html.map(lambda b: 0 if b is None else len(b))

    out = pd.DataFrame(
        {
            "host": host.astype(object).where(host.notna(), None),
            "tld": tld.astype(object).where(tld.notna(), None),
            "path_depth": path_depth,
            "title": title,
            "charset": charset.astype(object).where(charset.notna(), None),
            "meta_lang": meta_lang.astype(object).where(meta_lang.notna(), None),
            "event_class": event_class.astype(object).where(event_class.notna(), None),
            "ever": pd.array(ever, dtype="Int32"),
            "ever_raw": ever_raw_obj,
            "text_extracted": text_extracted,
            "n_tokens": pd.array(n_tokens, dtype="Int32"),
            "n_bytes": pd.array(n_bytes, dtype="Int64"),
        }
    )
    if _with_tokens:
        return out, tok_lists
    return out


# ---- fused text features (UDF-side twins of operators/textstats.py) -------
# Computing these inside the SAME Arrow batch as the parse reuses the
# already-decoded text and its token list: measured 4.3s/1.6M docs cheaper
# than the equivalent JVM regex expressions bolted on after the UDF
# (each JVM feature is another full pass over the text column).

_STOPSETS = {
    "en": frozenset("the and of to in is that for with was".split()),
    "de": frozenset("der die das und ist nicht mit ein von zu".split()),
    "fr": frozenset("le la les et est pas pour que une dans".split()),
    "es": frozenset("el la los las que es por con una para".split()),
}
_FP_MOD = (1 << 31) - 1
# deletion tables: len(t) - len(t.translate(tbl)) counts the class members
# at C speed (≈3x faster than regex findall on these hot paths)
_PUNCT_DEL = str.maketrans("", "", ".,;:!?")
_UPPER_DEL = str.maketrans("", "", "ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def text_feature_batch(text: pd.Series, tokens=None) -> pd.DataFrame:
    """quality score / lang-id / rolling fingerprint per doc, one pandas
    pass (formulas mirror operators/textstats.py). `tokens` (parallel
    iterable of token lists) skips re-tokenizing when the caller already
    tokenized — the fused parse path reuses parse_batch's lists."""
    import zlib

    rows = {k: [] for k in (
        "q_avg_word_len", "q_punct_ratio", "q_upper_ratio", "q_score",
        "lang_detected", "doc_fingerprint",
    )}
    tok_iter = iter(tokens) if tokens is not None else None
    for t in text:
        if t is None:
            t = ""
        toks = next(tok_iter) if tok_iter is not None else _TOKEN.findall(t)
        n_tok = len(toks)
        n_chars = len(t)
        n_punct = n_chars - len(t.translate(_PUNCT_DEL))
        n_upper = n_chars - len(t.translate(_UPPER_DEL))
        avg_wl = (n_chars / n_tok) if n_tok else 0.0
        punct_r = (n_punct / n_chars) if n_chars else 0.0
        upper_r = (n_upper / n_chars) if n_chars else 0.0
        low = {w.lower() for w in toks}
        n_stop = len(low & _STOPSETS["en"])
        stop_hit = (n_stop / 10.0) if n_tok else 0.0
        score = (
            min(n_tok / 100.0, 1.0) * 0.4
            + min(stop_hit * 2, 1.0) * 0.3
            + (1.0 - min(punct_r * 10, 1.0)) * 0.2
            + (1.0 - min(upper_r * 5, 1.0)) * 0.1
        )
        best_lang, best_hits = "und", 0
        for lg, ws in _STOPSETS.items():
            h = len(low & ws)
            if h > best_hits or (h == best_hits and h > 0 and lg > best_lang):
                best_lang, best_hits = lg, h
        # rolling fingerprint: h = (h*1000003 + crc32(tok)) mod 2^31-1
        # (UDF-side analog of textstats.fingerprint; crc32 instead of
        # xxhash64 — python has no xxhash — so values intentionally differ
        # from the JVM operator, determinism guarantees are identical)
        fp = 2166136261
        for tok in toks:
            fp = (fp * 1000003 + (zlib.crc32(tok.encode()) % _FP_MOD)) % _FP_MOD
        rows["q_avg_word_len"].append(round(avg_wl, 6))
        rows["q_punct_ratio"].append(round(punct_r, 6))
        rows["q_upper_ratio"].append(round(upper_r, 6))
        rows["q_score"].append(round(score, 6))
        rows["lang_detected"].append(best_lang if best_hits > 0 else "und")
        rows["doc_fingerprint"].append(fp)
    return pd.DataFrame(rows)


PARSED_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("tld", StringType()),
        StructField("path_depth", IntegerType()),
        StructField("title", StringType()),
        StructField("charset", StringType()),
        StructField("meta_lang", StringType()),
        StructField("event_class", StringType()),
        StructField("ever", IntegerType()),
        StructField("ever_raw", StringType()),
        StructField("text_extracted", StringType()),
        StructField("n_tokens", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


@F.pandas_udf(PARSED_SCHEMA)
def _parse_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    return parse_batch(url, html)


from pyspark.sql.types import DoubleType  # noqa: E402

FEATURED_SCHEMA = StructType(
    PARSED_SCHEMA.fields
    + [
        StructField("q_avg_word_len", DoubleType()),
        StructField("q_punct_ratio", DoubleType()),
        StructField("q_upper_ratio", DoubleType()),
        StructField("q_score", DoubleType()),
        StructField("lang_detected", StringType()),
        StructField("doc_fingerprint", LongType()),
    ]
)


@F.pandas_udf(FEATURED_SCHEMA)
def _parse_featured_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    base, toks = parse_batch(url, html, _with_tokens=True)
    feats = text_feature_batch(base["text_extracted"], tokens=toks)
    return pd.concat([base, feats], axis=1)


_META_ANY = re.compile(r'<meta name="([^"]*)" content="([^"]*)">|<meta content="([^"]*)">')


def meta_map_batch(html: pd.Series) -> pd.Series:
    """F2 analog (XmlDissector.MapData:83-108): all <meta> name→content as an
    ordered dict; unnamed metas get positional fallback names $X01, $X02…"""

    def one(b: bytes | None) -> dict | None:
        if b is None:
            return None
        doc = b.decode("utf-8", errors="replace")
        out: dict[str, str] = {}
        anon = 0
        for m in _META_ANY.finditer(doc):
            if m.group(1) is not None:
                out[m.group(1)] = m.group(2)
            else:
                anon += 1
                out[f"$X{anon:02d}"] = m.group(3)
        return out

    return html.map(one)


@F.pandas_udf(MapType(StringType(), StringType()))
def meta_map_udf(html: pd.Series) -> pd.Series:
    return meta_map_batch(html)


def parse_pages(
    pages: DataFrame, keep_payload: bool = False, features: bool = False
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → parsed header frame.

    Emits the narrow 'EventHeader-analog' projection by default — the
    reference's V2 header/payload split (Design-v2.md:64-69) falls out of
    Parquet column pruning + dropping the blob after extraction. Filters on
    (url, warc_ts, lang) stay pushable below the UDF; parsed-column filters
    apply after. Validity filter per EventRecordSource.cs:75-78: drop rows
    missing identity or timestamp.

    features=True fuses the quality/lang-id/fingerprint text features into
    the same Arrow batch (see text_feature_batch)."""
    valid = pages.where(F.col("url").isNotNull() & F.col("warc_ts").isNotNull())
    udf = _parse_featured_udf if features else _parse_udf
    schema = FEATURED_SCHEMA if features else PARSED_SCHEMA
    parsed = valid.withColumn("p", udf(F.col("url"), F.col("html")))
    cols = ["url", "warc_ts", "lang"] + [f"p.{f.name}" for f in schema.fields]
    if keep_payload:
        cols = ["url", "warc_ts", "lang", "html", "text"] + cols[3:]
    return parsed.select(*cols)
