"""Web-corpus quality filters for training-data pipelines.

The standard Common-Crawl curation operators (C4 / Gopher / RefinedWeb
lineage, all public): n-gram repetition metrics, line-structure metrics,
composite quality gates, and URL/domain operators. Everything is either a
pure Catalyst column expression (narrow, whole-stage-codegen) or a
(doc_id, gram)-keyed aggregate — the only shuffle key always contains the
document id, so the operators cannot concentrate load on hot keys at any
corpus size.

Reference parity note: the reference engine has no web-corpus analog;
these extend the §2.8 scalar-function surface the same way the
dedup/similarity suite extends §2.7 (mission brief: training-pipeline
operators are first-class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.operators.dedup import _tokens

# ---- n-gram repetition (Gopher repetition filters) -----------------------


def _gram_counts(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, gram, cnt, doc_chars): word n-gram occurrence counts per
    doc. Shuffle key is (doc_id, gram) — per-doc cardinality bounded by
    doc length, so partial (map-side) aggregation absorbs all in-doc
    repetition before the exchange."""
    # let-binding (transform over a 1-element array): without it the
    # tokenizer expression inlines into every slice() and re-runs once
    # per gram window — the shingles() O(tokens²) bug
    def _grams(t: Column) -> Column:
        nn = F.size(t)
        return F.when(nn < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.greatest(nn - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            )
        )

    grams = F.get(F.transform(F.array(_tokens(F.col(text_col))), _grams), 0)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.length(F.trim(F.lower(F.col(text_col)))).alias("doc_chars"),
            F.explode(grams).alias("gram"),
        )
        .groupBy("doc_id", "doc_chars", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_ngram_stats(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per doc: the most frequent word n-gram (ties → lexicographically
    smallest gram, deterministic) and the fraction of document characters
    its occurrences cover — the Gopher "fraction of characters in the most
    common n-gram" signal. Docs with fewer than n words produce no row."""
    gc = _gram_counts(df, n, id_col, text_col)
    # min(struct(-cnt, gram)) = max count, then MIN gram on ties: one
    # hash aggregate on doc_id, no window sort
    pick = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram").alias("g")))
    return (
        gc.groupBy("doc_id", "doc_chars")
        .agg(pick.alias("p"))
        .select(
            "doc_id",
            F.col("p.g").alias("top_gram"),
            (-F.col("p.neg")).cast("long").alias("top_gram_count"),
            (
                (-F.col("p.neg")) * F.length("p.g")
                / F.greatest(F.col("doc_chars"), F.lit(1))
            ).alias("top_gram_char_frac"),
        )
    )


def dup_ngram_char_fraction(
    df: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per doc: fraction of characters covered by word n-grams that occur
    more than once (count·len(gram)/doc_chars, summed over duplicated
    grams) — the Gopher "fraction of characters in duplicate n-grams"
    signal. Docs with fewer than n words produce no row."""
    gc = _gram_counts(df, n, id_col, text_col)
    dup_chars = F.sum(
        F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram")).otherwise(F.lit(0))
    )
    return (
        gc.groupBy("doc_id", "doc_chars")
        .agg(dup_chars.alias("dc"))
        .select(
            "doc_id",
            (F.col("dc") / F.greatest(F.col("doc_chars"), F.lit(1))).alias(
                "dup_ngram_char_frac"
            ),
        )
    )


# ---- line-structure metrics (C4/RefinedWeb line filters) ------------------


def line_stats(text: Column) -> Column:
    """struct(n_lines, dup_line_frac, dup_line_char_frac, bullet_line_frac,
    ellipsis_line_frac) — the line-level repetition/format signals used by
    C4-style cleaning. Pure Catalyst array expressions (narrow)."""
    lines = F.split(text, "\n")
    n = F.size(lines)
    dlines = F.array_distinct(lines)
    nd = F.size(dlines)
    tot_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    dist_chars = F.aggregate(
        dlines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_bullet = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))
    )
    fn = F.greatest(n, F.lit(1))
    return F.struct(
        n.cast("long").alias("n_lines"),
        ((n - nd) / fn).alias("dup_line_frac"),
        (
            (tot_chars - dist_chars)
            / F.greatest(tot_chars, F.lit(1))
        ).alias("dup_line_char_frac"),
        (n_bullet / fn).alias("bullet_line_frac"),
        (n_ellipsis / fn).alias("ellipsis_line_frac"),
    )


# ---- composite quality gate (Gopher rules) --------------------------------

_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> Column:
    """struct of per-rule booleans + overall `keep` — the published Gopher
    quality heuristics (word count window, mean word length window,
    symbol-to-word ratio, stopword presence). One projection, no shuffle."""
    toks = _tokens(text)
    n_words = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_wl = total_len / F.greatest(n_words, F.lit(1))
    n_sym = F.size(F.filter(toks, lambda x: x.isin("#", "...", "…")))
    sw_arr = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    sw_hits = F.size(F.array_intersect(F.array_distinct(toks), sw_arr))
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_sym = (n_sym / F.greatest(n_words, F.lit(1))) <= max_symbol_word_ratio
    ok_sw = sw_hits >= min_stopword_hits
    return F.struct(
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sw_hits.cast("long").alias("stopword_hits"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_sw.alias("ok_stopwords"),
        (ok_words & ok_mean & ok_sym & ok_sw).alias("keep"),
    )


# ---- PII scrubbing (C4-style redaction) -----------------------------------

# patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b —
# no alternation-order or lookaround subtleties
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4s", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """struct(text_scrubbed, n_emails, n_ipv4s, n_phones): redact emails,
    IPv4 addresses, and xxx-xxx-xxxx phone numbers (the C4-style PII
    pass). Sequential stages — each count is taken on the previous stage's
    output, then replaced — so e.g. digits inside an already-redacted
    email are never double-counted. Pure Catalyst, one projection."""
    cur = text
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(cur.alias("text_scrubbed"), *counts)


# ---- URL / domain operators ----------------------------------------------

# common second-level public suffixes: "a.co.uk" registers at 3 labels
_SECOND_LEVEL = ["co", "com", "org", "net", "ac", "gov", "edu"]


def url_parts(url: Column) -> Column:
    """struct(host, registered_domain, tld, path_depth) from a URL string.

    registered_domain is the public-suffix heuristic every large-scale
    pipeline starts from: last two labels, or last three when the
    second-to-last label is a known second-level suffix (co/com/org/…)
    under a 2-letter ccTLD. path_depth counts non-empty path segments.

    The authority is normalized before splitting: scheme match is
    case-insensitive, userinfo (up to the last '@') and an explicit
    ':port' suffix are stripped — otherwise 'https://evil.com:8080/x'
    yields host 'evil.com:8080' and a block list entry 'evil.com'
    silently fails to match in domain_filter."""
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    host = F.lower(
        F.regexp_replace(F.regexp_replace(auth, r"^.*@", ""), r":\d+$", "")
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    second = F.when(n >= 2, F.element_at(labels, -2)).otherwise(F.lit(""))
    take3 = (
        (n >= 3)
        & second.isin(*_SECOND_LEVEL)
        & (F.length(tld) == 2)
    )
    reg = F.when(
        take3,
        F.concat_ws(".", F.element_at(labels, -3), second, tld),
    ).otherwise(
        F.when(n >= 2, F.concat_ws(".", second, tld)).otherwise(host)
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(/[^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda x: F.length(x) > 0))
    return F.struct(
        host.alias("host"),
        reg.alias("registered_domain"),
        tld.alias("tld"),
        depth.cast("long").alias("path_depth"),
    )


def domain_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Drop (mode='block') or keep (mode='allow') rows whose registered
    domain appears in `blocked` (a 1-column `domain` table). The domain
    list is a small dimension → broadcast left_anti/left_semi; the corpus
    never shuffles."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    dom = url_parts(F.col(url_col))["registered_domain"]
    join_type = "left_anti" if mode == "block" else "left_semi"
    return (
        df.withColumn("__dom", dom)
        .join(
            F.broadcast(blocked.select(F.col("domain").alias("__dom"))),
            "__dom",
            join_type,
        )
        .drop("__dom")
    )


_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization (the normalize-before-dedup step
    every Common-Crawl-scale pipeline runs before exact URL dedup):

      - strip the fragment,
      - lowercase the scheme and authority,
      - drop explicit default ports (http://…:80, https://…:443),
      - drop tracking query params (utm_*, gclid, fbclid, msclkid,
        mc_eid, ref),
      - sort the surviving query params (param order never changes the
        resource), dropping '?' when none survive,
      - trim trailing slashes from the path ('/a/' == '/a', root == '').

    Pure Catalyst (regexp + array expressions — narrow, codegen'd, no
    UDF), and every step is DuckDB-replicable so the whole
    canonicalization is exact-oracle-checkable. Deliberately NOT done:
    userinfo stripping, %-decoding, and path-segment resolution ('..'),
    which can change which resource is fetched."""
    no_frag = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    auth = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    )
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).when(
        scheme == "https", F.regexp_replace(auth, r":443$", "")
    ).otherwise(auth)
    path = F.regexp_replace(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1),
        r"/+$",
        "",
    )
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(no_frag, r"\?([^#]*)", 1), "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(F.length(q) > 0, F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def dedup_canonical_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact URL-level dedup on the canonical form: ONE row per canonical
    url, keeping the max id (latest-crawl-wins, matching snapshot_delta's
    re-crawl semantics) plus the collapse count. Shape: a narrow
    canonicalization projection then a single partial-aggregatable hash
    agg on the canonical string — no window, no sort, no payload
    shuffle (only (canonical, id) pairs move)."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.max(id_col).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
    )


def drop_url_duplicates(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY step of canonical-url dedup: the full surviving rows (all
    columns, latest id wins per canonical url) plus the canonical_url
    and collapse count. ONE hash aggregate — max_by(struct(*), id) picks
    the whole winning row map-side, so the payload of losing duplicates
    is dropped before the shuffle (never a window, never a self-join)."""
    cols = df.columns
    return (
        df.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.max_by(F.struct(*cols), F.col(id_col)).alias("__row"),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
        .select(
            *[F.col(f"__row.{c}").alias(c) for c in cols],
            "canonical_url",
            "n_variants",
        )
    )


# ---- C4 cleaning: line-level filter + document gates ----------------------

# a small deterministic spam/adult word list standing in for the full
# public "List of Dirty, Naughty, Obscene..." blocklist C4 uses; the
# operator takes the real list as a parameter at production scale
C4_BADWORDS: tuple[str, ...] = (
    "casino", "gamble", "nude", "porn", "viagra", "xxx",
)

C4_BANNED_LINE_TERMS: tuple[str, ...] = ("javascript",)
C4_BANNED_DOC_SUBSTRINGS: tuple[str, ...] = ("lorem ipsum", "{")


def c4_line_filter(
    text: Column,
    min_words_per_line: int = 5,
    banned_line_terms: tuple[str, ...] = C4_BANNED_LINE_TERMS,
) -> Column:
    """struct(text_clean, n_lines, n_kept_lines): the C4 line-level
    cleaning pass (Raffel et al. 2020 §2.2) — keep only lines that end in
    a terminal punctuation mark, have at least `min_words_per_line`
    words, and do not mention a banned term (C4 drops any line with the
    word "javascript", the tell of failed HTML extraction). Pure Catalyst
    array expressions over split('\\n') — narrow, codegen'd, no shuffle,
    no Python; dropped lines are cut in place so paragraph order is
    preserved in `text_clean`."""
    lines = F.split(text, "\n")

    def _keep(x: Column) -> Column:
        tx = F.trim(x)
        cond = (
            (F.length(tx) > 0)
            & tx.rlike(r'[.!?"]$')
            & (F.size(F.split(tx, r"\s+")) >= min_words_per_line)
        )
        for term in banned_line_terms:
            cond = cond & ~F.lower(x).contains(term)
        return cond

    kept = F.filter(lines, _keep)
    return F.struct(
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    badwords: tuple[str, ...] = C4_BADWORDS,
    banned_line_terms: tuple[str, ...] = C4_BANNED_LINE_TERMS,
    banned_doc_substrings: tuple[str, ...] = C4_BANNED_DOC_SUBSTRINGS,
    passthrough: bool = False,
) -> DataFrame:
    """The published C4 cleaning recipe (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning", §2.2) as one narrow projection:

      line level — keep lines ending in terminal punctuation, with >=
      `min_words_per_line` words, not mentioning a banned term;
      doc level  — flag documents containing any blocklist word
      (word-boundary match on letter runs, so "casino." flags but
      "scasinos" does not), or any banned substring ("lorem ipsum" —
      placeholder text — and "{", the tell of leaked source code);
      gate      — keep = enough surviving lines AND no doc-level flag.

    Output: (id, text_clean, n_lines, n_kept_lines, had_badword,
    had_banned_substring, keep) — or, with passthrough=True, EVERY
    original column plus those outputs (the pipeline/CLI mode, still
    one projection — no join back on id). One projection over the corpus: no
    shuffle, no Python, every rule whole-stage-codegen'd — at 10^12 docs
    this runs at scan speed and composes with `gopher_quality_flags`
    (statistical gates) the way the public pipelines stack them.
    """
    text = F.col(text_col)
    lf = c4_line_filter(text, min_words_per_line, banned_line_terms)
    words = F.split(F.lower(text), r"[^a-z]+")
    bad = F.arrays_overlap(
        words, F.array(*[F.lit(w) for w in badwords])
    )
    sub = F.lit(False)
    for s in banned_doc_substrings:
        sub = sub | F.lower(text).contains(s)
    lead = (
        [F.col(c) for c in df.columns] if passthrough else [F.col(id_col)]
    )
    return df.withColumn("__lf", lf).select(
        *lead,
        F.col("__lf.text_clean").alias("text_clean"),
        F.col("__lf.n_lines").alias("n_lines"),
        F.col("__lf.n_kept_lines").alias("n_kept_lines"),
        F.coalesce(bad, F.lit(False)).alias("had_badword"),
        sub.alias("had_banned_substring"),
        (
            (F.col("__lf.n_kept_lines") >= min_kept_lines)
            & ~F.coalesce(bad, F.lit(False))
            & ~sub
        ).alias("keep"),
    )
