"""Property tests: spans.py vs a direct pure-Python reference over
randomized corpora (hypothesis). Pins window generation, cross-doc dup
detection, island merging, and text reconstruction against an
independent implementation."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

TOKENS = ["a", "b", "c", "d", "xx"]


def ref_windows(text: str, k: int):
    # mirror the regex-split semantics: split of trim('') gives ['']
    toks = text.strip().split() if text.strip() else [""]
    if len(toks) < k:
        return toks, []
    return toks, [
        (i + 1, " ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]


def ref_all(docs: list[str], k: int):
    """Reference: per-doc windows, cross-doc dup grams, islands, removal."""
    wins = {i: ref_windows(t, k) for i, t in enumerate(docs)}
    gram_docs: dict[str, set] = {}
    for i, (_, ws) in wins.items():
        for _, g in ws:
            gram_docs.setdefault(g, set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) > 1}
    out = {}
    for i, (toks, ws) in wins.items():
        spans = sorted(p for p, g in ws if g in dup)
        islands = []
        for p in spans:
            s, e = p, p + k - 1
            if islands and s <= islands[-1][1] + 1:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        cut = set()
        for s, e in islands:
            cut.update(range(s, e + 1))
        kept = [t for j, t in enumerate(toks, start=1) if j not in cut]
        out[i] = {
            "n_windows": len(ws),
            "n_dup": sum(1 for p, g in ws if g in dup),
            "islands": islands,
            "clean": " ".join(kept),
            "removed": len(toks) - len(kept),
        }
    return out


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 6))
    docs = []
    for _ in range(n_docs):
        n = draw(st.integers(0, 12))
        docs.append(" ".join(draw(st.sampled_from(TOKENS)) for _ in range(n)))
    return docs


@settings(max_examples=20, deadline=None)
@given(corpora(), st.integers(2, 4))
def test_spans_match_reference(spark, corpus, k):
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.spans import (
        duplicate_span_islands,
        remove_duplicate_spans,
        substring_dup_stats,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    ref = ref_all(corpus, k)

    stats = {r.doc_id: r for r in substring_dup_stats(df, k=k).collect()}
    for i, expect in ref.items():
        assert stats[i].n_windows == expect["n_windows"], (i, corpus, k)
        assert stats[i].n_dup_windows == expect["n_dup"], (i, corpus, k)

    isl = {}
    for r in duplicate_span_islands(df, k=k).collect():
        isl.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for i, expect in ref.items():
        assert sorted(isl.get(i, [])) == expect["islands"], (i, corpus, k)

    rem = {r.doc_id: r for r in remove_duplicate_spans(df, k=k).collect()}
    for i, expect in ref.items():
        assert rem[i].clean_text == expect["clean"], (i, corpus, k)
        assert rem[i].n_tokens_removed == expect["removed"], (i, corpus, k)
