"""Property-based tests (hypothesis) for the byte-level extraction
invariants — pure-python core functions, no Spark session needed."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from eventanalysis_spark.datagen import _CTRL, _escape
from eventanalysis_spark.operators.parse import (
    _unescape,
    extract_text_series,
    parse_hex_or_dec,
)

# text the generator could ever embed: any unicode minus the chars that
# would terminate a <p> early after escaping (escaping handles & < >;
# raw control chars are legal in our wire form)
page_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates (not valid utf-8)
        blacklist_characters="\x00\r",  # NUL/CR never produced by datagen
    ),
    max_size=200,
)


@given(page_text, st.booleans())
@settings(max_examples=300, deadline=None)
def test_escape_unescape_roundtrip(s, numeric_ctrl):
    assert _unescape(_escape(s, numeric_ctrl)) == s


@given(st.lists(page_text.filter(lambda s: "\n" not in s), max_size=5), st.booleans())
@settings(max_examples=200, deadline=None)
def test_paragraph_extraction_roundtrip(paras, numeric_ctrl):
    """Any paragraph list embedded the datagen way is recovered
    byte-identically by the parse path."""
    body = "".join(f"<p>{_escape(p, numeric_ctrl)}</p>" for p in paras)
    html = f"<html><body>{body}</body></html>".encode("utf-8")
    got = extract_text_series(pd.Series([html]))[0]
    assert got == "\n".join(paras)


@given(st.integers(min_value=0, max_value=2**53))
@settings(max_examples=200, deadline=None)
def test_hex_or_dec_roundtrip(n):
    assert parse_hex_or_dec(str(n)) == n
    assert parse_hex_or_dec(hex(n)) == n
    assert parse_hex_or_dec(hex(n).upper().replace("0X", "0x")) == n


@given(st.text(alphabet="0123456789abcdefx-", max_size=10))
@settings(max_examples=200, deadline=None)
def test_hex_or_dec_never_wrong_type(s):
    """Parse either returns an int or raises ValueError — never silently
    coerces garbage."""
    try:
        v = parse_hex_or_dec(s)
    except ValueError:
        return
    assert v is None or isinstance(v, int)


def test_ctrl_char_catalogue_matches_reference():
    """The escaped control set must be exactly the reference FixXml set
    (XmlUtilities.cs:28-58): 0x01-0x08, 0x0B, 0x0C, 0x0E-0x1F."""
    want = set(range(0x01, 0x09)) | {0x0B, 0x0C} | set(range(0x0E, 0x20))
    assert {ord(c) for c in _CTRL} == want


# ---- vectorized feature batch == scalar spec ------------------------------
# text_feature_batch is whole-batch numpy; _doc_features is the scalar
# spec it must match elementwise (values are persisted pipeline columns,
# so this is a wire-format invariant, not just an optimization check)

feature_text = st.one_of(
    st.none(),
    st.just(""),
    st.just("   \t\n  "),  # whitespace-only: chars>0, tokens==0
    st.text(max_size=300),
    st.text(
        alphabet="aetoinshr THEANDOF.,;:!? \t\n le la der und el que",
        max_size=400,
    ),  # stopword/punct/upper-rich mix incl. NBSP whitespace
)


@given(st.lists(feature_text, max_size=25))
@settings(max_examples=200, deadline=None)
def test_feature_batch_matches_scalar_spec(texts):
    from eventanalysis_spark.operators.parse import (
        _FEATURE_COLS,
        _doc_features,
        text_feature_batch,
    )

    got = text_feature_batch(pd.Series(texts, dtype="object"))
    want = pd.DataFrame(
        [
            _doc_features(t if t is not None else "",
                          t.split() if t is not None else [])
            for t in texts
        ],
        columns=list(_FEATURE_COLS),
    )
    for c in _FEATURE_COLS:
        gv, wv = got[c].tolist(), want[c].tolist()
        assert gv == wv, f"{c}: {gv} != {wv}"


def test_feature_batch_token_reuse_path():
    """The fused path hands parse_batch's token lists straight in —
    equality must hold for that calling form too (and for huge docs that
    grow the power table)."""
    from eventanalysis_spark.operators.parse import (
        _FEATURE_COLS,
        _doc_features,
        text_feature_batch,
    )

    texts = ["the and of to in " * 500, "word", "", None, "a b  c d"]
    toks = [t.split() if t is not None else [] for t in texts]
    got = text_feature_batch(pd.Series(texts, dtype="object"), tokens=toks)
    want = pd.DataFrame(
        [_doc_features(t if t is not None else "", tk)
         for t, tk in zip(texts, toks)],
        columns=list(_FEATURE_COLS),
    )
    for c in _FEATURE_COLS:
        assert got[c].tolist() == want[c].tolist(), c
