"""Unicode normalization — the canonicalization step before dedup/quality.

Web text arrives in mixed Unicode forms: the same visible string can be
composed ("é" U+00E9) or decomposed ("e" + U+0301), which breaks exact
dedup hashes, shingle matching, token counting, and blocklist filters.
Normalizing every document to NFC (the web canonical form, per WHATWG)
before hashing makes byte comparisons mean codepoint-sequence
comparisons.

Spark shape: one Arrow-vectorized pandas UDF (`Series.str.normalize` —
the ICU-equivalent C path inside pandas, not per-row Python), narrow
projection, no shuffle; composes in front of `dedup.drop_exact_duplicates`
or the parse wide pass. NFC leaves already-normalized ASCII untouched, so
the common-case cost is one pass over the bytes.

Cross-engine: DuckDB's `nfc_normalize()` implements the same Unicode
canonical composition, so results are oracle-checkable byte-for-byte
(both engines hash the UTF-8 bytes with md5 for bounded comparison).

The reference engine has no comparable operator (its XML layer assumes
normalized input); part of the text-analysis surface the brief makes
first-class.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _normalize_series_fn(form: str):
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown unicode form {form!r}")

    def fn(s: pd.Series) -> pd.Series:
        # pandas' .str.normalize is the vectorized path; nulls pass through
        return s.str.normalize(form)

    return fn


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Column expression: `col` normalized to the given Unicode form via
    an Arrow-batched pandas UDF (the engine's slow-path rules: vectorized,
    never per-row Python)."""
    col = F.col(col) if isinstance(col, str) else col
    udf = F.pandas_udf(_normalize_series_fn(form), StringType())
    return udf(col)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
    changed_col: str = "nfc_changed",
) -> DataFrame:
    """Adds the normalized text column (in place by default) plus a
    `changed` flag. The flag costs nothing extra — both sides of the
    comparison are already in the projection."""
    out_col = out_col or text_col
    norm = unicode_normalize(F.col(text_col), form)
    return df.withColumn("__norm", norm).withColumn(
        changed_col, F.col("__norm") != F.col(text_col)
    ).withColumn(out_col, F.col("__norm")).drop("__norm")


def normalize_py(text: str, form: str = "NFC") -> str:
    """Pure-python twin for property tests (same unicodedata tables the
    pandas path uses)."""
    return unicodedata.normalize(form, text)
