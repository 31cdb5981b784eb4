"""Named column-transform registry — the reference's XmlFieldTransform /
TransformRegistry extension point (XmlFieldTransform.cs:17-38,
TransformRegistry.cs:17-70), re-expressed as pure Spark Column → Column
functions (so transform chains stay inside whole-stage codegen).

Reference semantics:
  - names are case-insensitive, chainable comma-separated
    (XmlEventQuery.Evaluate, XmlEventQuery.cs:109-131);
  - `notempty` throws on empty value (TrxNotEmpty.cs:30-38);
  - `unsigned` canonicalizes hex → decimal, throws on invalid
    (TrxUnsigned.cs:32-60)  → '0xa3fc' → '41980' (XmlTests.cs:139-144).

"Throws" becomes an error-column convention: invalid rows get NULL output
plus a populated `<name>_err` reason; callers route error rows to a
quarantine sink instead of killing the job (distributed-friendly
equivalent of an exception on a single-threaded row loop)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from eventanalysis_spark.functions.scalars import hex_or_dec

Transform = Callable[[Column], Column]
ErrCheck = Callable[[Column], Column]  # returns error-message column (null = ok)

_REGISTRY: dict[str, tuple[Transform, ErrCheck | None]] = {}


def register(name: str, fn: Transform, err: ErrCheck | None = None) -> None:
    _REGISTRY[name.lower()] = (fn, err)


def get(name: str) -> tuple[Transform, ErrCheck | None]:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown transform {name!r}; have {sorted(_REGISTRY)}") from None


def apply_chain(col: Column, chain: str | list[str]) -> tuple[Column, Column]:
    """Apply a comma-separated transform chain; returns (value, error).
    Error short-circuits: first failing transform wins, value is NULL."""
    names = [c.strip() for c in (chain.split(",") if isinstance(chain, str) else chain) if c.strip()]
    err: Column = F.lit(None).cast("string")
    val = col
    for nm in names:
        fn, check = get(nm)
        this_err = check(val) if check is not None else F.lit(None).cast("string")
        err = F.coalesce(err, this_err)
        val = fn(val)
    val = F.when(err.isNull(), val)
    return val, err


# ---- default registry (TransformRegistry.Default pre-registers these) -----

def _notempty_err(c: Column) -> Column:
    return F.when(c.isNull() | (c == ""), F.lit("notempty: value is empty"))


register("notempty", lambda c: c, _notempty_err)


def _unsigned_val(c: Column) -> Column:
    return hex_or_dec(c).cast("string")


def _unsigned_err(c: Column) -> Column:
    # explicit validity regex: F.conv would silently coerce bad hex to 0.
    # hex_or_dec uses try_cast, so out-of-int64-range values (e.g. a
    # 25-digit decimal) come back NULL rather than throwing under ANSI
    # mode — the second branch turns that NULL into an error row.
    valid = F.trim(c).rlike(r"^(0[xX][0-9a-fA-F]+|[0-9]+)$")
    nonempty = c.isNotNull() & (c != "")
    return (
        F.when(
            nonempty & ~valid,
            F.concat(F.lit("unsigned: invalid number '"), c, F.lit("'")),
        )
        .when(
            nonempty & hex_or_dec(c).isNull(),
            F.concat(F.lit("unsigned: out of range '"), c, F.lit("'")),
        )
        .when(hex_or_dec(c) < 0, F.lit("unsigned: negative"))
    )


register("unsigned", _unsigned_val, _unsigned_err)

# useful extras beyond the reference's two built-ins
register("trim", lambda c: F.trim(c))
register("lower", lambda c: F.lower(c))
register("upper", lambda c: F.upper(c))
register("emptynull", lambda c: F.nullif(c, F.lit("")))
