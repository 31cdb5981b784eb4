"""U1/U2 — duplicate-key conflict semantics.

Reference: ConflictMode.cs:17-33 (`Default` error / `Replace` last-wins /
`Ignore` first-wins via INSERT OR …), upserts RawEventDbV1.cs:336-379,
tested DbTests.cs:385-398.

Under parallelism "first/last" by arrival order is meaningless, so wins
are defined by an explicit deterministic version order — (warc_ts, url)
unless overridden (SURVEY.md §7.3). Implemented with max_by/min_by-style
struct ordering, not a row_number window: a single hash aggregate on the
key, no global sort, skew-tolerant via AQE.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConflictMode(str, Enum):
    DEFAULT = "default"  # duplicate key → error
    REPLACE = "replace"  # last wins (by version order)
    IGNORE = "ignore"    # first wins


class DuplicateKeyError(ValueError):
    pass


def _pick(df: DataFrame, keys: list[str], order_by: list[str], last: bool) -> DataFrame:
    value_cols = [c for c in df.columns if c not in keys]
    ver = F.struct(*[F.col(c) for c in order_by])
    agg = F.max_by(F.struct(*value_cols), ver) if last else F.min_by(
        F.struct(*value_cols), ver
    )
    g = df.groupBy(*keys).agg(agg.alias("__v"))
    return g.select(*keys, *[F.col(f"__v.{c}").alias(c) for c in value_cols])


def resolve_conflicts(
    df: DataFrame,
    keys: list[str],
    mode: ConflictMode | str = ConflictMode.DEFAULT,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Collapse duplicate keys per the mode. DEFAULT raises if any dup
    exists (count-check, the distributed analog of a PK violation)."""
    mode = ConflictMode(mode)
    order_by = order_by or ["warc_ts", "url"]
    if mode is ConflictMode.DEFAULT:
        dups = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .limit(5)
            .collect()
        )
        if dups:
            raise DuplicateKeyError(
                f"duplicate keys in {keys}: {[tuple(r[k] for k in keys) for r in dups]}"
            )
        return df
    return _pick(df, keys, order_by, last=(mode is ConflictMode.REPLACE))


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    mode: ConflictMode | str = ConflictMode.REPLACE,
    order_by: list[str] | None = None,
) -> DataFrame:
    """U2: MERGE-INTO semantics without a table format that supports it —
    anti-join + union + per-mode pick. (On Iceberg this is a single
    `MERGE INTO`; this composition is the jar-free equivalent and keeps
    identical results.)

    REPLACE: matched rows take the incoming value; IGNORE: existing kept,
    only brand-new keys appended."""
    mode = ConflictMode(mode)
    incoming = resolve_conflicts(
        incoming, keys, ConflictMode.REPLACE if mode is not ConflictMode.IGNORE else ConflictMode.IGNORE,
        order_by,
    )
    if mode is ConflictMode.IGNORE:
        new_only = incoming.join(existing.select(*keys), keys, "left_anti")
        return existing.unionByName(new_only, allowMissingColumns=True)
    kept = existing.join(incoming.select(*keys), keys, "left_anti")
    return kept.unionByName(incoming, allowMissingColumns=True)
