"""Export-job spec compiler — the reference's declarative extraction spec
(XmlExportJob.cs:20-69; richer planned syntax in
ExportDesign/example1.export-job.jsonc:1-25) compiled to a Spark `select`
list instead of a per-row XPath interpreter.

Spec JSON shape (mirrors the reference's `{jobname, events[], queries{}}`):

    {
      "jobname": "content-dump",
      "classes": ["article", "forum"],          # event-id filter analog (P5)
      "columns": {
        "page_url":  ":page:url",
        "page_host": ":sys:host",
        "version":   "unsigned,notempty:sys:ever_raw",
        "author":    ":data:ea:author",
        "reserved":  null                        # column reserved, always NULL
      }
    }

Expression grammar `[transforms]:section:field`:
  - optional comma-separated transform chain before the first ':'
    (registry semantics per functions/transforms.py);
  - section `sys`  → parsed header column (parse_pages output);
  - section `page` → raw pages column (url, warc_ts, lang, text, html);
  - section `data` → meta_map[key] lookup (MapData analog, `$XNN` names
    included) — mirrors the reference's `:sys:` / `:data:` / `:udata:`
    XPath shorthands (XmlDissector.cs:59-73);
  - `null` spec → reserved NULL column (absent-from-class reservation).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.functions import transforms as trx
from eventanalysis_spark.operators.parse import meta_map_udf

_SECTIONS = ("sys", "page", "data")


@dataclass
class ExportSpec:
    jobname: str
    classes: list[str] = field(default_factory=list)
    columns: dict[str, str | None] = field(default_factory=dict)

    @classmethod
    def from_json(cls, s: str) -> "ExportSpec":
        d = json.loads(s)
        return cls(
            jobname=d["jobname"],
            classes=list(d.get("classes", [])),
            columns=dict(d.get("columns", {})),
        )

    def to_json(self) -> str:
        return json.dumps(
            {"jobname": self.jobname, "classes": self.classes, "columns": self.columns},
            indent=2,
        )


def _parse_expr(expr: str) -> tuple[list[str], str, str]:
    """'[transforms]:section:field' → (chain, section, field)."""
    head, sep, rest = expr.partition(":")
    if not sep:
        raise ValueError(f"bad extract expression {expr!r}")
    chain = [t.strip() for t in head.split(",") if t.strip()]
    section, sep2, fld = rest.partition(":")
    if not sep2 or section not in _SECTIONS:
        raise ValueError(f"bad extract expression {expr!r} (section must be one of {_SECTIONS})")
    return chain, section, fld


def compile_spec(spec: ExportSpec, parsed: DataFrame,
                 with_errors: bool = True) -> DataFrame:
    """Compile a spec against a parse_pages(keep_payload=True) frame.

    Output: one column per spec entry (string-typed, like the reference's
    string-coerced XPath eval, XmlDissector.cs:56-58) + `_err` when any
    transform failed (quarantine-routing convention). Class filter is the
    reference's per-job event-id IN filter (AppPlcDump.fs:176)."""
    df = parsed
    if spec.classes:
        df = df.where(F.col("event_class").isin(spec.classes))

    needs_data = any(
        v is not None and _parse_expr(v)[1] == "data" for v in spec.columns.values()
    )
    if needs_data:
        df = df.withColumn("_meta_map", meta_map_udf(F.col("html")))

    out_cols: list[Column] = []
    err_cols: list[Column] = []
    for name, expr in spec.columns.items():
        if expr is None:
            out_cols.append(F.lit(None).cast("string").alias(name))
            continue
        chain, section, fld = _parse_expr(expr)
        if section == "sys" or section == "page":
            base = F.col(fld).cast("string")
        else:  # data
            base = F.element_at(F.col("_meta_map"), fld)
        # missing node → "" (XmlDissector.Eval contract: string() of absent
        # node is empty string, not null)
        base = F.coalesce(base, F.lit(""))
        if chain:
            val, err = trx.apply_chain(base, chain)
            err_cols.append(err.alias(f"__err_{name}"))
            out_cols.append(val.alias(name))
        else:
            out_cols.append(base.alias(name))

    keys = [F.col("url")]
    if with_errors and err_cols:
        err = F.coalesce(*err_cols) if len(err_cols) > 1 else err_cols[0]
        return df.select(*keys, *out_cols, err.alias("_err"))
    return df.select(*keys, *out_cols)
