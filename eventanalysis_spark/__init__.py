"""eventanalysis_spark — a PySpark-native parse → enrich → route → aggregate
engine with the capabilities of ttelcl/EventAnalysis, recast over
Common-Crawl-style web pages.

The reference (/root/reference, read-only) is a Windows-event-log toolkit:
incremental ingest with a high-water mark, XML field dissection,
provider/task/opcode dictionary enrichment, rule-based filter/route,
grouped overviews and period rollups, monthly archives, CSV/JSON exports.
This package re-expresses every one of those capabilities Spark-first
(DataFrame/SQL + Arrow-vectorized pandas UDFs), per SURVEY.md §2.

Nothing here is a translation of the reference's C#/F# execution strategy;
citations in docstrings are parity pointers only.
"""

__version__ = "0.1.0"
