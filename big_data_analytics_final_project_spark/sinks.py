"""Sinks — report-sized CSV, partitioned parquet, scalar summaries.

Mirrors the reference's output surface: single-file CSV with header
(SNK-2, reference spark_analysis.py:83,106,143), pandas-style CSV
(SNK-3), text summary of scalar results (SNK-4,
integrated_query_engagement_vs_spend.py:232-258), and the parquet
storage-zone writer that replaces batched HBase puts (SNK-1).

`coalesce(1)` is kept ONLY for report-sized results — at scale it
funnels the whole output through one task; `write_zone` is the real
sink (SURVEY.md OPT-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_report_csv(df: DataFrame, path: str) -> None:
    """Single-file CSV with header, overwrite — for human-sized results
    only (top-Ns, summaries)."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def write_zone(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Partitioned (optionally sorted) parquet zone — the layout that
    gives prefix-scan parity with the reference's HBase rowkey design
    (SURVEY.md OPT-3): partition on the cluster key, sort within files
    on the range key so min/max stats prune."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_summary_txt(lines: dict[str, object], path: str) -> None:
    """Driver-side scalar summary (report artifact, not an engine op)."""
    with open(path, "w") as f:
        for key, value in lines.items():
            f.write(f"{key}: {value}\n")
