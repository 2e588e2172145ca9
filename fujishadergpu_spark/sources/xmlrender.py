"""Shared grouped-document assembler for the XML connectors (sitemap,
RSS, Atom): entries roll up per file in deterministic ``order_key``
order — struct(order, rendered-entry) collected, sort_array'd, joined,
wrapped in the dialect's head/tail literals. One definition so the
ordering/determinism contract (rendered text is a pure function of
the entry RELATION, not of shuffle arrival) is fixed in one place.
Group payload is bounded by the protocols' own per-file caps (50k
URLs per sitemap; publisher-side feed caps)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def render_grouped_doc(
    entries: DataFrame,
    file_key: str,
    order_key: str,
    entry_expr: Column,
    head: str,
    tail: str,
    out_col: str = "xml",
) -> DataFrame:
    """(file_key, <out_col>) — one document per file."""
    per_file = (
        entries.select(
            F.col(file_key).alias("file_key"),
            F.struct(F.col(order_key).alias("_o"), entry_expr.alias("_e")).alias("_s"),
        )
        .groupBy("file_key")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("_s")), lambda s: s["_e"]), ""
            ).alias("_body")
        )
    )
    return per_file.select(
        "file_key",
        F.concat(F.lit(head), F.col("_body"), F.lit(tail)).alias(out_col),
    )
