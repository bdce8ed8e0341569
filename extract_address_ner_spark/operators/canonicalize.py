"""Canonicalization against the admin-region dictionary (SURVEY.md §2.9).

A mention's first token is resolved against the broadcast si/do dimension
(canonical names + aliases, e.g. 서울시 → 서울특별시); the canonical address
string substitutes the canonical region name, and the canonical id is the
'/'-joined normalized form. Emits the region link used for the
``(address, located_in, admin_region)`` triples.

Physical strategy: the dimension is tiny (tens of rows) → ``F.broadcast``
hash join, no shuffle of the fact side, regardless of fact-table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.admin_regions import ADMIN_REGIONS


def region_lookup_df(spark: SparkSession) -> DataFrame:
    """(lookup_name → canonical_name, region_id) for every top-level region
    name and alias."""
    rows = []
    for rid, name, _level, parent, aliases in ADMIN_REGIONS:
        if parent is None:
            rows.append((name, name, rid))
            for a in aliases:
                rows.append((a, name, rid))
    return spark.createDataFrame(
        rows, "lookup_name string, canonical_name string, region_id string"
    )


def canonicalize_mentions(
    mentions: DataFrame, addr_col: str = "mention_text"
) -> DataFrame:
    """Adds ``canonical_addr``, ``canonical_id``, ``region_id``. Mentions
    whose first token is not a known top-level region keep NULLs (left join)
    and are excluded from linking downstream.

    Alias expansion replaces only the leading region token; the rest of the
    mention is carried verbatim (substr past the first token)."""
    spark = mentions.sparkSession
    dim = F.broadcast(region_lookup_df(spark))
    first_tok = F.split(F.col(addr_col), " ").getItem(0)
    out = (
        mentions.withColumn("_first_tok", first_tok)
        .join(dim, F.col("_first_tok") == dim["lookup_name"], "left")
        .drop("lookup_name")
    )
    canonical_addr = F.when(
        F.col("canonical_name").isNotNull(),
        F.concat(
            F.col("canonical_name"),
            F.expr(f"substr({addr_col}, length(_first_tok) + 1)"),
        ),
    )
    return (
        out.withColumn("canonical_addr", canonical_addr)
        .withColumn(
            "canonical_id",
            F.when(
                F.col("canonical_addr").isNotNull(),
                F.concat(
                    F.lit("kaddr:"),
                    F.regexp_replace(F.col("canonical_addr"), " ", "/"),
                ),
            ),
        )
        .drop("_first_tok", "canonical_name")
    )
