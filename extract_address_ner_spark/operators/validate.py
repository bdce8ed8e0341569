"""Address validation operators.

Two gates:

1. ``validate_addresses`` — FAITHFUL replica of the reference's
   ``validate_address_pattern`` (reference: app/utils/preprocess.py:282-295):
   the three alternation regexes over Korean admin suffixes, any-match →
   (is_valid, confidence 0.85/0.15). NB (discovered, preserved): these
   patterns require a 동/읍/면 component, so they REJECT the reference's own
   road-name positive samples and accept e.g. "서울시 강동구" — replicated
   exactly, exposed as its own operator, but NOT used as the pipeline's
   precision gate.

2. ``road_address_gate`` — the structural precision gate the pipeline
   actually uses before canonicalization/linking: a mention must have ≥ 3
   whitespace tokens and contain a road/lot component (token ending 로/길, or
   번지/번길 lot token). All planted full addresses pass; bare-region and
   two-token fragments are dropped.

Both are pure built-in expressions (rlike / split / exists) — JVM-side,
no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Verbatim from reference app/utils/preprocess.py:284-288 (no backslashes, so
# no SQL-literal escaping concerns).
VALID_PATTERNS = [
    "(.+[시군구])(.+[동읍면])(.+[길로])?(.+[번지번길])?",
    "(.+도)(.+[시군])(.+[동읍면])(.+[길로])?(.+[번지번길])?",
    "(.+[특별시광역시])(.+[구])(.+[동])(.+[길로])?(.+[번지번길])?",
]


def is_valid_address_col(addr: Column) -> Column:
    c = F.lit(False)
    for p in VALID_PATTERNS:
        c = c | addr.rlike(p)
    return c


def validate_addresses(df: DataFrame, addr_col: str = "mention_text") -> DataFrame:
    """reference: POST /validate-address handler, app/main.py:121-141 —
    adds ``is_valid`` and ``valid_confidence`` (0.85/0.15 hard-coded,
    preprocess.py:291-293)."""
    valid = is_valid_address_col(F.col(addr_col))
    return df.withColumn("is_valid", valid).withColumn(
        "valid_confidence",
        F.when(valid, F.lit(0.85)).otherwise(F.lit(0.15)),
    )


# Structural gate: a road/lot token somewhere in the mention.
ROAD_TOKEN_REGEX = "^(?:\\\\S+[로길]|\\\\d+(?:-\\\\d+)?(?:번지|번길))$"


def road_address_gate(
    df: DataFrame, addr_col: str = "mention_text", min_tokens: int = 3
) -> DataFrame:
    """Keep only structurally-complete road addresses. Pure SQL: split +
    exists() higher-order predicate — narrow, codegen-friendly."""
    toks = f"split({addr_col}, ' ')"
    return df.filter(
        F.expr(
            f"size(filter({toks}, t -> length(t) > 0)) >= {min_tokens} AND "
            f"exists({toks}, t -> t RLIKE '{ROAD_TOKEN_REGEX}')"
        )
    )


def append_training_data(
    df: DataFrame, table_dir: str, run_ts: str, addr_col: str = "mention_text"
) -> None:
    """Append validation verdicts to the ``training_data`` table
    (reference DDL db_service.py:44-50; the write-on-read side effect of
    POST /validate-address, app/main.py:133). ``run_ts`` is a caller-supplied
    ISO timestamp — never wall-clock inside the job (FIXTURES.md).
    Parquet-dir append ≙ one Iceberg snapshot commit per batch."""
    from pyspark.sql import functions as F  # local alias for clarity

    (
        feedback_sink(df, addr_col)
        .withColumn("created_at", F.lit(run_ts).cast("timestamp"))
        .write.mode("append")
        .parquet(table_dir)
    )


def feedback_sink(df: DataFrame, addr_col: str = "mention_text") -> DataFrame:
    """The reference persists every validation request as training data with
    text = address (write-on-read side effect, app/main.py:133 →
    db_service.py:68-80). Reproduced as an optional sink projection matching
    the training_data DDL (db_service.py:44-50); created_at is the caller's
    run timestamp parameter downstream — never wall-clock inside the job
    (FIXTURES.md)."""
    v = validate_addresses(df, addr_col)
    return v.select(
        F.col(addr_col).alias("text"),
        F.col(addr_col).alias("address"),
        F.col("is_valid"),
    )
