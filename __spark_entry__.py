"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Correctness strategy: the pipeline input ``corpus(repo, path, commit, lang,
content)`` is derived from the driver's ``documents`` table by ONE shared SQL
template (extract_address_ner_spark.sources.corpus) that DuckDB can also run,
with Korean addresses planted at SQL-computable offsets — so even the NER
extraction / canonicalization / graph stages have exact SQL oracles (ground
truth by construction). The registry of (query, oracle) pairs lives in
extract_address_ner_spark/entry_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from extract_address_ner_spark import entry_queries as EQ  # noqa: E402
from extract_address_ner_spark import entry_queries_data  # noqa: E402,F401  (registers data-pipeline queries)
from extract_address_ner_spark import entry_queries_streaming  # noqa: E402,F401  (registers streaming queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus derivation + distributed mention extraction at
    sf0.001."""
    return EQ.q_mentions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return EQ.queries()


def oracle_sql() -> dict[str, str]:
    return EQ.oracle_sql()
