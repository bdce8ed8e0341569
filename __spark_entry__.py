"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Correctness strategy: the pipeline input ``corpus(repo, path, commit, lang,
content)`` is derived from the driver's ``documents`` table by ONE shared SQL
template (extract_address_ner_spark.sources.corpus) that DuckDB can also run,
with Korean addresses planted at SQL-computable offsets — so even the NER
extraction stages have exact SQL oracles (ground truth by construction).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from extract_address_ner_spark.operators.tagger import (  # noqa: E402
    extract_mentions,
    extract_mentions_pandas,
)
from extract_address_ner_spark.sources import corpus as C  # noqa: E402

DUCK_SHA = "sha256({})"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus derivation + distributed mention extraction at
    sf0.001."""
    corpus = C.corpus_from_documents(spark, "/root/testdata/sf0.001")
    return extract_mentions(corpus)


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def _q_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.corpus_from_documents(spark, sf_dir)


def _q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_mentions(C.corpus_from_documents(spark, sf_dir))


def _q_mentions_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_mentions_pandas(C.corpus_from_documents(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corpus_derivation": _q_corpus,
        "extract_mentions": _q_mentions,
        "extract_mentions_pandas": _q_mentions_pandas,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "corpus_derivation": C.corpus_sql(sha256_fn=DUCK_SHA),
        "extract_mentions": C.gold_mentions_sql(sha256_fn=DUCK_SHA),
        "extract_mentions_pandas": C.gold_mentions_sql(sha256_fn=DUCK_SHA),
    }
