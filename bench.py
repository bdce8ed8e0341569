"""Benchmark harness. Prints ONE JSON line:

    {"metric": "headline_suite_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "triples_per_sec": T, "n_triples": K, "corpus_rows": M}

Env:
    SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS        local[N] cores (default 32)
    SPARK_GRAFT_BENCH_ROWS  synthetic corpus rows for the triples/sec
                            measurement (default 200000)

Timing action is a noop-format write (forces full materialization of every
column, no sink IO). The triples/sec figure runs the full KG path (synthesize
→ extract → gate → canonicalize → edges) on a synthetic corpus with mega-repo
skew — the north-metric throughput. Scaling evidence (local[8] vs local[32])
is produced by scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from extract_address_ner_spark import entry_queries as EQ  # noqa: E402
from extract_address_ner_spark import entry_queries_data  # noqa: E402,F401
from extract_address_ner_spark.operators.canonicalize import (  # noqa: E402
    canonicalize_mentions,
)
from extract_address_ner_spark.operators.link import build_edges  # noqa: E402
from extract_address_ner_spark.operators.tagger import extract_mentions  # noqa: E402
from extract_address_ner_spark.operators.validate import road_address_gate  # noqa: E402
from extract_address_ner_spark.session import get_spark  # noqa: E402
from extract_address_ner_spark.sources.corpus import synthesize_corpus  # noqa: E402

HEADLINE = [
    "extract_mentions",
    "graph_edges",
    "canonicalize_mentions",
    "dedup_exact_groups",
    "dedup_lsh_pairs",
    "dedup_minhash_signatures",
    "ann_brute_topk",
    "text_quality_score",
    "events_windowed_counts",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    spark = get_spark(
        app_name="kg-construct-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qmap = EQ.queries()
    # warm-up: JVM / codegen / parquet footer caches (not timed)
    _materialize(qmap["extract_mentions"](spark, sf_dir))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qmap[name](spark, sf_dir)
        t0 = time.monotonic()
        _materialize(df)
        timings[name] = round(time.monotonic() - t0, 3)

    # north-metric throughput: full KG path on skewed synthetic corpus
    # (warm-up + best-of-2: single-shot timings of this plan are noisy —
    # first execution pays codegen for the fold expressions)
    def kg_path(rows, seed=42, parts=cpus * 8):
        c = synthesize_corpus(spark, rows, seed=seed, partitions=parts)
        return build_edges(
            canonicalize_mentions(road_address_gate(extract_mentions(c)))
        )

    kg_path(2000, seed=1, parts=cpus).count()  # warm-up, not timed
    triples_sec, n_triples = None, 0
    for _ in range(2):
        t0 = time.monotonic()
        n_triples = kg_path(bench_rows).count()
        dt = time.monotonic() - t0
        triples_sec = dt if triples_sec is None else min(triples_sec, dt)
    timings["kg_triples_synth"] = round(triples_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
                "corpus_rows": bench_rows,
                "n_triples": n_triples,
                "triples_per_sec": round(n_triples / triples_sec, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
