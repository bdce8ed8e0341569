"""Incremental vs one-shot near-dedup cost as the corpus grows — the
measured evidence behind `incremental_dedup_batch`'s scale claim
(per-batch cost ∝ |batch|, never ∝ |corpus|).

Method: the dup-heavy documents corpus (the same derivation the
driver-checked dedup queries use) is split into K equal drops by
``doc_id % K`` — which strews each planted dup cluster ACROSS drops, the
adversarial arrival order. For each drop k we time

- ``incremental``: ``merge_dedup_labels(drop_k, root, k)`` — band the
  drop, probe the durable band index of drops 0..k-1, verify only the
  delta candidates, merge into the label snapshot (all durable I/O
  included — this is the real foreachBatch body); vs
- ``one-shot``: ``connected_components(corpus_0..k, lsh_verified_pairs
  (corpus_0..k))`` materialized — what a non-incremental pipeline would
  re-run per batch.

The one-shot leg re-bands and re-joins the ENTIRE corpus-so-far each
batch, so its cost grows with k while the incremental leg stays ~flat
(at toy scale both carry several seconds of fixed per-job scheduling
overhead; the separating signal is the TREND, and at 100 TB the one-shot
leg is simply not runnable per micro-batch). Caches are cleared between
timings — the dedup operators persist subplans and the CacheManager
matches by logical plan.

Usage: python scripts/incremental_dedup_bench.py [sf_dir_or_rows] [K]
(an all-digits first arg synthesizes a PREP_DEDUP-shaped corpus of that
many BASE rows instead of reading a testdata dir — the scale where the
one-shot leg's growth separates from per-job fixed overhead).
Writes BENCH_incremental_dedup_last_run.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k_drops = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from extract_address_ner_spark import entry_queries_streaming as ES
    from extract_address_ner_spark.entry_queries_data import dup_documents
    from extract_address_ner_spark.operators import dedup
    from extract_address_ner_spark.session import get_spark

    spark = get_spark(app_name="incremental-dedup-bench",
                      shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    work = tempfile.mkdtemp(prefix="incdedup_")
    rows = []
    try:
        if sf_dir.isdigit():
            from extract_address_ner_spark.sources.corpus import (
                synthesize_corpus,
            )

            n_base = int(sf_dir)
            base = synthesize_corpus(spark, n_base, seed=42, partitions=32) \
                .selectExpr("doc_id", "content AS text")
            base.createOrReplaceTempView("base")
            docs = spark.sql(f"""
              SELECT doc_id, text FROM base
              UNION ALL SELECT doc_id + {n_base} AS doc_id, text
                FROM base WHERE doc_id % 7 = 0
              UNION ALL SELECT doc_id + {2 * n_base} AS doc_id,
                'DUP ' || text AS text FROM base WHERE doc_id % 5 = 0
            """)
            sf_dir = f"synth:{n_base}"
        else:
            docs = dup_documents(spark, sf_dir).select("doc_id", "text")
        n_docs = docs.count()
        drops = []
        for k in range(k_drops):
            p = f"{work}/drop{k}"
            docs.filter(F.col("doc_id") % k_drops == k) \
                .coalesce(4).write.parquet(p)
            drops.append(p)
        root = f"{work}/dedup"

        for k in range(k_drops):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            ES.merge_dedup_labels(spark.read.parquet(drops[k]), root, k)
            t_inc = time.monotonic() - t0

            spark.catalog.clearCache()
            cum = spark.read.parquet(*drops[: k + 1])
            t0 = time.monotonic()
            full = dedup.connected_components(
                cum, dedup.lsh_verified_pairs(cum))
            n_full = full.count()
            t_one = time.monotonic() - t0

            n_batch = spark.read.parquet(drops[k]).count()
            rows.append({"batch": k, "batch_docs": n_batch,
                         "corpus_docs": int(cum.count()),
                         "incremental_s": round(t_inc, 2),
                         "oneshot_s": round(t_one, 2)})
            print(json.dumps(rows[-1]))
            assert n_full == rows[-1]["corpus_docs"]

        # the incremental chain must end at the one-shot labeling
        got = sorted(map(tuple, spark.read.parquet(
            f"{root}/labels/v{k_drops - 1}").collect()))
        want = sorted(map(tuple, full.select(
            "doc_id", "component_id").collect()))
        assert got == want, "incremental final labels != one-shot"
        print("FINAL_LABELS_MATCH")

        md = [
            "# Incremental vs one-shot near-dedup (last run)",
            "",
            f"corpus: dup_documents({sf_dir}) = {n_docs} docs, "
            f"{k_drops} drops by doc_id % {k_drops} "
            "(dup clusters strewn across drops); final labels verified "
            "equal. Methodology in scripts/incremental_dedup_bench.py.",
            "",
            "| batch | batch docs | corpus docs | incremental s | one-shot s |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            md.append(f"| {r['batch']} | {r['batch_docs']} | "
                      f"{r['corpus_docs']} | {r['incremental_s']} | "
                      f"{r['oneshot_s']} |")
        (REPO / "BENCH_incremental_dedup_last_run.md").write_text(
            "\n".join(md) + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
