"""Sub-stage isolation for the MinHash/LSH dedup chain (guide §1.4): time
each prefix of the pipeline with the noop sink so the expensive stage is
identified, not guessed. Usage: python scripts/dedup_stage_probe.py [sf_dir].
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from extract_address_ner_spark.entry_queries_data import (  # noqa: E402
    dup_documents,
)
from extract_address_ner_spark.operators import dedup  # noqa: E402
from extract_address_ner_spark.session import get_spark  # noqa: E402


def timed(spark, name, df, trials=2):
    df.write.format("noop").mode("overwrite").save()  # warm-up
    ts = []
    for t in range(trials):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} t{t}")
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        ts.append(round(time.monotonic() - t0, 3))
    print(f"{name:35s} best={min(ts):7.3f} trials={ts}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dedup-stage-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = dup_documents(spark, sf_dir)
    timed(spark, "0 dup_documents scan", docs)
    timed(spark, "1 with_shingles", dedup.with_shingles(docs).select(
        "doc_id", "_shingles"))
    timed(spark, "1b n_shingles only", dedup.with_shingles(docs).select(
        "doc_id", F.size("_shingles").alias("n")))
    timed(spark, "2 with_shingle_hashes", dedup.with_shingle_hashes(
        docs).select("doc_id", "_hs"))
    sig = dedup.minhash_sig_expr("_hs")
    timed(spark, "3 sig array", dedup.with_shingle_hashes(docs).select(
        "doc_id", F.expr(sig).alias("_sig")))
    timed(spark, "4 minhash_signatures (explode)",
          dedup.minhash_signatures(docs))
    timed(spark, "5 lsh_band_table", dedup.lsh_band_table(docs))
    timed(spark, "6 lsh_candidate_pairs", dedup.lsh_candidate_pairs(docs))
    timed(spark, "7 lsh_verified_pairs", dedup.lsh_verified_pairs(docs))
    # components + keeper on top of verified pairs (the near_keep suffix)
    spark.catalog.clearCache()
    t0 = time.monotonic()
    pairs = dedup.lsh_verified_pairs(docs)
    comp = dedup.connected_components(docs, pairs)
    comp.write.format("noop").mode("overwrite").save()
    print(f"{'8 verified+components (cold)':35s} best={time.monotonic() - t0:7.3f}",
          flush=True)
    spark.catalog.clearCache()
    t0 = time.monotonic()
    kept = dedup.dedup_near(docs)
    kept.select("doc_id").write.format("noop").mode("overwrite").save()
    print(f"{'9 dedup_near full (cold)':35s} best={time.monotonic() - t0:7.3f}",
          flush=True)


if __name__ == "__main__":
    main()
