"""Extra measurement harness for the optimization round (guide §1).

NOT the round-of-record bench (bench.py is frozen for measurement): this
file exists to isolate per-query cost with the noop sink, label jobs, and
dump .explain("formatted") plans, without bench.py's bus-probe machinery.

Usage:
    python bench_extra.py [sf_dir] [--trials N] [--plans DIR] [q ...]

Prints one JSON line: {"sf_dir": ..., "queries": {name: {"best": s,
"median": s, "trials": [...]}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from extract_address_ner_spark import entry_queries as EQ  # noqa: E402
from extract_address_ner_spark import entry_queries_data  # noqa: E402,F401
from extract_address_ner_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "extract_mentions",
    "extract_mentions_from_code",
    "graph_edges",
    "canonicalize_mentions",
    "dedup_exact_groups",
    "dedup_lsh_pairs",
    "dedup_lsh_verified_pairs",
    "dedup_near_keep",
    "dedup_minhash_signatures",
    "ann_brute_topk",
    "text_quality_score",
    "events_windowed_counts",
    "events_asof_join",
    "graph_pagerank",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    trials = 2
    plans_dir = None
    suffix = "before"
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = Path(args[i + 1])
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:] if len(args) > 1 else DEFAULT_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qmap = EQ.all_queries()
    out: dict[str, dict] = {}
    for name in names:
        if plans_dir is not None:
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = qmap[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}_{suffix}.txt").write_text(plan)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for t in range(trials):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"trial{t}: {name}")
            t0 = time.monotonic()
            qmap[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = {
            "best": min(ts),
            "median": round(statistics.median(ts), 3),
            "trials": ts,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
