"""Attribute the sub-second query drift (VERDICT r04 #4).

r04 readings for text_quality_score / events_windowed_counts /
ann_brute_topk / canonicalize_mentions sat 1.5-1.9x above their r01 quiet
baselines with clean-but-borderline bus probes. Two candidate causes:

- shared-JVM pollution: in bench.py these queries run AFTER ~10 other plan
  shapes in the same JVM (code-cache pressure, megamorphic call sites) —
  r01 ran a much smaller registry before them;
- genuine operator regressions.

This probe separates the two by timing ONLY the drifted queries in a fresh
JVM (warm-up then N timed trials, cache cleared between trials, a bus
probe BEFORE EVERY trial plus one after the last — a storm that arrives
and leaves inside the window is flagged, not laundered into a clean
reading; round-5 code review). If fresh-JVM solo times
return to ~r01 levels while in-suite times stay high, the drift is JVM
profile pollution — a fixed per-suite cost that amortizes to zero at 100 TB
— not an operator regression.

Usage: python scripts/drift_probe.py [sf_dir] [n_trials]
Prints one JSON line {query: {"best": s, "median": s, "trials": [...],
"bw": [per-trial pre rates..., post], "contended": bool}}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from extract_address_ner_spark import entry_queries as EQ  # noqa: E402
from extract_address_ner_spark import entry_queries_data  # noqa: E402,F401
from extract_address_ner_spark.session import get_spark  # noqa: E402
from scripts.hostbw import copy_gbps, median_of, wait_for_bw  # noqa: E402

DRIFTED = [
    "text_quality_score",
    "events_windowed_counts",
    "ann_brute_topk",
    "canonicalize_mentions",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="drift-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qmap = EQ.all_queries()
    wait_for_bw(min_gbps=3.0, max_wait_s=120)
    out = {}
    for name in DRIFTED:
        fn = qmap[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        trials, bws = [], []
        for _ in range(n_trials):
            bws.append(copy_gbps(samples=1))  # probe EVERY trial boundary
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(round(time.monotonic() - t0, 3))
        bws.append(copy_gbps(samples=1))
        out[name] = {
            "best": min(trials),
            "median": median_of(trials),
            "trials": trials,
            "bw": [round(b, 1) for b in bws],
            "contended": min(bws) < 3.0,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
