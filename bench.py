"""Benchmark harness. Prints ONE JSON line:

    {"metric": "headline_suite_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "triples_per_sec": T, "n_triples": K, "corpus_rows": M,
     "triples_per_sec_lc": T2}

triples_per_sec runs the KG path in ONE local[cpus] JVM (round-comparable
series); triples_per_sec_lc runs the SAME job on the same total cores in
the DEPLOYMENT shape — real multi-process executors via the local-cluster
master (one quota-sized worker JVM per 8 cores), which avoids the
single-JVM thread-scaling wall documented in BENCH.md's contention probe.

Env:
    SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS        local[N] cores (default 32)
    SPARK_GRAFT_BENCH_ROWS  synthetic corpus rows for the triples/sec
                            measurement (default 200000)
    SPARK_GRAFT_BW_GATE     set to 0 to skip the memory-bus quiet gate
                            (scripts/hostbw.py) — rates are still recorded
                            in kg_bus_gbps_pre_post so contaminated runs
                            stay visible

Timing action is a noop-format write (forces full materialization of every
column, no sink IO). Methodology: per-query warm-up run (codegen/JIT, a
one-off per-plan cost that amortizes to zero at 100 TB) then best-of-2, with
the cache cleared between runs so persist()-sharing operators do real work.
The triples/sec figure runs the full KG path (synthesize → extract → gate →
canonicalize → edges) on a synthetic corpus with mega-repo skew in a FRESH
subprocess JVM (spark-submit-faithful; avoids cross-plan JIT profile
pollution), best-of-3. Scaling evidence (local[8] vs local[32]) is produced
by scripts/scaling_bench.py → BENCH.md.
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
from extract_address_ner_spark.session import get_spark  # noqa: E402
from scripts.hostbw import wait_for_bw  # noqa: E402

HEADLINE = [
    "extract_mentions",
    "extract_mentions_from_code",
    "graph_edges",
    "canonicalize_mentions",
    "dedup_exact_groups",
    "dedup_lsh_pairs",
    "dedup_lsh_verified_pairs",
    "dedup_minhash_signatures",
    "ann_brute_topk",
    "text_quality_score",
    "events_windowed_counts",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _wait_quiet(threshold: float = 3.0, max_wait_s: int = 120) -> float:
    """Bounded wait for a quiet host window (shared sandbox hardware: outside
    load swings 0-18 runnable threads and inflates wall times up to 4x).
    Returns the 1-min loadavg when proceeding."""
    waited = 0
    load = float(Path("/proc/loadavg").read_text().split()[0])
    while load > threshold and waited < max_wait_s:
        time.sleep(15)
        waited += 15
        load = float(Path("/proc/loadavg").read_text().split()[0])
    return load


_KG_RUNNER = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from extract_address_ner_spark.session import get_spark
from extract_address_ner_spark.operators.tagger import extract_mentions
from extract_address_ner_spark.operators.validate import road_address_gate
from extract_address_ner_spark.operators.canonicalize import canonicalize_mentions
from extract_address_ner_spark.operators.link import build_edges
from extract_address_ner_spark.sources.corpus import synthesize_corpus

cpus, rows = int(sys.argv[1]), int(sys.argv[2])
mode = sys.argv[3] if len(sys.argv) > 3 else "local"
parts = cpus * 8
conf = {{"spark.ui.showConsoleProgress": "false"}}
if mode == "lc":
    # deployment shape: REAL multi-process executors (local-cluster master,
    # one quota-sized worker JVM per executor) on the SAME total cores —
    # avoids the single-JVM thread-scaling wall (BENCH.md contention probe)
    n_exec, exec_cores = max(1, cpus // 8), 8
    master = f"local-cluster[{{n_exec}},{{exec_cores}},16384]"
    conf["spark.executor.memory"] = "14g"
    conf["spark.executor.extraJavaOptions"] = (
        f"-XX:ParallelGCThreads={{exec_cores}} -XX:ConcGCThreads=2"
        f" -XX:ActiveProcessorCount={{exec_cores}}")
else:
    master = f"local[{{cpus}}]"
spark = get_spark(app_name="kg-bench", master=master,
                  shuffle_partitions=parts, extra_conf=conf)

# The measured job READS the corpus from parquet (the north-rule job
# consumes an Iceberg corpus table — a columnar scan is the real workload
# shape); synthesis + write is untimed prep.
corpus_dir = tempfile.mkdtemp(prefix="kg_bench_corpus_")
synthesize_corpus(spark, rows, seed=42, partitions=parts) \
    .write.mode("overwrite").parquet(corpus_dir)
corpus = spark.read.parquet(corpus_dir)

def kg(c):
    return build_edges(
        canonicalize_mentions(road_address_gate(extract_mentions(c))))

kg(corpus.limit(20000)).count()  # warm-up (codegen/JIT), not timed
# best-of-3: the sandbox host is shared — min over trials is the
# least-contended estimate. Each trial additionally waits for a
# measured-quiet memory bus (co-tenant bandwidth pressure is invisible to
# loadavg//proc/stat — scripts/hostbw.py) and records the pre/post rates.
from scripts.hostbw import copy_gbps, wait_for_bw
best, n, bw_at_best = None, 0, (0.0, 0.0)
for _ in range(3):
    bw_pre = wait_for_bw(max_wait_s=120)
    t0 = time.monotonic()
    n = kg(corpus).count()
    dt = time.monotonic() - t0
    bw_post = copy_gbps()
    if best is None or dt < best:
        best, bw_at_best = dt, (bw_pre, bw_post)
print(json.dumps({{"n_triples": n, "sec": round(best, 3),
                   "bw_gbps": [round(bw_at_best[0], 1),
                               round(bw_at_best[1], 1)]}}))
spark.stop()
import shutil
shutil.rmtree(corpus_dir, ignore_errors=True)
"""


def _kg_subprocess(rows: int, cpus: int, mode: str = "local") -> dict:
    import subprocess

    repo = str(Path(__file__).resolve().parent)
    out = subprocess.run(
        [sys.executable, "-c", _KG_RUNNER.format(repo=repo), str(cpus),
         str(rows), mode],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


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
    # Steady-state measurement: every query gets one untimed warm-up run
    # (Janino codegen compile + JIT of the generated classes — a one-off
    # per-plan driver/JVM cost that amortizes to zero over a 100 TB run)
    # then best-of-2 timed runs. Single-shot cold timings on a shared
    # local-mode JVM vary 5-10x with code-cache/JIT state and measure the
    # compiler, not the operator.
    _wait_quiet()
    wait_for_bw(max_wait_s=120)  # bus-quiet too — loadavg can't see
                                 # co-tenant memory pressure (hostbw.py)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        _materialize(qmap[name](spark, sf_dir))  # warm-up, not timed
        best = None
        for _ in range(2):
            # operators persist() shared subplans (e.g. LSH bands for the
            # self-join); CacheManager would hand the NEXT run those blocks
            # by plan identity, so the timed run would skip the real work
            spark.catalog.clearCache()
            df = qmap[name](spark, sf_dir)
            t0 = time.monotonic()
            _materialize(df)
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # north-metric throughput: full KG path on skewed synthetic corpus,
    # measured in a FRESH subprocess JVM (exactly how the job ships:
    # spark-submit = fresh JVM per run). Running it in this session's JVM
    # after ~30 other query shapes measures JIT profile pollution, not the
    # operator: identical back-to-back runs were observed at 68s -> 20s ->
    # 12s -> 7s as tiered compilation recovered from megamorphic call sites.
    spark.stop()
    # the suite's own JVM shutdown + co-tenant load right after it is the
    # most contended moment of the run — give the north-metric measurement
    # a longer quiet-window budget (measured 18.7s vs 3.3s for the same job
    # contended vs quiet)
    _wait_quiet(threshold=2.0, max_wait_s=300)
    kg = _kg_subprocess(bench_rows, cpus)
    n_triples = kg["n_triples"]
    triples_sec = kg["sec"]
    timings["kg_triples_synth"] = round(triples_sec, 3)
    bw_gbps = kg.get("bw_gbps")
    # same job, same total cores, DEPLOYMENT shape: multi-process executors
    # (local-cluster) instead of one big-thread-count JVM — recorded as a
    # separate series so the one-JVM number stays round-comparable.
    # Best-effort: local-cluster spawns worker JVMs, which is environment-
    # sensitive — a failure here must not take down the whole bench report.
    try:
        kg_lc = _kg_subprocess(bench_rows, cpus, mode="lc")
    except Exception:
        kg_lc = None
    # reported as separate fields, NOT added to the suite total, so
    # headline_suite_sec stays comparable across rounds

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
                "triples_per_sec_lc": round(
                    kg_lc["n_triples"] / kg_lc["sec"], 1) if kg_lc else None,
                "kg_bus_gbps_pre_post": bw_gbps,
                "kg_lc_bus_gbps_pre_post": kg_lc.get("bw_gbps")
                if kg_lc else None,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
