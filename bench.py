"""Benchmark harness. Prints ONE JSON line:

    {"metric": "headline_suite_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "triples_per_sec": T, "n_triples": K, "corpus_rows": M,
     "triples_per_sec_lc": T2,
     "contended_queries": [...names with no clean-bus trial...],
     "query_bus_gbps": {name: [pre, post] or [pre, post, during_min]},
     "query_stats": {name: {"best": s, "median": s, "n_trials": n}},
     "kg_bus_gbps_pre_post": [...], "kg_lc_bus_gbps_pre_post": [...],
     "kg_lc_error": null}

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

Contention robustness (round 3): every timed trial is bracketed by memcpy
bus probes (scripts/hostbw.py — co-tenant memory-bandwidth pressure is
invisible to loadavg and /proc/stat but slows Spark 2-10x). A trial is
CLEAN iff both pre and post rates are >= 3.0 GB/s (the host's quiet state
reads 4.5-5.8; the catastrophic co-tenant state reads 0.1-0.5). Queries
with no clean trial after the first pass are re-queued for up to two
bounded retry passes later in the run (pressure arrives in storms — later
is usually quieter); if still no clean trial, the best contaminated time is
reported WITH a per-query entry in "contended_queries" so a contaminated
number is never silently the headline. Per-query pre/post rates at the
reported trial are emitted in "query_bus_gbps".
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
from scripts.hostbw import (  # noqa: E402
    BusMonitor,
    copy_gbps,
    median_of,
    wait_for_bw,
)

# A trial is clean iff pre AND post bus rates are >= this (GB/s). The host's
# bimodal states: 4.5-5.8 quiet, 2.4-2.9 sustained-moderate, 0.1-0.5
# catastrophic. 3.0 accepts only the quiet state for the round-of-record
# numbers; sustained-moderate runs get flagged rather than silently recorded.
BW_CLEAN_GBPS = 3.0

# Global wall-clock budget: the quiet-window waits (initial + retry passes +
# per-kg-trial) must never compound into an unbounded run — when the host
# sits in its sustained-moderate state for an hour, EVERY wait runs to its
# cap. Once the budget is spent, remaining waits shrink to zero and retry
# passes are skipped; honesty is preserved by the contended flags instead.
_BENCH_T0 = time.monotonic()
BENCH_BUDGET_S = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1500"))


def _remaining_s() -> float:
    return max(0.0, BENCH_BUDGET_S - (time.monotonic() - _BENCH_T0))


def _wait_budget(spec_s: int) -> int:
    return int(min(spec_s, _remaining_s()))

HEADLINE = [
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
    # round 5: the r04/r05 operator additions join the perf record — the
    # suite total grows by their cost; cross-round comparisons use the
    # shared-query subset (query_stats carries per-query numbers)
    "events_asof_join",
    "graph_pagerank",
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
wait_budget_s = float(sys.argv[4]) if len(sys.argv) > 4 else 360.0
CLEAN = float(sys.argv[5]) if len(sys.argv) > 5 else 3.0
parts = cpus * 8
conf = {{"spark.ui.showConsoleProgress": "false"}}
if mode == "lc":
    # deployment shape: REAL multi-process executors (local-cluster master,
    # one quota-sized worker JVM per executor) on the SAME total cores —
    # avoids the single-JVM thread-scaling wall (BENCH.md contention probe).
    # exec_cores = largest divisor of cpus that is <= 8, so n_exec *
    # exec_cores == cpus exactly for ANY cpu count (the lc series stays
    # same-total-cores comparable with the local[cpus] series).
    exec_cores = max(d for d in range(1, min(cpus, 8) + 1) if cpus % d == 0)
    n_exec = cpus // exec_cores
    master = f"local-cluster[{{n_exec}},{{exec_cores}},16384]"
    # heap ∝ cores (what a cgroup-aware container JVM gets): 14g per
    # 8-core executor, scaled down for narrower executors
    conf["spark.executor.memory"] = f"{{max(2, 14 * exec_cores // 8)}}g"
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
# Contention-robust trials: a trial is CLEAN iff pre AND post memcpy bus
# rates are >= 3.0 GB/s (co-tenant bandwidth pressure is invisible to
# loadavg//proc/stat — scripts/hostbw.py). Base 3 trials; keep retrying
# (bounded at 6) until at least one clean trial exists, so a storm that
# catches the first trials doesn't become the round-of-record number. If no
# trial is ever clean, report the best contaminated time WITH
# contended=true so the caller can flag it instead of headlining it.
from scripts.hostbw import BusMonitor, copy_gbps, wait_for_bw
# A trial is clean iff the bracketing probes read >= CLEAN *and* the
# in-trial minimum rate never fell below DURING_FLOOR. The endpoint probes
# are blind to a storm that arrives and leaves INSIDE the trial (observed:
# a 24 s run — 8x the quiet time — with 3.3/3.1 GB/s endpoints); the
# in-trial floor catches it. The floor is far below the endpoint bar
# because our own 32-thread job legitimately depresses the probe (own-load
# readings measured 0.3-2.8); only the catastrophic co-tenant state reads
# 0.1-0.2.
DURING_FLOOR = 0.25
best, best_clean, n = None, None, 0
during_at_best, during_at_clean = None, None
bw_at_best, bw_at_clean = (0.0, 0.0), (0.0, 0.0)
trials = []
for trial in range(6):
    if trial >= 3 and best_clean is not None:
        break
    # per-trial wait comes out of a TOTAL budget the caller sized from its
    # remaining bench budget — 6 trials can never compound into 6 full waits
    w0 = time.monotonic()
    bw_pre = wait_for_bw(min_gbps=CLEAN,
                         max_wait_s=int(min(120, max(0, wait_budget_s))))
    wait_budget_s -= time.monotonic() - w0
    t0 = time.monotonic()
    with BusMonitor() as mon:
        n = kg(corpus).count()
    dt = time.monotonic() - t0
    time.sleep(1.0)  # let our own JVM's post-stage GC churn settle so the
    # post probe reads HOST pressure, not our wind-down
    bw_post = copy_gbps()
    during = mon.min_rate
    trials.append(round(dt, 3))
    if best is None or dt < best:
        best, bw_at_best, during_at_best = dt, (bw_pre, bw_post), during
    if (bw_pre >= CLEAN and bw_post >= CLEAN
            and (during is None or during >= DURING_FLOOR)
            and (best_clean is None or dt < best_clean)):
        best_clean, bw_at_clean, during_at_clean = dt, (bw_pre, bw_post), during
sec, bw, during = (best_clean, bw_at_clean, during_at_clean) \
    if best_clean is not None else (best, bw_at_best, during_at_best)
print(json.dumps({{"n_triples": n, "sec": round(sec, 3),
                   "contended": best_clean is None,
                   "trials": trials,
                   "bw_during_min": round(during, 1)
                   if during is not None else None,
                   "bw_gbps": [round(bw[0], 1), round(bw[1], 1)]}}))
spark.stop()
import shutil
shutil.rmtree(corpus_dir, ignore_errors=True)
"""


def _kg_subprocess(rows: int, cpus: int, mode: str = "local",
                   wait_budget_s: int = 360) -> dict:
    import subprocess

    repo = str(Path(__file__).resolve().parent)
    out = subprocess.run(
        [sys.executable, "-c", _KG_RUNNER.format(repo=repo), str(cpus),
         str(rows), mode, str(wait_budget_s), str(BW_CLEAN_GBPS)],
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
    qmap = EQ.all_queries()  # incl. pytest-carried entries (e.g.
    # dedup_minhash_signatures stays a HEADLINE timing though its oracle
    # coverage moved to tests/test_registry_oracles.py)
    # Steady-state measurement: every query gets one untimed warm-up run
    # (Janino codegen compile + JIT of the generated classes — a one-off
    # per-plan driver/JVM cost that amortizes to zero over a 100 TB run)
    # then best-of-2 timed runs. Single-shot cold timings on a shared
    # local-mode JVM vary 5-10x with code-cache/JIT state and measure the
    # compiler, not the operator.
    _wait_quiet(max_wait_s=_wait_budget(120))
    wait_for_bw(min_gbps=BW_CLEAN_GBPS, max_wait_s=_wait_budget(120))
    # bus-quiet too — loadavg can't see co-tenant memory pressure (hostbw.py)

    def _run_trials(name: str, n_trials: int, rec: dict) -> None:
        """Run n_trials timed trials of query `name`, updating rec's
        best / best_clean (+ the bus rates at each). A trial is clean iff
        both bracketing single-sample probes read >= BW_CLEAN_GBPS.

        The timed window starts BEFORE the query callable runs (round 4):
        iterative operators (connected_components inside dedup_near_keep)
        do their convergence loop EAGERLY at construction time, so timing
        only the final materialization would silently exclude exactly the
        per-round shuffles the headline entry exists to track. For plain
        lazy queries the construction cost inside the window is sub-ms
        plan building.

        EVERY trial's duration is recorded in rec["trials"] (VERDICT r04
        #4): best-of alone can't distinguish genuine drift from co-tenant
        noise — the report carries {best, median, n_trials} per query so
        round-over-round comparisons can."""
        for _ in range(n_trials):
            # operators persist() shared subplans (e.g. LSH bands for the
            # self-join); CacheManager would hand the NEXT run those blocks
            # by plan identity, so the timed run would skip the real work
            spark.catalog.clearCache()
            bw_pre = copy_gbps(samples=1)
            t0 = time.monotonic()
            with BusMonitor() as mon:  # diagnostic mid-trial sampling —
                # endpoint probes can miss a storm arriving mid-trial
                _materialize(qmap[name](spark, sf_dir))
            dt = time.monotonic() - t0
            time.sleep(0.5)  # let our own JVM's post-stage GC churn settle
            # so the post probe reads HOST pressure, not our wind-down
            bw_post = copy_gbps(samples=1)
            during = mon.min_rate
            rec["trials"].append(round(dt, 3))
            if rec["best"] is None or dt < rec["best"]:
                rec["best"], rec["bw"] = dt, (bw_pre, bw_post)
                rec["bw_during_min"] = during
            # clean = endpoint probes >= bar AND the in-trial minimum never
            # hit the catastrophic floor — endpoint probes are blind to a
            # storm that arrives and leaves INSIDE the trial (same rule as
            # the kg subprocess runner; 0.25 is far below the bar because
            # our own job legitimately depresses the in-trial probe)
            if (bw_pre >= BW_CLEAN_GBPS and bw_post >= BW_CLEAN_GBPS
                    and (during is None or during >= 0.25)
                    and (rec["best_clean"] is None
                         or dt < rec["best_clean"])):
                rec["best_clean"], rec["bw_clean"] = dt, (bw_pre, bw_post)

    recs: dict[str, dict] = {}
    for name in HEADLINE:
        _materialize(qmap[name](spark, sf_dir))  # warm-up, not timed
        recs[name] = {"best": None, "best_clean": None,
                      "bw": (0.0, 0.0), "bw_clean": (0.0, 0.0),
                      "bw_during_min": None, "trials": []}
        _run_trials(name, 2, recs[name])
    # Bounded retry passes: re-queue queries whose trials all ran on a
    # contended bus — storms pass, so a later window is usually clean. Each
    # pass waits (bounded) for a quiet bus before re-running.
    for _retry in range(2):
        dirty = [n for n in HEADLINE if recs[n]["best_clean"] is None]
        if not dirty or _remaining_s() < 240:
            break
        wait_for_bw(min_gbps=BW_CLEAN_GBPS, max_wait_s=_wait_budget(180))
        for name in dirty:
            _run_trials(name, 2, recs[name])

    timings: dict[str, float] = {}
    contended: list[str] = []
    query_bw: dict[str, list[float]] = {}
    query_stats: dict[str, dict] = {}
    for name in HEADLINE:
        r = recs[name]
        query_stats[name] = {
            "best": round(r["best"], 3),
            "median": median_of(r["trials"]),
            "n_trials": len(r["trials"]),
        }
        if r["best_clean"] is not None:
            timings[name] = round(r["best_clean"], 3)
            query_bw[name] = [round(x, 1) for x in r["bw_clean"]]
        else:
            timings[name] = round(r["best"], 3)
            query_bw[name] = [round(x, 1) for x in r["bw"]]
            if r.get("bw_during_min") is not None:
                # third element: MIN in-trial rate (diagnostic — own load
                # depresses it; a storm reads 0.1-0.5)
                query_bw[name].append(round(r["bw_during_min"], 1))
            contended.append(name)

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
    _wait_quiet(threshold=2.0, max_wait_s=_wait_budget(300))
    kg = _kg_subprocess(bench_rows, cpus,
                        wait_budget_s=_wait_budget(360))
    if kg.get("contended") and _remaining_s() > 600:
        # the subprocess never saw a clean bus in its 6-trial budget — give
        # the north metric ONE more full attempt after a longer quiet wait
        # (the storm that ate the first run has usually passed by now)
        _wait_quiet(threshold=2.0, max_wait_s=_wait_budget(300))
        wait_for_bw(min_gbps=BW_CLEAN_GBPS, max_wait_s=_wait_budget(300))
        kg2 = _kg_subprocess(bench_rows, cpus,
                             wait_budget_s=_wait_budget(360))
        # carry BOTH subprocesses' trials whichever record wins — the
        # variance report (VERDICT r04 #4) must reflect every measured
        # duration, not just the winning attempt's (round-5 code review)
        all_trials = (kg.get("trials") or [kg["sec"]]) + \
            (kg2.get("trials") or [kg2["sec"]])
        if not kg2.get("contended") or kg2["sec"] < kg["sec"]:
            kg = kg2
        kg["trials"] = all_trials
    def _stats_from(kg_rec: dict) -> dict:
        tr = kg_rec.get("trials") or [kg_rec["sec"]]
        return {"best": round(min(tr), 3), "median": median_of(tr),
                "n_trials": len(tr)}

    n_triples = kg["n_triples"]
    triples_sec = kg["sec"]
    timings["kg_triples_synth"] = round(triples_sec, 3)
    query_stats["kg_triples_synth"] = _stats_from(kg)
    query_bw["kg_triples_synth"] = list(kg.get("bw_gbps") or [])
    if kg.get("contended"):
        contended.append("kg_triples_synth")
        if kg.get("bw_during_min") is not None:
            # keep the documented [pre, post, during_min] schema for the
            # north-metric entry too (ADVICE r03: the subprocess measured
            # the in-trial minimum but main dropped it)
            query_bw["kg_triples_synth"].append(kg["bw_during_min"])
    bw_gbps = kg.get("bw_gbps")
    # same job, same total cores, DEPLOYMENT shape: multi-process executors
    # (local-cluster) instead of one big-thread-count JVM — recorded as a
    # separate series so the one-JVM number stays round-comparable.
    # Best-effort: local-cluster spawns worker JVMs, which is environment-
    # sensitive — a failure here must not take down the whole bench report,
    # but it must also not be SILENT (a persistent worker-spawn regression
    # would otherwise look like a one-off hiccup): log the cause to stderr
    # and carry a short reason in the report.
    kg_lc_error = None

    def _run_lc() -> dict | None:
        try:
            return _kg_subprocess(bench_rows, cpus, mode="lc",
                                  wait_budget_s=_wait_budget(240))
        except Exception as e:
            nonlocal kg_lc_error
            import subprocess as _sp
            import traceback
            detail = e.stderr[-2000:] if isinstance(
                e, _sp.CalledProcessError) and e.stderr else ""
            kg_lc_error = f"{type(e).__name__}: {e}"
            print(f"local-cluster leg failed: {kg_lc_error}\n{detail}",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            return None

    kg_lc = _run_lc()
    if kg_lc and kg_lc.get("contended") and _remaining_s() > 600:
        # same budget-gated retry the one-JVM kg leg gets (VERDICT r03 #1):
        # the deployment-shape number is the repo's central performance claim
        # (4x8 executors beat one local[32] JVM), so a storm eating the only
        # lc trial must not become the round-of-record without one more
        # attempt after a longer quiet wait.
        _wait_quiet(threshold=2.0, max_wait_s=_wait_budget(300))
        wait_for_bw(min_gbps=BW_CLEAN_GBPS, max_wait_s=_wait_budget(300))
        kg_lc2 = _run_lc()
        if kg_lc2:
            all_lc = (kg_lc.get("trials") or [kg_lc["sec"]]) + \
                (kg_lc2.get("trials") or [kg_lc2["sec"]])
            if not kg_lc2.get("contended") or kg_lc2["sec"] < kg_lc["sec"]:
                kg_lc = kg_lc2
            kg_lc["trials"] = all_lc
    if kg_lc:
        query_stats["kg_triples_synth_lc"] = _stats_from(kg_lc)
    if kg_lc and kg_lc.get("contended"):
        contended.append("kg_triples_synth_lc")
        # keep the docstring's promise: every contended entry has its rates
        # in query_bus_gbps (duplicates kg_lc_bus_gbps_pre_post), plus the
        # in-trial minimum when the subprocess measured one
        query_bw["kg_triples_synth_lc"] = list(kg_lc.get("bw_gbps") or [])
        if kg_lc.get("bw_during_min") is not None:
            query_bw["kg_triples_synth_lc"].append(kg_lc["bw_during_min"])
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
                "kg_lc_error": kg_lc_error,
                "contended_queries": contended,
                "query_bus_gbps": query_bw,
                "query_stats": query_stats,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
