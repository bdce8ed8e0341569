"""Two-parallelism scaling evidence for the TransE training epoch.

The north rule's two-cluster-size criterion, applied to the round-5
embedding trainer: run the IDENTICAL training job (same deterministic
synthetic edge table, same dim/epochs/seed) in a local[8] JVM and a
local[32] JVM — separate processes, run sequentially so the legs never
contend with each other — and report per-leg throughput
(pair-gradient evaluations / s = n_pairs × epochs / train wall) plus the
8→32 scaling efficiency. Host-bandwidth probes (scripts/hostbw.py)
bracket each leg so a co-tenant bus storm is visible next to the number
it contaminated.

What should and shouldn't scale: the gradient pass (mapInPandas over the
pair table) and the per-epoch reduce are distributed and should scale
with cores until the bus saturates; the per-epoch driver step (apply +
re-broadcast) is a fixed serial cost ∝ model size, NOT cores — so
efficiency is bounded below 1.0 by Amdahl on the driver step, and the
honest expectation at this pair count is "clearly >1× speedup, not 4×".
The pair-table BUILD (windows + joins, one-time) is included in the
timed region: it is distributed too and a real job pays it.

Usage:
    python scripts/embed_scaling_bench.py [n_edges] [dim] [epochs]
    python scripts/embed_scaling_bench.py --leg <threads> <n_edges> <dim> <epochs>

Defaults: 400_000 edges over 20_000 nodes / 8 predicates, dim 16,
3 epochs. Writes BENCH_embed_scaling_last_run.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_NODES = 20_000
N_PREDS = 8


def synth_edges(spark, n_edges: int):
    """Deterministic synthetic edge table (hash-derived endpoints, the
    repo's no-external-data rule): ~n_edges triples over N_NODES nodes."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_NODES))).alias("subj"),
            F.concat(F.lit("p"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(N_PREDS))).alias("pred"),
            F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(N_NODES))).alias("obj"),
            F.lit(1.0).alias("confidence"),
        )
    )


def leg(threads: int, n_edges: int, dim: int, epochs: int) -> None:
    from extract_address_ner_spark.operators.kg_embed import train_transe
    from extract_address_ner_spark.operators.kg_export import corruption_pairs
    from extract_address_ner_spark.session import get_spark

    spark = get_spark(
        app_name=f"embed-scaling-{threads}",
        master=f"local[{threads}]",
        shuffle_partitions=threads,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    edges = synth_edges(spark, n_edges)
    t0 = time.monotonic()
    pairs = corruption_pairs(edges, k=2, seed=7).persist()
    n_pairs = pairs.count()
    _, losses = train_transe(
        edges, dim=dim, epochs=epochs, seed=7, pairs=pairs
    )
    wall = time.monotonic() - t0
    pairs.unpersist()
    print(json.dumps({
        "threads": threads, "n_pairs": n_pairs, "wall_s": round(wall, 3),
        "grad_evals_per_sec": round(n_pairs * epochs / wall, 1),
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        leg(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
            int(sys.argv[5]))
        return

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from scripts.hostbw import copy_gbps, wait_for_bw

    results = {}
    probes = {}
    for threads in (8, 32):
        wait_for_bw(min_gbps=2.0, max_wait_s=300)
        pre = copy_gbps()
        out = subprocess.run(
            [sys.executable, __file__, "--leg", str(threads),
             str(n_edges), str(dim), str(epochs)],
            capture_output=True, text=True, timeout=1800, cwd=REPO,
        )
        post = copy_gbps()
        if out.returncode != 0:
            print(out.stderr[-2000:])
            raise SystemExit(f"leg local[{threads}] failed")
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[threads] = json.loads(line)
        probes[threads] = [round(pre, 1), round(post, 1)]
        print(f"local[{threads}]:", line, "bus_gbps:", probes[threads])

    r8, r32 = results[8], results[32]
    speedup = r32["grad_evals_per_sec"] / r8["grad_evals_per_sec"]
    eff = speedup / 4.0
    # losses must be identical-ish across legs: same data, same seeds — only
    # float reduction order differs
    loss_drift = abs(r8["loss_last"] - r32["loss_last"])

    md = f"""# TransE training scaling (last run)

Same job — {n_edges:,} synthetic edges ({N_NODES:,} nodes, {N_PREDS}
preds), dim {dim}, {epochs} epochs, k=2 corruptions, seed 7 — run
sequentially in a local[8] JVM and a local[32] JVM (separate processes).
Timed region = pair build + all epochs (everything distributed).

| leg | pairs | wall s | grad evals/s | bus GB/s pre/post |
|---|---|---|---|---|
| local[8] | {r8['n_pairs']:,} | {r8['wall_s']} | {r8['grad_evals_per_sec']:,} | {probes[8][0]}/{probes[8][1]} |
| local[32] | {r32['n_pairs']:,} | {r32['wall_s']} | {r32['grad_evals_per_sec']:,} | {probes[32][0]}/{probes[32][1]} |

- 8→32 speedup **{speedup:.2f}×** → scaling efficiency **{eff:.2f}**
  (vs the 4× thread ratio; the per-epoch driver step — model apply +
  re-broadcast, ∝ model size not cores — is the Amdahl floor, and on
  this box the shared memory bus is the measured ceiling past ~8
  threads, see BENCH.md).
- final-epoch loss drift across legs: {loss_drift:.4f} (same data/seed;
  float reduction order is the only difference).
"""
    (REPO / "BENCH_embed_scaling_last_run.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
