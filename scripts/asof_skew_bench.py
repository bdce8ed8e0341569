"""Measured evidence for the time-chunked AS-OF join escalation
(`temporal.asof_join(time_chunk=W)`): on a mega-skew fixture (one key
holding ~95% of events) the unchunked plan sorts the hot key in ONE task
while the chunked plan spreads it over |chunks| tasks — this script times
both on the same materialized input and reports the ratio, plus a
uniform-key control where chunking should roughly break even (its extra
passes cost about what the spread saves).

Rows are synthesized WITHOUT driver-side loops (sequence + explode), the
input is materialized to parquet first (timed legs only read), and each
leg is best-of-2 after a warm-up — same discipline as bench.py, minus
bus-probe gating (the CHUNKED/UNCHUNKED ratio shares ambient pressure).

Usage: python scripts/asof_skew_bench.py [rows] [chunk_width]
Writes BENCH_asof_skew_last_run.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from extract_address_ner_spark.operators.temporal import asof_join
    from extract_address_ner_spark.session import get_spark

    spark = get_spark(app_name="asof-skew-bench", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    work = tempfile.mkdtemp(prefix="asofskew_")
    try:
        def synth(skewed: bool, path: str) -> None:
            base = spark.range(rows)
            k = (
                F.when(F.pmod("id", F.lit(100)) < 95, F.lit(0))
                .otherwise(F.pmod("id", F.lit(32)))
                if skewed else F.pmod("id", F.lit(32))
            )
            left = base.select(
                F.col("id"), k.alias("k"),
                F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("t"))
            left.write.mode("overwrite").parquet(f"{path}/left")
            right = spark.range(rows // 20).select(
                F.col("id").alias("rid"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(32)).alias("k"),
                F.pmod(F.xxhash64("id", F.lit(2)),
                       F.lit(10_000_000)).alias("t"))
            right.write.mode("overwrite").parquet(f"{path}/right")

        def leg(path: str, time_chunk: int | None) -> float:
            left = spark.read.parquet(f"{path}/left")
            right = spark.read.parquet(f"{path}/right")
            j = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                          right_cols=["rid"], tiebreak="rid",
                          time_chunk=time_chunk)
            j.write.format("noop").mode("overwrite").save()  # warm-up only
            best = None
            for _ in range(2):  # best-of-2, warm-up excluded
                t0 = time.monotonic()
                j.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                if best is None or dt < best:
                    best = dt
            return round(best, 2)

        out = {}
        for name, skewed in (("skewed", True), ("uniform", False)):
            path = f"{work}/{name}"
            synth(skewed, path)
            plain = leg(path, None)
            chunked = leg(path, chunk)
            out[name] = (plain, chunked)
            print(f"{name}: unchunked {plain}s, chunked {chunked}s "
                  f"(ratio {plain / chunked:.2f}x)")

        md = [
            "# AS-OF join time-chunk escalation (last run)",
            "",
            f"{rows:,} left rows, {rows // 20:,} right rows, 32 keys; "
            f"skewed = one key holds ~95% of rows; chunk width {chunk:,} "
            "over a 10M-tick ts domain (~50 chunks). Best-of-2 after "
            "warm-up, noop sink. Methodology: scripts/asof_skew_bench.py.",
            "",
            "| fixture | unchunked s | chunked s | speed-up |",
            "|---|---|---|---|",
        ]
        for name, (p, c) in out.items():
            md.append(f"| {name} | {p} | {c} | {p / c:.2f}x |")
        (REPO / "BENCH_asof_skew_last_run.md").write_text(
            "\n".join(md) + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
