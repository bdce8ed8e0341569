"""Driver-style verification: run every registered query on Spark and its
DuckDB oracle, compare row sets (stringified, column-name-sorted). Mirrors
the round driver's CORRECTNESS check. Usage:

    python scripts/driver_check.py [sf_dir] [query ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from extract_address_ner_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # check the FULL surface — driver-facing entries plus the pytest-carried
    # variants (the round driver itself sees only E.queries(), capped at 50)
    from extract_address_ner_spark import entry_queries as EQ

    oracles = EQ.all_oracle_sql()
    failures = []
    for name, fn in EQ.all_queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sorted(
            tuple(str(x) for x in r)
            for r in sdf.select(*sorted(sdf.columns)).collect()
        )
        if name not in oracles:
            print(f"{name}: spark={len(srows)} (rows-only)")
            if len(srows) == 0:
                failures.append(name)
            continue
        od = con.execute(oracles[name]).fetch_df()
        orows = sorted(
            tuple(str(x) for x in r)
            for r in od[sorted(od.columns)].itertuples(index=False)
        )
        ok = srows == orows
        print(f"{name}: spark={len(srows)} duck={len(orows)} "
              f"{'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(name)
            sset, oset = set(srows), set(orows)
            for x in list(sset - oset)[:3]:
                print("  spark-only:", x)
            for x in list(oset - sset)[:3]:
                print("  duck-only :", x)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
