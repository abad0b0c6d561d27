"""Local simulation of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare with ``oracle_sql()`` via
DuckDB (row count + columns + order-insensitive values).

Run directly:  python tests/oracle_check.py [sf_dir] [keys|--boundary]

``--boundary`` (the r16 CI-style rotation lane): checks the 15 registry
entries straddling the driver's ~50-entry per-round cutoff (positions
46-60).  The entries that go driver-stale are always the boundary ones
the 50-entry batch just fails to reach (map_revenue in r14,
hll_distinct in r15), so running this ~90-second lane once per round
closes that gap locally.  Run it after every registry rotation.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    """Sort columns by name, round floats, sort rows."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    arg2 = sys.argv[2] if len(sys.argv) > 2 else None
    boundary = arg2 == "--boundary"
    only = set(arg2.split(",")) if arg2 and not boundary else None

    import duckdb

    import __spark_entry__ as entry_mod
    from tumult_core_spark.utils.misc import get_spark

    spark = get_spark("oracle-check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if boundary:
        only = set(list(queries)[45:60])
        print(f"# boundary lane: {sorted(only)}")
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            failures.append((name, f"oracle error: {exc}"))
            print(f"FAIL {name}: oracle error: {str(exc)[:200]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"columns {sorted(scols)} != {sorted(ocols)}"))
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount {len(srows)} != {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        a = normalize(srows, scols)
        b = normalize(orows, ocols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"value mismatch, e.g. {diff}"))
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            continue
        print(f"ok   {name}: {len(srows)} rows match oracle")

    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
