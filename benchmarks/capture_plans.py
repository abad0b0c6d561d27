"""Capture .explain("formatted") for declared registry queries.

Usage: python benchmarks/capture_plans.py <outdir> [sf_dir] [names,...]

Writes one <outdir>/<name>.txt per entry.  Measurement entries execute
eagerly when constructed (release freeze), so run at a small SF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from tumult_core_spark.utils.misc import get_spark

    spark = get_spark("plan-capture", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}.txt")
        try:
            sdf = fn(spark, sf_dir)
            plan = sdf._sc._jvm.PythonSQLUtils.explainString(
                sdf._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {exc!r}"
        with open(path, "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")
    spark.stop()


if __name__ == "__main__":
    main()
