"""One-off components sweep with per-rep fixpoint-round attribution.

Runs the connected-components sweep op at k=10 and k=20 with 3
interleaved rep pairs each, recording per-rep wall clock AND per-rep
fixpoint round counts (extensions.components.last_run_stats), so the
sweep factor decomposes into rounds_kx/rounds_1x (algorithmic,
data-dependent) x per-round cost growth (the actual scaling signal).
Feeds the SCALE.md "Components sweep attribution" table.

Usage: python benchmarks/components_sweep.py  (idle window; ~4 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, _scaled_union, get_spark  # noqa: E402


def main():
    from pyspark.sql import functions as F

    from tumult_core_spark.extensions import components as components_mod
    from tumult_core_spark.extensions.components import connected_components

    spark = get_spark()

    def edges(scale):
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            (F.col("c_custkey") + F.lit(1_000_000)).alias("id_a"),
            F.col("c_nationkey").cast("long").alias("id_b"),
        )
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            (F.col("o_orderkey") + F.lit(2_000_000)).alias("id_a"),
            (F.col("o_custkey") + F.lit(1_000_000)).alias("id_b"),
        )
        return _scaled_union(cust.unionByName(orders), scale, ["id_a", "id_b"])

    def run(scale):
        start = time.perf_counter()
        connected_components(edges(scale)).count()
        return (
            round(time.perf_counter() - start, 3),
            components_mod.last_run_stats.get("rounds"),
        )

    reps = int(os.environ.get("SPARK_GRAFT_SWEEP_REPS", "3"))
    out = {"sf_dir": SF_DIR, "reps": reps, "ks": {}}
    # warm the op family once so the first timed 1x is not codegen startup
    run(1)
    for k in (10, 20):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        rows = {1: [], k: []}
        for _ in range(reps):
            for scale in (1, k):
                t, r = run(scale)
                rows[scale].append({"sec": t, "rounds": r,
                                    "per_round": round(t / r, 3)})
        t1 = min(x["sec"] for x in rows[1])
        tk = min(x["sec"] for x in rows[k])
        out["ks"][k] = {
            "reps_1x": rows[1],
            f"reps_{k}x": rows[k],
            "t_1x": t1,
            f"t_{k}x": tk,
            "factor": round(tk / t1, 2),
            "per_round_min_1x": min(x["per_round"] for x in rows[1]),
            f"per_round_min_{k}x": min(x["per_round"] for x in rows[k]),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
