"""One-off 1x/10x/30x affine sweep for the three dedup ops whose
BENCH_DETAILS paired factor sits >= 2.0 (substring_dedup 2.87,
dedup_paragraphs 2.26, decontaminate 2.22 in the r16 sweep).

Same third-point method that settled text_quality/multimodal in r16
(SCALE.md "sweep-factor attribution"): warm each op family once, then
time 3 reps per (op, scale) INTERLEAVED across scales (a cold pair can
read 5-10x its steady state — see the r16 repetition_stats note), take
the min, fit the affine model t(k) = O + k*W through (1x, 10x), and
compare the observed t_30x against the extrapolated prediction.
Observed <= predicted means the op is affine through 30x and the >= 2.0
paired factor is the small-1x-denominator artifact; observed above
predicted by more than noise means a real super-linear term.

Usage: python benchmarks/dedup_sweep30.py  (idle window; ~10-15 min)
Prints one JSON line per op; feeds the SCALE.md table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, _scaled_union, get_spark  # noqa: E402

SCALES = (1, 10, 30)
REPS = 3


def main():
    from pyspark.sql import functions as F

    from tumult_core_spark.extensions.dedup import (
        decontaminate,
        dedup_paragraphs,
        duplicate_substring_spans,
    )

    spark = get_spark()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def docs(scale):
        return _scaled_union(docs0, scale, ["doc_id"]).repartition(cpus)

    def op_substring_dedup(scale):
        duplicate_substring_spans(docs(scale), "doc_id", "text", 12).count()

    def op_dedup_paragraphs(scale):
        dedup_paragraphs(docs(scale), separator=" table ").count()

    def op_decontaminate(scale):
        d = docs(scale)
        holdout = d.filter("doc_id % 50 = 0").withColumn(
            "doc_id", F.col("doc_id") + 500_000_000
        )
        decontaminate(d, holdout, "doc_id", "text", threshold=0.99).count()

    def op_decontaminate_fixed_holdout(scale):
        # r18 (verdict #5): the production shape — the CORPUS grows with
        # scale while the holdout (eval sets) stays fixed at its 1x
        # size.  The both-sides-scaled variant above conflates index
        # growth with probe growth; this one pins the W-per-corpus-copy
        # a user actually pays when decontaminating ever-larger
        # training sets against the same benchmarks.
        d = docs(scale)
        holdout = docs(1).filter("doc_id % 50 = 0").withColumn(
            "doc_id", F.col("doc_id") + 500_000_000
        )
        decontaminate(d, holdout, "doc_id", "text", threshold=0.99).count()

    ops = {
        "substring_dedup": op_substring_dedup,
        "dedup_paragraphs": op_dedup_paragraphs,
        "decontaminate": op_decontaminate,
        "decontaminate_fixed_holdout": op_decontaminate_fixed_holdout,
    }
    if len(sys.argv) > 1:
        wanted = set(sys.argv[1].split(","))
        unknown = wanted - set(ops)
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        ops = {k: v for k, v in ops.items() if k in wanted}

    results = {name: {k: [] for k in SCALES} for name in ops}
    # warm-up pass: one un-timed 1x run per op (JVM/codegen/Arrow spin-up)
    for name, fn in ops.items():
        fn(1)
    for rep in range(REPS):
        for name, fn in ops.items():
            for k in SCALES:
                t0 = time.time()
                fn(k)
                results[name][k].append(round(time.time() - t0, 3))
        print(
            f"# rep {rep + 1}/{REPS} done, load {os.getloadavg()}",
            file=sys.stderr,
        )

    for name in ops:
        t = {k: min(results[name][k]) for k in SCALES}
        # affine fit through (1x, 10x): t(k) = O + k*W
        w = (t[10] - t[1]) / 9.0
        o = t[1] - w
        pred30 = o + 30 * w
        print(json.dumps({
            "op": name,
            "t_1x": t[1],
            "t_10x": t[10],
            "t_30x": t[30],
            "reps": results[name],
            "fit_O": round(o, 3),
            "fit_W_per_copy": round(w, 4),
            "t_30x_predicted": round(pred30, 3),
            "affine_through_30x": bool(t[30] <= pred30 * 1.15),
            "paired_factor_10x": round(t[10] / t[1], 2) if t[1] else None,
        }))


if __name__ == "__main__":
    main()
