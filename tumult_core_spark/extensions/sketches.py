"""Mergeable cardinality sketches (HyperLogLog) for corpus-scale
distinct counting.

At 100 TB an exact ``COUNT(DISTINCT x)`` shuffles every distinct value;
an HLL sketch reduces each partition to a KB-sized buffer that
map-side-combines, and — because sketches MERGE losslessly — rollups
(per-group AND grand total) come from ONE corpus scan: union the
per-group sketches instead of rescanning.  Spark ships the Apache
DataSketches HLL under ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` (public API since 3.5); this module shapes them
into the two pipeline-facing forms and pins their contracts
(determinism, exact merge/global agreement, error bound) in tests.

Estimates are deterministic functions of the data (no RNG: item hashes
are fixed), so results are stable across partitionings and reruns.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Optional[List[str]] = None,
    lg_k: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate distinct ``value_col`` count (per group, or one
    global row): one scan, sketch-sized shuffle, relative standard
    error ~= 1.04 / sqrt(2^lg_k) (~1.6% at the default lg_k=12)."""
    sk = F.hll_sketch_agg(value_col, F.lit(int(lg_k)))
    est = F.hll_sketch_estimate(sk).alias(out_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(est)
    return df.agg(est)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: List[float],
    accuracy: int = 10000,
    group_cols: Optional[List[str]] = None,
    prob_col: str = "prob",
    out_col: str = "approx_quantile",
) -> DataFrame:
    """Approximate quantiles via Spark's ``percentile_approx``
    (Greenwald-Khanna style mergeable summary): one scan, summary-sized
    shuffle, guaranteed rank error <= 1/accuracy — the 100 TB
    replacement for an exact sort-based percentile.

    Output is long-form: one row per (group x probability) with the
    probability in ``prob_col`` — joinable back against the data for
    rank-error validation (see ``q_approx_quantile_check``).

    Unlike the HLL sketches, the merged GK summary DEPENDS on
    partition boundaries: repartitioning the input can move the
    estimate within the rank-error window (the contract the tests and
    the registry entry pin), so don't expect bit-stable values across
    different partitionings — only across reruns of the same plan.
    """
    probs = [float(p) for p in probabilities]
    agg = F.percentile_approx(
        value_col,
        F.array(*[F.lit(p) for p in probs]),
        F.lit(int(accuracy)),
    ).alias("__qs")
    base = df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)
    prob_arr = F.array(*[F.lit(p) for p in probs])
    # an all-NULL group (or empty input) yields a NULL quantile array;
    # coalesce to per-probability NULL values so the group still
    # appears in the long-form output instead of vanishing through
    # the explode (a caller joining estimates back to the data would
    # silently lose those groups).  The NULL array is typed to the
    # QUANTILE array's own element type: a hardcoded array<double>
    # made coalesce widen bigint quantiles to double, silently
    # changing the output type and rounding values above 2^53 (a
    # caller equality-joining estimates back to the data would get
    # spurious mismatches).
    elem_type = base.schema["__qs"].dataType
    null_qs = F.array(
        *[F.lit(None).cast(elem_type.elementType) for _ in probs]
    )
    base = base.withColumn("__qs", F.coalesce(F.col("__qs"), null_qs))
    out = base.select(
        *(group_cols or []),
        F.posexplode("__qs").alias("__i", out_col),
    ).select(
        *(group_cols or []),
        F.element_at(prob_arr, F.col("__i") + 1).alias(prob_col),
        out_col,
    )
    return out


def hll_rollup(
    df: DataFrame,
    value_col: str,
    group_cols: List[str],
    lg_k: int = 12,
    out_col: str = "approx_distinct",
    total_label: str = "__all__",
    preserve_types: bool = False,
) -> DataFrame:
    """Per-group approximate distinct counts PLUS the grand total, from
    ONE corpus scan: the total row is the union of the per-group
    sketches (lossless HLL merge), never a second pass.

    Two output conventions (the union estimate is bit-identical to a
    direct global sketch in both — pinned in tests):

    * ``preserve_types=False`` (default, the historical schema): group
      columns are CAST TO STRING so the total row can carry
      ``total_label`` in them — unioning a string label against e.g. a
      BIGINT group column would otherwise throw a cast error under ANSI
      mode.  Callers that group by bigint/date keys and join the result
      back should use the other mode.
    * ``preserve_types=True``: group columns keep their input types;
      the total row carries NULL in every group column and the output
      gains a boolean ``is_total`` marker column (NULL keys alone would
      be ambiguous when a real group key is NULL).
    """
    if not group_cols:
        raise ValueError("hll_rollup needs group_cols; use hll_distinct")
    from ..utils.misc import materialize

    key_exprs = (
        [F.col(c) for c in group_cols]
        if preserve_types
        else [F.col(c).cast("string").alias(c) for c in group_cols]
    )
    sketches = df.groupBy(*key_exprs).agg(
        F.hll_sketch_agg(value_col, F.lit(int(lg_k))).alias("__sk")
    )
    # The per-group sketch relation is groups-sized (KBs per group).
    # Materialize it eagerly via a parquet round-trip so the per-group
    # estimates and the union both read ONE corpus scan's output.  A
    # persist() here would leak a cached relation per call (nothing
    # downstream can know when to unpersist it); the parquet form costs
    # one small write, is shared-storage-correct on a cluster, and is
    # reclaimed with the session temp dir.
    sketches = materialize(sketches)
    per_group = sketches.select(
        *group_cols, F.hll_sketch_estimate("__sk").alias(out_col)
    )
    total_est = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias(out_col)
    )
    if preserve_types:
        typed = {f.name: f.dataType for f in sketches.schema.fields}
        per_group = per_group.withColumn("is_total", F.lit(False))
        total = total_est.select(
            *[
                F.lit(None).cast(typed[c]).alias(c) for c in group_cols
            ],
            F.col(out_col),
            F.lit(True).alias("is_total"),
        )
    else:
        total = total_est.select(
            *[F.lit(total_label).alias(c) for c in group_cols],
            F.col(out_col),
        )
    return per_group.unionByName(total)
