"""Time-series operators for event pipelines: as-of join and
time-bucket rollup.

Spark has no native AS OF join (DuckDB/Pandas do); the scalable
re-expression here is the union + sort-within-key carry-forward:
tag both sides, shuffle ONCE on the join keys, sort each key's rows
by time, and carry the latest right-side payload forward with a
``last(ignorenulls)`` running window.  Cost is one shuffle + one
sort — identical shape to a windowed aggregation, linear in rows,
no range explosion, no per-key Python.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: List[str],
    ts_col: str,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the single right row with the same
    ``by`` keys and the greatest right ``ts_col`` <= left ``ts_col``
    (direction ``backward``; ``forward`` takes the smallest >=).

    Matches DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``
    semantics: ties on the timestamp itself match (inclusive), left
    rows with no candidate keep nulls, and ``tolerance_seconds``
    nulls out matches further away than the bound.

    Right-side rows should be unique per ``(by, ts_col)`` — like every
    as-of engine, an ambiguous duplicate right timestamp would make
    "the" match undefined; this implementation deterministically keeps
    the one whose serialized payload hashes last (a content hash, so
    the choice never requires payload columns to be ORDERABLE — a
    map-typed attribute column must not break the join).

    NULL timestamps never match: a right row with NULL ``ts_col`` is
    dropped from the candidate set, and a left row with NULL
    ``ts_col`` keeps NULL right fields (pandas ``merge_asof`` rejects
    NULL keys outright; DuckDB ASOF produces no match — without the
    guard the 'forward' sort order would attach the SMALLEST right
    timestamp to every NULL-ts left row).

    The matched row is carried as ONE struct, so a NULL payload field
    in the true match stays NULL instead of being torn from an older
    right row (per-column ``last(ignorenulls)`` would mix fields of
    different rows).

    Scale shape: union both sides, ONE hash shuffle on ``by``, one
    per-key sort by time, running ``last(ignorenulls)`` carry-forward,
    then keep left rows.  No range cross-product; a key's rows stream
    through a single sorted pass.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = [c for c in right.columns if c not in set(by) | {ts_col}]
    overlap = [f"{right_prefix}{c}" for c in payload + [ts_col]]
    clash = set(overlap) & set(left.columns)
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {sorted(clash)}")

    # tag: right rows sort before left rows at an equal timestamp so
    # inclusive (<=) matches see them; 'forward' flips the time order,
    # turning smallest-ts-above into the same carry-forward problem.
    # The duplicate-timestamp tie-break hash (__tb) is PROJECTED HERE,
    # once, on the right side only — map-side, before the shuffle — so
    # the window sorts on a ready 8-byte long instead of serializing
    # every union row (left rows included) to JSON inside the sort
    # path (that cost the r14 atomic-struct fix ~23%; this claws it
    # back).
    rt = right.filter(F.col(ts_col).isNotNull()).select(
        *[F.col(c) for c in by],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c) for c in payload],
        ).alias("__rrow"),
    )
    # fast path: xxhash64 directly over the payload columns (JVM-side,
    # no JSON string building).  Two caveats force care here:
    # (a) xxhash64 rejects map-typed inputs
    #     (spark.sql.legacy.allowHashOnMapType is off), so a map-typed
    #     payload falls back to hashing the serialized struct;
    # (b) Spark hash functions SKIP NULL inputs (a NULL leaves the
    #     running hash unchanged), so rows differing only in WHICH
    #     fields are NULL — (7, NULL) vs (NULL, 7) — would collide and
    #     make the tie nondeterministic again.  Prefixing every field
    #     with its isnull flag restores an injective encoding: each
    #     field contributes [1] when NULL or [0, value] otherwise, a
    #     prefix-free code, so distinct null-patterns hash distinctly.
    def _has_map(dt) -> bool:
        return "map<" in dt.simpleString()

    if any(_has_map(right.schema[c].dataType) for c in payload):
        tb = F.xxhash64(F.to_json(F.col("__rrow")))
    else:
        flagged = []
        for c in payload:
            f = F.col("__rrow").getField(c)
            flagged.extend([F.isnull(f).cast("int"), f])
        tb = F.xxhash64(F.col("__ts"), *flagged)
    rt = rt.withColumn("__tb", tb)
    lt = left.select(
        *[F.col(c) for c in by],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__rrow"].dataType).alias("__rrow"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rt = rt.withColumn(
        "__lrow", F.lit(None).cast(lt.schema["__lrow"].dataType)
    )
    both = lt.unionByName(rt)
    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__side").asc(),
        # deterministic pick among duplicate right timestamps without
        # requiring payload orderability: the content hash projected
        # above (left rows: NULL, inert — same-ts left rows need no
        # tie order)
        F.col("__tb").asc(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "__side",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__mrow"),
    ).filter(F.col("__side") == 1)
    # a left row with NULL ts has no as-of position: no match
    valid = F.col("__lrow").getField(ts_col).isNotNull()
    if tolerance_seconds is not None:
        # cast via TIMESTAMP so TIMESTAMP_NTZ (what Spark 4 loads from
        # unadjusted parquet) is legal too; numeric epochs round-trip
        # unchanged under the UTC session timezone
        gap = F.abs(
            F.col("__lrow").getField(ts_col).cast("timestamp").cast("double")
            - F.col("__mrow").getField("__rts").cast("timestamp").cast("double")
        )
        valid = valid & (gap <= F.lit(float(tolerance_seconds)))
    matched = F.when(valid, F.col("__mrow"))
    return carried.select(
        *[F.col("__lrow").getField(c).alias(c) for c in left.columns],
        matched.getField("__rts").alias(f"{right_prefix}{ts_col}"),
        *[matched.getField(c).alias(f"{right_prefix}{c}") for c in payload],
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    every: str,
    group_cols: Optional[List[str]] = None,
    agg_exprs: Optional[dict] = None,
) -> DataFrame:
    """Fixed-interval rollup (the batch form of the streaming windowed
    aggregation): bucket ``ts_col`` into ``every``-sized tumbling
    windows and aggregate.  ``agg_exprs`` maps output column ->
    Column; defaults to a row count.  Pure Catalyst ``window()``:
    map-side-combined single shuffle on (bucket, groups).
    """
    group_cols = list(group_cols or [])
    aggs = agg_exprs or {"n": F.count(F.lit(1))}
    win = F.window(F.col(ts_col), every)
    return (
        df.groupBy(win.alias("__w"), *[F.col(c) for c in group_cols])
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .select(
            F.col("__w.start").alias("bucket_start"),
            *group_cols,
            *aggs.keys(),
        )
    )


def rolling_aggregate(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    count_col: str = "rolling_count",
    sum_col: str = "rolling_sum",
) -> DataFrame:
    """Per-row trailing-window aggregates: for each row, the count and
    sum of ``value_col`` over the same keys within the last
    ``window_seconds`` (inclusive of the current row) — the feature
    shape behind rate counters and rolling activity signals.

    One window function over epoch-MICROSECOND ordering (second-cast
    ordering would silently merge sub-second neighbors), i.e. a single
    shuffle on the keys; the frame sum runs inside the JVM.  The sum
    accumulates in DECIMAL(38, 12) so the result is order-independent
    and engine-reproducible (float window sums depend on frame
    evaluation order).  The decimal trade-offs, stated plainly: values
    quantize at 12 decimal places, and any window whose sum reaches
    the 26-integer-digit capacity would overflow the decimal — so keys
    where SUM(|x|) could reach it are REJECTED up front (one cheap
    map-side-combined aggregate on the same shuffle key as the window)
    rather than silently nulled out of the sum.  SUM(|x|) per key
    bounds every trailing window's |sum| for that key, so the guard
    covers many-small-value overflow, not just single huge values; it
    accumulates in double with a 1% guard band (9.9e25) to absorb
    float summation error in the *check* itself.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be > 0")
    bad = (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.sum(F.abs(F.col(value_col)).cast("double")).alias("__sabs"))
        .agg(F.sum((F.col("__sabs") >= F.lit(9.9e25)).cast("long")).alias("n"))
        .first()["n"]
    )
    if bad:
        raise ValueError(
            f"{bad} key group(s) have SUM(|{value_col}|) >= 9.9e25, which "
            "could overflow the DECIMAL(38,12) rolling-sum accumulator "
            "(capacity 1e26, checked with a 1% guard band); rescale the "
            "column first"
        )
    # parquet TIMESTAMP without UTC adjustment loads as NTZ under
    # Spark 4; unix_micros requires TIMESTAMP (cast is wall-clock
    # preserving under a UTC session timezone)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    val = F.col(value_col).cast("decimal(38,12)")
    return (
        df.withColumn(count_col, F.count(F.lit(1)).over(w).cast("long"))
        .withColumn(sum_col, F.sum(val).over(w).cast("double"))
    )


def sessionize_batch(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Batch gap-based sessionization (the islands construction): rows
    of a user closer than ``gap_seconds`` merge into one session; emits
    ``(user, session_start, session_end, n_events)`` epoch-microsecond
    bounds for every session.

    Two window passes over one shuffle on the user key: a lag marks
    session starts, a running sum numbers sessions, then a groupBy
    collapses them.  ``tiebreak_col`` makes ordering total when a user
    has equal timestamps (required for a deterministic lag).
    """
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be > 0")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [us] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(F.col(user_col)).orderBy(*order)
    lagged = F.lag(us).over(w)
    new_session = (
        lagged.isNull() | ((us - lagged) > gap_seconds * 1_000_000)
    ).cast("long")
    numbered = df.withColumn("__t", us).withColumn(
        "__sid",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy(F.col(user_col), F.col("__sid"))
        .agg(
            F.min("__t").alias("session_start_us"),
            F.max("__t").alias("session_end_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .drop("__sid")
    )
